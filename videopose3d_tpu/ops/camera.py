"""Camera model: screen-coordinate normalization, world<->camera transforms, and the
differentiable Human3.6M projection.

Functional parity target: ``/root/reference/common/camera.py:14-89``.  Every
function dispatches on input type: numpy inputs compute in numpy ON HOST (the
dataset-prep path transforms hundreds of MB — on a tunneled-TPU setup the
default jax backend would move it over a ~10 MB/s relay), while jax arrays /
tracers compute via ``jax.numpy`` — in particular ``project_to_2d`` sits inside
the semi-supervised loss graph and must be differentiable end-to-end.  The
numpy paths also reproduce the reference's float64 promotion exactly (e.g. the
``[1, h/w]`` offset in screen-coordinate normalization), keeping bit-level
preprocessing parity.

Intrinsic parameter vector layout (9,)::

    [fx, fy, cx, cy, k1, k2, k3, p1, p2]

i.e. focal(2) + center(2) + radial distortion(3) + tangential distortion(2), exactly
the layout assembled by the dataset layer (see
``/root/reference/common/h36m_dataset.py:228-231``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from videopose3d_tpu.ops.quaternion import (  # _xp: host/graph dispatch
    _xp, qinverse, qrot)


def normalize_screen_coordinates(X, w, h):
    """Map pixel coords so [0, w] -> [-1, 1], preserving aspect ratio.

    Parity: ``/root/reference/common/camera.py:14-18``.
    Accepts jnp or numpy arrays; returns the same family via jnp ufunc semantics.
    """
    assert X.shape[-1] == 2, f"expected (...,2), got {X.shape}"
    xp = _xp(X)
    # numpy path: the [1, h/w] offset promotes to float64 exactly like the
    # reference's bare-list subtraction; jnp path stays in the input dtype.
    offset = (np.array([1.0, h / w]) if xp is np
              else jnp.asarray([1.0, h / w],
                               dtype=jnp.result_type(X, jnp.float32)))
    return X / w * 2.0 - offset


def image_coordinates(X, w, h):
    """Inverse of :func:`normalize_screen_coordinates`.

    Parity: ``/root/reference/common/camera.py:21-25``.
    """
    assert X.shape[-1] == 2, f"expected (...,2), got {X.shape}"
    xp = _xp(X)
    offset = (np.array([1.0, h / w]) if xp is np
              else jnp.asarray([1.0, h / w],
                               dtype=jnp.result_type(X, jnp.float32)))
    return (X + offset) * w / 2.0


def _broadcast_quat(xp, q, X):
    """Expand a (4,) quaternion or a leading-batch (B, 4) of them to
    ``X.shape[:-1] + (4,)``: batch axes align from the LEFT (a (B, 4) batch
    pairs with (B, ..., 3) points), so insert point axes before broadcasting
    rather than relying on numpy's trailing-dim alignment."""
    q = xp.reshape(q, q.shape[:-1] + (1,) * (X.ndim - q.ndim) + (4,))
    return xp.broadcast_to(q, X.shape[:-1] + (4,))


def world_to_camera(X, R, t):
    """World-frame points -> camera frame: rotate by R^-1 after translating by -t.

    Parity: ``/root/reference/common/camera.py:28-30``.  ``R`` is a (4,) quaternion
    (or batch thereof); broadcasting replaces the reference's ``np.tile``.
    """
    xp = _xp(X, R)
    Rt = _broadcast_quat(xp, qinverse(xp.asarray(R)), X)
    return qrot(Rt, X - t)


def camera_to_world(X, R, t):
    """Camera-frame points -> world frame.

    Parity: ``/root/reference/common/camera.py:33-34``.
    """
    xp = _xp(X, R)
    R = _broadcast_quat(xp, xp.asarray(R), X)
    return qrot(R, X) + t


def _split_intrinsics(camera_params, ndim):
    """Broadcast (N, 9) intrinsics against (N, ..., 3) points and split fields."""
    assert camera_params.shape[-1] == 9, f"expected (...,9) intrinsics, got {camera_params.shape}"
    while camera_params.ndim < ndim:
        camera_params = camera_params[:, None]
    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    k = camera_params[..., 4:7]
    p = camera_params[..., 7:]
    return f, c, k, p


def project_to_2d(X, camera_params):
    """Differentiable Human3.6M camera projection with radial+tangential distortion.

    Parity: ``/root/reference/common/camera.py:37-67``.  The perspective-divided
    coordinates are clamped to [-1, 1] before distortion, as in the reference (this
    clamp guards the polynomial distortion model against points near the camera plane
    and is part of the trained loss surface, so it must be preserved bit-for-bit).

    Args:
      X: (N, ..., 3) points in camera space.
      camera_params: (N, 9) intrinsics ``[f(2), c(2), k(3), p(2)]``.

    Returns:
      (N, ..., 2) projected 2D points in normalized screen coordinates.
    """
    assert X.shape[-1] == 3, f"expected (...,3) points, got {X.shape}"
    assert camera_params.ndim == 2 and X.shape[0] == camera_params.shape[0]

    xp = _xp(X, camera_params)
    f, c, k, p = _split_intrinsics(camera_params, X.ndim)

    XX = xp.clip(X[..., :2] / X[..., 2:], -1.0, 1.0)
    r2 = xp.sum(XX * XX, axis=-1, keepdims=True)

    radial = 1.0 + xp.sum(
        k * xp.concatenate([r2, r2 * r2, r2 * r2 * r2], axis=-1),
        axis=-1,
        keepdims=True,
    )
    tan = xp.sum(p * XX, axis=-1, keepdims=True)

    XXX = XX * (radial + tan) + p * r2
    return f * XXX + c


def project_to_2d_linear(X, camera_params):
    """Linear pinhole projection (focal + principal point only).

    Parity: ``/root/reference/common/camera.py:69-89``.
    """
    assert X.shape[-1] == 3, f"expected (...,3) points, got {X.shape}"
    assert camera_params.ndim == 2 and X.shape[0] == camera_params.shape[0]

    xp = _xp(X, camera_params)
    f, c, _, _ = _split_intrinsics(camera_params, X.ndim)
    XX = xp.clip(X[..., :2] / X[..., 2:], -1.0, 1.0)
    return f * XX + c
