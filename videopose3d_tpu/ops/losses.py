"""Pose-estimation losses and evaluation protocols.

Functional parity target: ``/root/reference/common/loss.py:11-88``.

Split by execution site, mirroring the reference's own design decision:

* **In-graph (differentiable, jnp)** — :func:`mpjpe`, :func:`weighted_mpjpe`,
  :func:`n_mpjpe`: these run inside jitted train/eval steps on TPU.
* **Host-side (numpy)** — :func:`p_mpjpe` (Procrustes alignment via SVD) and
  :func:`mean_velocity_error`: evaluation-only protocols the reference also computes
  on host (``/root/reference/run.py:698-704``).  Tiny 3x3 SVDs batched over frames are
  a poor fit for the MXU and run once per evaluation, so they stay on host by design.

All in-graph losses optionally take a ``mask`` over frames so that bucket-padded
whole-sequence evaluation (static XLA shapes) can exclude padding frames without a
host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _masked_mean(per_frame, mask):
    """Mean of ``per_frame`` (B, T, ...) with optional (B, T) frame validity mask."""
    if mask is None:
        return jnp.mean(per_frame)
    # Broadcast mask over trailing (joint) dims.
    m = mask.astype(per_frame.dtype)
    while m.ndim < per_frame.ndim:
        m = m[..., None]
    m = jnp.broadcast_to(m, per_frame.shape)
    # where, not multiply: padded frames can hold NaN/inf values (e.g.
    # n_mpjpe's 0/0 scale on all-zero padding) and NaN * 0 is NaN.
    return (jnp.sum(jnp.where(m > 0, per_frame, 0.0))
            / jnp.maximum(jnp.sum(m), 1.0))


def mpjpe(predicted, target, mask=None):
    """Protocol #1: mean per-joint position error (mean Euclidean distance).

    Parity: ``/root/reference/common/loss.py:11-17``.  Differentiable.

    Args:
      predicted, target: (..., J, 3) poses.
      mask: optional (B, T) validity mask (1 = real frame) for padded batches.
    """
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    dist = jnp.linalg.norm(predicted - target, axis=-1)
    return _masked_mean(dist, mask)


def weighted_mpjpe(predicted, target, w):
    """Per-sample weighted MPJPE, used for the trajectory model's inverse-depth loss.

    Parity: ``/root/reference/common/loss.py:19-25``.
    """
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    assert w.shape[0] == predicted.shape[0]
    return jnp.mean(w * jnp.linalg.norm(predicted - target, axis=-1))


def n_mpjpe(predicted, target, mask=None):
    """Protocol #3: MPJPE after optimal per-sequence scale alignment.

    Parity: ``/root/reference/common/loss.py:68-78``.  The optimal scale is
    ``<target, predicted> / ||predicted||^2`` averaged over joints per frame.
    """
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    norm_predicted = jnp.mean(
        jnp.sum(predicted**2, axis=3, keepdims=True), axis=2, keepdims=True
    )
    norm_target = jnp.mean(
        jnp.sum(target * predicted, axis=3, keepdims=True), axis=2, keepdims=True
    )
    scale = norm_target / norm_predicted
    return mpjpe(scale * predicted, target, mask=mask)


def _similarity_align(points, anchor):
    """Per-frame similarity transform (rotation + scale + translation) mapping
    ``points`` onto ``anchor``, least-squares optimal (orthogonal Procrustes).

    Both inputs are (N, J, 3); returns the transformed ``points``.  The rotation
    is the proper-orthogonal polar factor of the centered cross-covariance
    points^T·anchor, with the smallest-singular-axis reflected whenever the raw
    polar factor would be a reflection.
    """
    pts_center = points.mean(axis=1, keepdims=True)
    anc_center = anchor.mean(axis=1, keepdims=True)
    pts_c = points - pts_center
    anc_c = anchor - anc_center
    pts_scale = np.linalg.norm(pts_c, axis=(1, 2), keepdims=True)
    anc_scale = np.linalg.norm(anc_c, axis=(1, 2), keepdims=True)
    pts_c = pts_c / pts_scale
    anc_c = anc_c / anc_scale

    # (N, 3, 3) cross-covariance of the unit-scale clouds, points-to-anchor.
    xcov = np.einsum("nji,njk->nik", pts_c, anc_c)
    left, sv, right_t = np.linalg.svd(xcov)
    improper = np.linalg.det(left @ right_t) < 0
    left[improper, :, -1] = -left[improper, :, -1]
    sv[improper, -1] = -sv[improper, -1]
    rot = left @ right_t

    # Optimal scale is the (reflection-corrected) nuclear norm of the
    # cross-covariance, rescaled back to the original cloud magnitudes.
    gain = sv.sum(axis=1)[:, None, None] * anc_scale / pts_scale
    shift = anc_center - gain * (pts_center @ rot)
    return gain * (points @ rot) + shift


def mpjpe_np(predicted, target):
    """Protocol #1 on host numpy (the evaluation loop computes protocols from
    predictions already fetched for Procrustes; same formula as :func:`mpjpe`)."""
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    return float(np.mean(np.linalg.norm(predicted - target, axis=-1)))


def n_mpjpe_np(predicted, target):
    """Protocol #3 on host numpy (same optimal-scale formula as :func:`n_mpjpe`)."""
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    norm_predicted = np.mean(np.sum(predicted ** 2, axis=3, keepdims=True),
                             axis=2, keepdims=True)
    norm_target = np.mean(np.sum(target * predicted, axis=3, keepdims=True),
                          axis=2, keepdims=True)
    scale = norm_target / norm_predicted
    return mpjpe_np(scale * predicted, target)


def p_mpjpe(predicted, target):
    """Protocol #2: MPJPE after rigid (Procrustes) alignment — host-side numpy.

    Behavior parity: ``/root/reference/common/loss.py:27-66`` (same alignment,
    including the det<0 reflection fix), validated by the golden test against
    the reference on random poses.

    Args:
      predicted, target: (N, J, 3) numpy arrays (one row per frame).
    """
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    aligned = _similarity_align(np.asarray(predicted), np.asarray(target))
    return np.mean(np.linalg.norm(aligned - np.asarray(target), axis=-1))


def mean_velocity_error(predicted, target):
    """MPJVE: mean Euclidean distance of first temporal derivatives — host-side numpy.

    Parity: ``/root/reference/common/loss.py:80-88``.
    """
    assert predicted.shape == target.shape, (predicted.shape, target.shape)
    velocity_predicted = np.diff(np.asarray(predicted), axis=0)
    velocity_target = np.diff(np.asarray(target), axis=0)
    return np.mean(np.linalg.norm(velocity_predicted - velocity_target, axis=-1))
