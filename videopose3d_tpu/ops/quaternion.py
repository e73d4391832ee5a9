"""Batched quaternion operations, host- and graph-polymorphic.

Functional parity target: the reference quaternion ops
(``/root/reference/common/quaternion.py:10-35``), re-expressed as jit-friendly
array code.  All functions broadcast over arbitrary leading batch dims, so
callers never need the reference's host-side ``np.tile`` trick
(``/root/reference/common/camera.py:30``) — broadcasting happens inside XLA for free.

Backend dispatch: device arrays / tracers compute via ``jax.numpy`` (so these
ops sit inside jitted loss graphs); plain numpy inputs compute via numpy on the
host.  Host-side dataset preparation transforms hundreds of MB of mocap — on a
tunneled-TPU setup, bouncing that through the default jax backend would move it
over a ~10 MB/s relay (see CLAUDE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xp(*arrays):
    """numpy for host inputs, jax.numpy when any input is a jax array/tracer."""
    return (jnp if any(isinstance(a, jax.Array) for a in arrays) else np)


def qrot(q, v):
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``.

    Uses the double-cross-product form ``v' = v + 2*(w*(u x v) + u x (u x v))`` with
    ``q = (w, u)``, which costs two cross products instead of a quaternion sandwich —
    pure VPU element-wise work, fused by XLA.

    Args:
      q: (..., 4) quaternions in (w, x, y, z) order.  Need not have the same batch
         shape as ``v``: standard broadcasting applies.
      v: (..., 3) vectors.

    Returns:
      (..., 3) rotated vectors, in the broadcasted batch shape.
    """
    assert q.shape[-1] == 4, f"expected (...,4) quaternions, got {q.shape}"
    assert v.shape[-1] == 3, f"expected (...,3) vectors, got {v.shape}"

    xp = _xp(q, v)
    w = q[..., :1]
    u = q[..., 1:]
    uv = xp.cross(u, v)
    uuv = xp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def qinverse(q):
    """Inverse (conjugate) of unit quaternion(s): negate the vector part.

    Assumes normalized input, matching the reference semantics.
    """
    assert q.shape[-1] == 4, f"expected (...,4) quaternions, got {q.shape}"
    return _xp(q).concatenate([q[..., :1], -q[..., 1:]], axis=-1)
