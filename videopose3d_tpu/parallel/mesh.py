"""Device mesh / sharding helpers — the distributed backend of the framework.

The reference has no distributed support at all (single GPU via bare ``.cuda()``,
``/root/reference/run.py:200-202``).  The TPU-native equivalent of the missing
DistributedDataParallel is GSPMD data parallelism: one ``jax.sharding.Mesh`` over
all chips with the batch dimension sharded on a ``data`` axis.  Parameters,
optimizer state, BatchNorm statistics and the flat dataset arrays are replicated;
XLA inserts the gradient all-reduce (and the BatchNorm batch-statistic all-reduce)
over ICI automatically.

A nicety this buys over torch DDP: BatchNorm batch statistics are *global* across
the mesh (XLA reduces ``jnp.mean`` over the sharded batch axis), so data-parallel
training is numerically identical to single-chip training at the same global batch
size — there is no per-replica-stats drift to worry about.

The model (~8.5-17M params) is far below HBM capacity, so tensor/pipeline
parallelism would only add latency; scaling is pure DP, with batch size as the
lever.  (See SURVEY.md §2: no other parallelism exists in the workload.)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (params, optimizer state, datasets)."""
    return NamedSharding(mesh, P())


def shard_batch_size(batch_size: int, mesh: Mesh) -> int:
    """Round ``batch_size`` up to a multiple of the mesh size so the batch axis
    divides evenly across chips."""
    n = mesh.size
    return -(-batch_size // n) * n
