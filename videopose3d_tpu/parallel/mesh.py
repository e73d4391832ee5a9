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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> bool:
    """Connect this process to the JAX distributed runtime (multi-host pod).

    After this, ``jax.devices()`` returns the *global* device set and
    :func:`make_mesh` spans the whole pod; GSPMD then rides ICI within hosts
    and DCN across them with no further code changes.  Must be called once per
    process before any other jax API touches a backend.

    Arguments default from the standard launcher environment
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``).
    On Cloud TPU pod slices all three are auto-detected by jax itself, so an
    explicit coordinator is only needed for manual launches.

    Returns True if the distributed runtime was initialized; False when
    running single-process (guarded no-op — safe to call unconditionally).
    """
    explicit = coordinator_address is not None or num_processes is not None
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None and num_processes <= 1 and not explicit:
        # A launcher exporting JAX_NUM_PROCESSES=1 is single-process: no-op
        # rather than crash in rendezvous, as the docstring promises.  An
        # *explicit argument* of num_processes=1 (or a coordinator address)
        # still initializes — a caller may want the real coordination service
        # on a one-process slice (e.g. multi-host-format checkpoint I/O).
        return False
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address, num_processes=num_processes,
        process_id=process_id, local_device_ids=local_device_ids)
    return True


def process_info() -> dict:
    """This process's place in the (possibly multi-host) topology."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices.

    After :func:`initialize_distributed`, ``jax.devices()`` is the global pod
    device list, so the same call builds a pod-wide mesh."""
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


def host_array_to_global(host_array: np.ndarray, mesh: Mesh,
                         spec: P) -> jax.Array:
    """Build a global ``jax.Array`` with the given :class:`PartitionSpec` from a
    host array that every process holds identically (e.g. the sampler's chunk
    descriptors, which are deterministic per seed).

    Single-host this is just a sharded ``device_put``; multi-host, each process
    materializes only its addressable shards — the supported way to feed
    global inputs to a pod-wide ``jit`` (no cross-process gather of
    process-local arrays on the step path).
    """
    host_array = np.asarray(host_array)
    return jax.make_array_from_callback(
        host_array.shape, NamedSharding(mesh, spec),
        lambda idx: host_array[idx])


def global_batch_array(host_array: np.ndarray, mesh: Mesh,
                       axis_name: str = "data") -> jax.Array:
    """:func:`host_array_to_global` with the leading (batch) dim sharded."""
    return host_array_to_global(host_array, mesh, P(axis_name))


def replicated_array(host_array: np.ndarray, mesh: Mesh) -> jax.Array:
    """Replicate a host array (identical on every process) across the mesh —
    multi-host-safe counterpart of ``device_put(x, replicated_sharding(mesh))``."""
    return host_array_to_global(host_array, mesh, P())


def local_replica(tree):
    """Per-process local view of a pod-replicated pytree.

    On a multi-host pod the trained parameters are global ``jax.Array``s
    spanning every process's devices; code that runs *per process* — the
    shardings-free evaluation jit, checkpoint snapshotting on process 0,
    rendering — cannot consume them (a computation touching non-addressable
    devices must be entered by every process, and process-local helpers are
    not collectives).  Because the state is fully replicated, each process
    already holds a complete copy: this returns that copy as ordinary
    single-device local arrays (zero-copy — a view of the first addressable
    shard's buffer).

    Fully-addressable leaves (single-process runs, host arrays) pass through
    untouched, so callers can apply this unconditionally.
    """
    def to_local(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if not x.is_fully_replicated:
                raise ValueError(
                    "local_replica needs fully-replicated arrays; got "
                    f"sharding {x.sharding} for shape {x.shape}")
            return x.addressable_data(0)
        return x
    return jax.tree_util.tree_map(to_local, tree)
