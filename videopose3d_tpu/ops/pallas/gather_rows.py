"""Pipelined row-window gather for on-device batch assembly.

The supervised train step assembles each batch by copying ``B`` contiguous
``(window, C)`` row windows out of the flat margin-padded 2D stream
(``data/generators.py::assemble_chunked_batch_contiguous`` — the TPU form of
the reference's ``ChunkedGenerator`` batch build,
``/root/reference/common/generators.py:88-121``).  XLA lowers the
``vmap(dynamic_slice)`` to a row gather that measures ~30-50 GB/s at the
flagship shape (1024 windows x 243 rows x 34 f32 lanes): the gather engine
moves one 136-byte row per step, so the copy is transaction-latency-bound,
not bandwidth-bound.

This kernel instead issues each window as ONE strided DMA (the whole window
is contiguous rows) and keeps ``nbuf`` windows in flight on a ring of VMEM
buffers, so the per-copy HBM latency overlaps across windows.  The out
stream is written through the ordinary Pallas output pipeline (also double
buffered).  Pure data movement — the output is bitwise-equal to the XLA
gather by construction.

Alignment (measured on the round-5 Mosaic): a ``pl.ANY`` operand maps to a
``(1, 128)``-tiled memref, so the binding constraint is the LANE tile — the
DMA only compiles when the stream's column count is a multiple of 128
("Slice shape along dimension 1 must be aligned to tiling (128)").  Callers
therefore hand this kernel a lane-padded stream
(``to_device(lane_pad_2d=True)``) and get the logical columns back via
``out_cols``.  Row offsets are tile-free under (1, 128), but the kernel
still DMAs from the sublane-aligned floor and phase-slices in VMEM — a few
extra rows per window buys robustness against Mosaic ever mapping the
operand with (8, 128)/(16, 128) tiling, where unaligned row DMAs are
rejected (CLAUDE.md "Kernel boundary conditions").

Contract: ``flat`` must carry at least ``sublanes(dtype) - 1`` rows of
readable tail margin past the last addressable window row, i.e.
``row0.max() + window + sublanes - 1 <= flat.shape[0]``.
``FlatSequenceDataset.to_device(flatten_2d=True)`` appends
``GATHER_TAIL_MARGIN`` zero rows for exactly this (the values are never
used — only the DMA read must stay in bounds).  Out-of-contract ``row0``
values degrade to a clamped (wrong-rows) window, never an out-of-bounds
access.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tail rows appended by FlatSequenceDataset.to_device(flatten_2d=True) so the
# aligned-floor DMA of the last window stays in bounds for any dtype here.
GATHER_TAIL_MARGIN = 32


def _sublanes(dtype) -> int:
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.float32):
        return 8
    if d == jnp.dtype(jnp.bfloat16):
        return 16
    raise ValueError(f"gather_windows: unsupported dtype {d} "
                     "(float32 and bfloat16 windows only)")


def _gather_kernel(row0_ref, flat, out_ref, scratch, sems, *,
                   window, w8, align, nbuf, nslot, ra_max, n):
    """One grid step = one window: wait its DMA, phase-slice, emit; keep
    ``nbuf`` window DMAs in flight on ``nslot = nbuf + 1`` VMEM slots (the
    +1 slot means a newly started DMA always targets the buffer consumed a
    full grid step ago, the same write-after-read spacing as the block
    kernels' double buffering)."""
    i = pl.program_id(0)

    def copy(j, slot):
        r = row0_ref[j]
        ra = jnp.minimum((r // align) * align, ra_max)
        return pltpu.make_async_copy(
            flat.at[pl.ds(ra, w8)], scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        for j in range(min(nbuf, n)):  # static warm-up fan-out
            copy(j, j % nslot).start()

    @pl.when(i + nbuf < n)
    def _():
        j = i + nbuf
        copy(j, jax.lax.rem(j, nslot)).start()

    slot = jax.lax.rem(i, nslot)
    copy(i, slot).wait()
    r = row0_ref[i]
    p = r - jnp.minimum((r // align) * align, ra_max)
    # Ref-level dynamic slice (pl.ds) — the only dynamic-slice form Mosaic
    # lowers; p is sub-sublane-unaligned by construction.  The static lane
    # slice drops DMA-alignment padding columns (out_cols < flat cols).
    out_ref[0] = scratch[slot, pl.ds(p, window), :out_ref.shape[2]]


@functools.partial(jax.jit,
                   static_argnames=("window", "nbuf", "out_cols", "interpret"))
def gather_windows(flat, row0, *, window: int, nbuf: int = 8,
                   out_cols: int | None = None, interpret: bool = False):
    """``stack([flat[r : r + window, :out_cols] for r in row0])`` as
    pipelined DMAs.

    Args:
      flat: (R, C) f32/bf16 row stream (see the tail-margin contract above).
        Mosaic only compiles the window DMA when C is a multiple of the
        128-lane tile, so callers on TPU hardware pass a lane-padded stream
        (e.g. 34 -> 128) and slice the pad columns off in-kernel via
        ``out_cols``.
      row0: (B,) int32 first row of each window.
      window: static window length in rows.
      out_cols: emit only the first ``out_cols`` columns (default: all).

    Returns:
      (B, window, out_cols or C) windows, bitwise-equal to the XLA gather.
    """
    if flat.ndim != 2:
        raise ValueError(f"gather_windows: flat must be rank-2 (rows, C), "
                         f"got {flat.shape}")
    align = _sublanes(flat.dtype)
    w8 = window + align  # covers any sub-sublane phase p in [0, align)
    r_rows, c = flat.shape
    if r_rows < w8:
        raise ValueError(f"gather_windows: flat has {r_rows} rows < "
                         f"window + sublanes = {w8}")
    (b,) = row0.shape
    oc = c if out_cols is None else out_cols
    if not 0 < oc <= c:
        raise ValueError(f"out_cols={out_cols} out of range for {c} columns")
    ra_max = ((r_rows - w8) // align) * align
    nslot = nbuf + 1
    kernel = functools.partial(
        _gather_kernel, window=window, w8=w8, align=align, nbuf=nbuf,
        nslot=nslot, ra_max=ra_max, n=b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, window, oc), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslot, w8, c), flat.dtype),
            pltpu.SemaphoreType.DMA((nslot,)),
        ])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, window, oc), flat.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=b * window * (c + oc) * flat.dtype.itemsize),
        interpret=interpret,
    )(row0.astype(jnp.int32), flat)
