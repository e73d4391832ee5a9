"""Pallas TPU kernel: fused dilated temporal-convolution residual block.

The hot op of the framework (SURVEY.md §2 "native components"): one residual
block of the dilated eval model is

    y   = relu(bn1(dilated_conv_w3(x)))        # width-3 conv, dilation d
    out = x[:, d+shift : T-d+shift] + relu(bn2(conv1x1(y)))

(``/root/reference/common/model.py:126-138`` semantics, inference mode).  The XLA
path materializes the 3-tap concat and the two intermediates in HBM; this kernel
keeps everything in VMEM:

  * all four weight operands (3 conv taps + the 1x1) stay VMEM-resident across
    the whole grid (constant index_map), ~8.4 MB at 1024 channels in bf16;
  * each grid step manually DMAs one overlapping input window
    ``x[b, t0 : t0 + T_TILE + 2d]`` HBM->VMEM (overlapping windows cannot be
    expressed with BlockSpec tiling), double-buffered so the next window loads
    while the current tile computes;
  * the three dilated taps are three MXU matmuls accumulated in f32, the
    BatchNorm (folded to scale/shift by :func:`fold_batchnorm`), ReLU, 1x1
    matmul, second BN+ReLU and the residual add all fuse in-register;
  * one bf16 store of the output tile per grid step.

HBM traffic per tile: read ~(T_TILE + 2d) rows + write T_TILE rows — a >3x
reduction vs the unfused path (which reads/writes the intermediates too).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videopose3d_tpu.models.temporal import BN_EPS


def fold_batchnorm(bn_params, bn_state) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into an affine (scale, shift) pair:
    ``bn(x) = x * scale + shift`` (uses the model's BN_EPS)."""
    scale = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + BN_EPS)
    shift = bn_params["bias"] - bn_state["mean"] * scale
    return scale, shift


def _tile_geometry(t, t_out, t_tile, reach, align=16):
    """Shared wrapper geometry: align output tiles to the sublane tiling,
    size the overlapping DMA window (``reach`` = (k-1)*dilation extra rows),
    and compute the input/output padding so ``t_out`` divides into tiles and
    every window stays in range.

    ``align`` must be the HBM sublane tile of the array's dtype — 16 for
    bf16 ((16, 128) tiling), 32 for int8 — or Mosaic rejects the
    sublane-unaligned window DMAs (the remote compiler crashes; see
    CLAUDE.md's int8 boundary-condition notes).  Shared by the single-window
    wrappers here, ``fused_expand_block`` (whose extra raw-stage window stays
    local), and the int8 serving kernels in ``temporal_block_int8.py`` — the
    tiling rules must not drift between them."""
    t_tile = min(t_tile, t_out)
    t_tile = -(-t_tile // align) * align
    n_tiles = -(-t_out // t_tile)
    t_padded_out = n_tiles * t_tile
    win = -(-(t_tile + reach) // align) * align
    t_needed = (n_tiles - 1) * t_tile + win
    pad_amount = max(t_padded_out - t_out, t_needed - t)
    return t_tile, n_tiles, t_padded_out, win, pad_amount


def _rows_needed(t, t_out, t_tile, reach, geometry=_tile_geometry, slack=0):
    """Physical input rows a stage's window DMAs touch (its t_needed).

    ``slack`` widens every window by that many rows without changing tile
    geometry — used by the int8 accshift tap mode, whose aligned-start tap
    dots read up to 32 rows past the base window."""
    tt, n_tiles, _, win, _ = geometry(t, t_out, t_tile, reach)
    return (n_tiles - 1) * tt + win + slack


def _alloc_rows(t_padded_out, t_tile_stage, t_out, t_tile, next_reach,
                geometry=_tile_geometry, next_slack=0):
    """Rows to allocate for a stage's output stream.

    Grown past the stage's own padded output so the NEXT stage's window DMAs
    fit without a slice-to-valid + re-pad round trip (two full-stream copies
    per block boundary).  Tail rows beyond the grid's writes stay
    uninitialized: they feed only output positions past the real ``t_out``
    that the final slice drops (each output row reads input rows
    ``row .. row + reach`` only, so kept rows never touch the tail), and the
    elementwise epilogues are row-local, so garbage — even NaN bit patterns
    in float tails — cannot reach a kept output."""
    if next_reach is None:
        return t_padded_out
    need = _rows_needed(t_out, t_out - next_reach, t_tile, next_reach,
                        geometry, slack=next_slack)
    # Multiple of the stage's tile so the out BlockSpec tiling stays regular.
    return max(t_padded_out, -(-need // t_tile_stage) * t_tile_stage)


def _pipelined_window(x_hbm, x_vmem, sems, t_tile, window_len):
    """Double-buffered window DMA over the (batch, tiles) grid.

    Slot parity follows the LINEAR grid index so the prefetch pipeline
    crosses batch-row boundaries: tile (b+1, 0) is started while (b, n_t-1)
    computes, instead of stalling one full window DMA per row.  Shared by all
    three fused-block kernels — pipeline fixes must not be applied to one
    copy only (commit history: the cross-row fix originally landed three
    times in lockstep).  Returns the current tile's VMEM window, waited on.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)

    idx = b * n_t + t
    slot = jax.lax.rem(idx, 2)
    next_slot = jax.lax.rem(idx + 1, 2)

    def window_dma(dst_slot, row, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[row, pl.ds(tile_idx * t_tile, window_len)],
            x_vmem.at[dst_slot],
            sems.at[dst_slot],
        )

    @pl.when(idx == 0)
    def _():
        window_dma(slot, b, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        window_dma(next_slot, b, t + 1).start()

    @pl.when(jnp.logical_and(t + 1 == n_t, b + 1 < n_b))
    def _():
        window_dma(next_slot, b + 1, 0).start()

    window_dma(slot, b, t).wait()
    return x_vmem[slot]


def _block_kernel(x_hbm, w_taps, s1, b1, w2, s2, b2, out,
                  x_vmem, sems, *, t_tile, dilation, res_offset, n_taps, win):

    x = _pipelined_window(x_hbm, x_vmem, sems, t_tile, win)

    # Width-n dilated conv as n accumulated MXU matmuls (f32 accumulation).
    # Tap offsets are static, so these are static slices of the VMEM window.
    acc = jnp.dot(x[0:t_tile], w_taps[0, :, :],
                  preferred_element_type=jnp.float32)
    for j in range(1, n_taps):
        acc += jnp.dot(x[j * dilation: j * dilation + t_tile], w_taps[j, :, :],
                       preferred_element_type=jnp.float32)

    h = jnp.maximum(acc * s1[0, :] + b1[0, :], 0.0).astype(x.dtype)

    acc2 = jnp.dot(h, w2[:, :], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2 * s2[0, :] + b2[0, :], 0.0)

    res = x[res_offset: res_offset + t_tile].astype(jnp.float32)
    out[0] = (res + y).astype(out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "causal_shift", "t_tile", "interpret",
                     "valid", "next_reach"))
def fused_dilated_block(x, w_taps, bn1_scale, bn1_shift, w2, bn2_scale,
                        bn2_shift, *, dilation: int, causal_shift: int = 0,
                        t_tile: int = 256, interpret: bool = False,
                        valid: int = None, next_reach: int = None):
    """Apply one fused residual block (inference mode).

    Args:
      x: (B, T, C) activations (bf16 or f32).
      w_taps: (k, C, C) dilated conv weights (k odd, typically 3).
      bn1_scale/shift, bn2_scale/shift: (C,) folded BatchNorm affines.
      w2: (C, C) 1x1 conv weights (taken as (1, C, C) or (C, C)).
      dilation: temporal dilation d; the residual slice offset is
        ``(k-1)//2*d + causal_shift`` (parity: model.py:130-132).
      valid: real input length when ``x`` carries a producer's scratch tail
        (rows past ``valid``); defaults to ``x.shape[1]``.
      next_reach: when chaining fused blocks, the next block's
        ``(k-1)*dilation`` — the output is then allocated with scratch tail
        rows covering the next block's windows and returned UNSLICED
        ((B, alloc, C); only the first ``valid - (k-1)*d`` rows are real).

    Returns:
      (B, T - (k-1)*d, C) block output, same dtype as ``x``; with
      ``next_reach`` set, (B, alloc >= T - (k-1)*d, C) with a scratch tail.
    """
    if w2.ndim == 3:
        w2 = w2[0]
    n_taps = w_taps.shape[0]
    b, t_phys, c = x.shape
    t = valid if valid is not None else t_phys
    t_tile_param = t_tile
    pad = (n_taps - 1) * dilation // 2
    res_offset = pad + causal_shift
    t_out = t - (n_taps - 1) * dilation
    assert t_out >= 1, (t, dilation)

    # Pad the time axis so t_out divides evenly into tiles; the tail windows
    # read padding (or, in a fused chain, the producer's scratch tail) and
    # their outputs are dropped.  The DMA window is rounded up to the bf16
    # 16-row sublane tiling (Mosaic HBM-slice constraint), so the input gets
    # padded to cover the widest window too.
    t_tile, n_tiles, t_padded_out, win, _ = _tile_geometry(
        t, t_out, t_tile, (n_taps - 1) * dilation)
    t_needed = (n_tiles - 1) * t_tile + win
    if t_phys < t_needed:
        x = jnp.pad(x, ((0, 0), (0, t_needed - t_phys), (0, 0)))
    alloc = _alloc_rows(t_padded_out, t_tile, t_out, t_tile_param, next_reach)

    dtype = x.dtype
    as_row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _block_kernel, t_tile=t_tile, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, win=win)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, alloc, c), dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x stays in HBM
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # conv taps, resident
            pl.BlockSpec((1, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # 1x1, resident
            pl.BlockSpec((1, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, c), dtype),                  # double-buffered x
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_padded_out * c * c * (n_taps + 1),
            bytes_accessed=b * (t_padded_out + t) * c * 2 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(dtype), w_taps.astype(dtype), as_row(bn1_scale),
      as_row(bn1_shift), w2.astype(dtype), as_row(bn2_scale),
      as_row(bn2_shift))

    if next_reach is None and out.shape[1] > t_out:
        out = out[:, :t_out]
    return out


# ---------------------------------------------------------------------------
# Variants fusing the cheap boundary convolutions into the first/last block,
# eliminating the HBM round-trips of the expand output (B, T, C) and the final
# block's C-wide output (the shrink only needs J*3 lanes).
# ---------------------------------------------------------------------------


def _expand_block_kernel(x_hbm, w0, s0, b0, w_taps, s1, b1, w2, s2, b2, out,
                         x_vmem, sems, *, t_tile, dilation, res_offset, n_taps,
                         k0, win, raw_win):
    raw = _pipelined_window(x_hbm, x_vmem, sems, t_tile, raw_win)

    # Expand conv (width k0, dilation 1) over the raw window -> (win, C).
    eacc = jnp.dot(raw[0:win], w0[0, :, :], preferred_element_type=jnp.float32)
    for j in range(1, k0):
        eacc += jnp.dot(raw[j: j + win], w0[j, :, :],
                        preferred_element_type=jnp.float32)
    e = jnp.maximum(eacc * s0[0, :] + b0[0, :], 0.0).astype(out.dtype)

    # Residual block over the in-register expand activations.
    acc = jnp.dot(e[0:t_tile], w_taps[0, :, :],
                  preferred_element_type=jnp.float32)
    for j in range(1, n_taps):
        acc += jnp.dot(e[j * dilation: j * dilation + t_tile], w_taps[j, :, :],
                       preferred_element_type=jnp.float32)
    h = jnp.maximum(acc * s1[0, :] + b1[0, :], 0.0).astype(out.dtype)
    acc2 = jnp.dot(h, w2[:, :], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2 * s2[0, :] + b2[0, :], 0.0)
    res = e[res_offset: res_offset + t_tile].astype(jnp.float32)
    out[0] = (res + y).astype(out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "causal_shift", "t_tile", "interpret",
                     "next_reach"))
def fused_expand_block(x_raw, w0, bn0_scale, bn0_shift, w_taps, bn1_scale,
                       bn1_shift, w2, bn2_scale, bn2_shift, *, dilation: int,
                       causal_shift: int = 0, t_tile: int = 256,
                       interpret: bool = False, next_reach: int = None):
    """Expand conv + first residual block in one kernel.

    Args:
      x_raw: (B, T, C_in) raw inputs (C_in = J*F, e.g. 34).
      w0: (k0, C_in, C) expand conv weights; bn0_*: folded expand BN affine.
      remaining args as :func:`fused_dilated_block` for the first block,
      including ``next_reach`` (output returned unsliced with a scratch tail
      covering the next block's windows).

    Returns:
      (B, T - (k0-1) - (k-1)*d, C) first-block output (unsliced
      (B, alloc, C) when ``next_reach`` is set).
    """
    if w2.ndim == 3:
        w2 = w2[0]
    k0 = w0.shape[0]
    n_taps = w_taps.shape[0]
    c = w0.shape[2]
    b, t, c_in = x_raw.shape

    # Mosaic HBM slices need the minor (lane) dim 128-aligned; zero-pad the raw
    # feature dim (J*F, e.g. 34) and the matching conv input dim.  The padded
    # lanes multiply zero weights, and the raw array is tiny (<10 MB padded).
    c_in_pad = -(-c_in // 128) * 128
    if c_in_pad != c_in:
        x_raw = jnp.pad(x_raw, ((0, 0), (0, 0), (0, c_in_pad - c_in)))
        w0 = jnp.pad(w0, ((0, 0), (0, c_in_pad - c_in), (0, 0)))
        c_in = c_in_pad
    pad = (n_taps - 1) * dilation // 2
    res_offset = pad + causal_shift
    t_expand = t - (k0 - 1)                      # expand output length
    t_out = t_expand - (n_taps - 1) * dilation   # block output length
    assert t_out >= 1, (t, dilation)

    # Same rules as _tile_geometry with the raw-stage rows folded into the
    # reach; only the unaligned expand-stage window stays local.
    t_tile_param = t_tile
    t_tile, n_tiles, t_padded_out, raw_win, pad_amount = _tile_geometry(
        t, t_out, t_tile, (n_taps - 1) * dilation + k0 - 1)
    win = t_tile + (n_taps - 1) * dilation       # expand rows needed per tile
    if pad_amount > 0:
        x_raw = jnp.pad(x_raw, ((0, 0), (0, pad_amount), (0, 0)))
    alloc = _alloc_rows(t_padded_out, t_tile, t_out, t_tile_param, next_reach)

    dtype = w_taps.dtype
    as_row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _expand_block_kernel, t_tile=t_tile, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, k0=k0, win=win, raw_win=raw_win)

    vec = lambda: pl.BlockSpec((1, c), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, alloc, c), dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # raw x in HBM
            pl.BlockSpec((k0, c_in, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, raw_win, c_in), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100)),
        interpret=interpret,
    )(x_raw.astype(dtype), w0.astype(dtype), as_row(bn0_scale), as_row(bn0_shift),
      w_taps.astype(dtype), as_row(bn1_scale), as_row(bn1_shift),
      w2.astype(dtype), as_row(bn2_scale), as_row(bn2_shift))

    if next_reach is None and out.shape[1] > t_out:
        out = out[:, :t_out]
    return out


def _shrink_block_kernel(x_hbm, w_taps, s1, b1, w2, s2, b2, ws, bs, out,
                         x_vmem, sems, *, t_tile, dilation, res_offset,
                         n_taps, win):
    x = _pipelined_window(x_hbm, x_vmem, sems, t_tile, win)

    acc = jnp.dot(x[0:t_tile], w_taps[0, :, :],
                  preferred_element_type=jnp.float32)
    for j in range(1, n_taps):
        acc += jnp.dot(x[j * dilation: j * dilation + t_tile], w_taps[j, :, :],
                       preferred_element_type=jnp.float32)
    h = jnp.maximum(acc * s1[0, :] + b1[0, :], 0.0).astype(x.dtype)
    acc2 = jnp.dot(h, w2[:, :], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2 * s2[0, :] + b2[0, :], 0.0)
    res = x[res_offset: res_offset + t_tile].astype(jnp.float32)
    block_out = (res + y).astype(x.dtype)

    # Shrink projection fused in-register: (t_tile, C) @ (C, J3) + bias.
    proj = jnp.dot(block_out, ws[:, :], preferred_element_type=jnp.float32)
    out[0] = (proj + bs[0, :]).astype(out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "causal_shift", "t_tile", "interpret",
                     "valid"))
def fused_shrink_block(x, w_taps, bn1_scale, bn1_shift, w2, bn2_scale,
                       bn2_shift, w_shrink, b_shrink, *, dilation: int,
                       causal_shift: int = 0, t_tile: int = 256,
                       interpret: bool = False, valid: int = None):
    """Last residual block + the 1x1 shrink projection in one kernel.

    Args as :func:`fused_dilated_block` plus ``w_shrink``: (C, J_out*3) (or
    (1, C, J3)) and ``b_shrink``: (J_out*3,).

    Returns:
      (B, T - (k-1)*d, J_out*3) projected outputs in float32.
    """
    if w2.ndim == 3:
        w2 = w2[0]
    if w_shrink.ndim == 3:
        w_shrink = w_shrink[0]
    n_taps = w_taps.shape[0]
    b, t_phys, c = x.shape
    t = valid if valid is not None else t_phys
    j3 = w_shrink.shape[1]
    pad = (n_taps - 1) * dilation // 2
    res_offset = pad + causal_shift
    t_out = t - (n_taps - 1) * dilation
    assert t_out >= 1, (t, dilation)

    t_tile, n_tiles, t_padded_out, win, _ = _tile_geometry(
        t, t_out, t_tile, (n_taps - 1) * dilation)
    t_needed = (n_tiles - 1) * t_tile + win
    if t_phys < t_needed:
        x = jnp.pad(x, ((0, 0), (0, t_needed - t_phys), (0, 0)))

    dtype = x.dtype
    as_row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _shrink_block_kernel, t_tile=t_tile, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, win=win)

    vec = lambda: pl.BlockSpec((1, c), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_padded_out, j3), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, j3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, j3), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100)),
        interpret=interpret,
    )(x, w_taps.astype(dtype), as_row(bn1_scale), as_row(bn1_shift),
      w2.astype(dtype), as_row(bn2_scale), as_row(bn2_shift),
      w_shrink.astype(dtype), as_row(b_shrink))

    if t_padded_out > t_out:
        out = out[:, :t_out]
    return out
