"""Pallas TPU kernels: w8a8 int8 serving path for the dilated temporal model.

Serving-only quantization of the fused residual-block pipeline
(``temporal_block.py``), designed for the v5e MXU's 2x int8 throughput:

* **Weights**: symmetric int8 per *output* channel.  Static activation scales
  are folded into the weight matrices *before* quantization (per input
  channel), so no runtime per-channel dequantization of operands is needed.
* **Activations**: the residual stream is non-negative (every block output is
  a sum of post-ReLU terms), so it quantizes to int8 values 0..127 with a
  static per-channel scale calibrated offline.  The stream travels between
  kernels as int8 — half the HBM traffic of the bf16 path on top of the MXU
  speedup.
* **Epilogues**: BatchNorm affine, ReLU, requantization, and the residual add
  all fold into two per-channel f32 multiply-adds on the int32 accumulators,
  entirely in VMEM.

Parity anchor: ``/root/reference/common/model.py:126-138`` inference
semantics; accuracy is validated against the f32 path at mm scale
(``tests/test_int8_serving.py``), with the README accuracy table
(``/root/reference/README.md:16-23``) as the tolerance anchor.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, _conv_matmul, receptive_field)
from videopose3d_tpu.ops.pallas.temporal_block import (
    _alloc_rows as _alloc_rows_base,
    _tile_geometry as _tile_geometry_bf16, fold_batchnorm)

QMAX = 127.0


def _per_out_channel_int8(w_eff: jnp.ndarray):
    """Symmetric int8 quantization of (..., C_out) weights with one scale per
    output channel.  Returns (int8 weights, (C_out,) f32 dequant scales)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(w_eff),
                                 axis=tuple(range(w_eff.ndim - 1))), 1e-8)
    scale = absmax / QMAX
    q = jnp.clip(jnp.round(w_eff / scale), -QMAX, QMAX).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _calibration_ranges(config, params, state, x_calib):
    """Run the f32 eval forward on calibration inputs, recording per-channel
    absmax of every quantization point: the expand output stream, each block's
    mid activation ``h``, and each block's output stream."""
    x = x_calib.reshape(x_calib.shape[0], x_calib.shape[1], -1)
    n_blocks = len(config.filter_widths) - 1
    caps: Dict[str, Any] = {"h": [], "stream": []}

    def absmax(v):
        return jnp.maximum(jnp.max(jnp.abs(v), axis=(0, 1)), 1e-6)

    s0, b0 = fold_batchnorm(params["expand_bn"], state["expand_bn"])
    x = _conv_matmul(x, params["expand_conv"]["weight"], 1, jnp.float32)
    x = jax.nn.relu(x * s0 + b0)
    caps["expand"] = absmax(x)

    for i in range(n_blocks):
        pad = config.pads[i + 1]
        shift = config.causal_shifts_dilated[i + 1]
        res = x[:, pad + shift: x.shape[1] - pad + shift]
        s1, b1 = fold_batchnorm(params["layers_bn"][2 * i],
                                state["layers_bn"][2 * i])
        s2, b2 = fold_batchnorm(params["layers_bn"][2 * i + 1],
                                state["layers_bn"][2 * i + 1])
        h = jax.nn.relu(_conv_matmul(
            x, params["layers_conv"][2 * i]["weight"],
            config.dilations[i + 1], jnp.float32) * s1 + b1)
        caps["h"].append(absmax(h))
        y = jax.nn.relu(_conv_matmul(
            h, params["layers_conv"][2 * i + 1]["weight"], 1,
            jnp.float32) * s2 + b2)
        x = res + y
        caps["stream"].append(absmax(x))
    return caps


def quantize_temporal_model(config: TemporalModelConfig, params, state,
                            x_calib, *, margin: float = 1.25,
                            floor_frac: float = 0.5) -> Dict[str, Any]:
    """Build the int8 serving pytree.

    Args:
      x_calib: (B, T, J, F) calibration keypoints (a few hundred frames of
        representative data; T >= receptive_field).  Coverage matters for
        TRAINED models: ReLU channels can be completely silent on one clip yet
        active on another, so calibrate across several clips spanning the
        serving distribution (``Evaluator.set_calibration`` accepts a list).
      margin: headroom multiplier on the calibrated activation ranges —
        values up to ``margin * calib_absmax`` quantize without clipping on
        data that exceeds the calibration set's extremes.
      floor_frac: per-channel ranges are floored at ``floor_frac *`` the
        layer-wide maximum.  A channel that never fired on the calibration
        data would otherwise get a ~1e-6 range whose reciprocal scale
        explodes the moment the channel fires at serving (measured: a single
        such channel inflates whole-row dynamic requantization by ~1e6x and
        costs hundreds of mm).  The floor costs at most 1/(floor_frac*254)
        of the layer max in step size for genuinely small channels — the
        same resolution a per-tensor scheme would give them.

    Returns a dict of per-layer int8 weights and folded f32 epilogue vectors,
    consumed by :func:`forward_dilated_int8`.
    """
    if config.dense:
        raise ValueError("int8 path does not support dense convolutions")
    n_blocks = len(config.filter_widths) - 1
    if n_blocks < 2:
        raise ValueError("int8 path expects at least 2 residual blocks")
    rf = receptive_field(config)
    if x_calib.shape[1] < rf:
        raise ValueError(
            f"calibration input has {x_calib.shape[1]} frames but the model's "
            f"receptive field is {rf}; supply at least one full window")

    caps = _calibration_ranges(config, params, state, x_calib)
    caps = jax.tree.map(
        lambda v: jnp.maximum(v, floor_frac * jnp.max(v)) * margin, caps)
    q: Dict[str, Any] = {"blocks": []}

    # Expand stage stays bf16 (34-channel matmul, negligible FLOPs); its output
    # is quantized into the first int8 stream.
    s0, b0 = fold_batchnorm(params["expand_bn"], state["expand_bn"])
    v0 = caps["expand"]
    q["expand_w"] = params["expand_conv"]["weight"].astype(jnp.bfloat16)
    q["expand_scale"] = (s0 * QMAX / v0).astype(jnp.float32)
    q["expand_shift"] = (b0 * QMAX / v0).astype(jnp.float32)

    v_in = v0
    for i in range(n_blocks):
        s1, b1 = fold_batchnorm(params["layers_bn"][2 * i],
                                state["layers_bn"][2 * i])
        s2, b2 = fold_batchnorm(params["layers_bn"][2 * i + 1],
                                state["layers_bn"][2 * i + 1])
        h_max = caps["h"][i]
        v_out = caps["stream"][i]
        last = i == n_blocks - 1

        # Fold the input stream's per-channel dequant into the conv weights,
        # then quantize per output channel.
        w_a = params["layers_conv"][2 * i]["weight"]       # (k, C, C)
        wq_a, wsc_a = _per_out_channel_int8(w_a * (v_in / QMAX)[None, :, None])
        w_b = params["layers_conv"][2 * i + 1]["weight"][0]  # (C, C)
        wq_b, wsc_b = _per_out_channel_int8(w_b * (h_max / QMAX)[:, None])

        blk = {
            "wq_a": wq_a, "wq_b": wq_b,
            # h = relu(acc1 * A1 + B1) lands directly in 0..127 h units.
            "A1": (wsc_a * s1 * QMAX / h_max).astype(jnp.float32),
            "B1": (b1 * QMAX / h_max).astype(jnp.float32),
        }
        if last:
            # Final block: keep f32 outputs for the shrink projection.
            blk["A2"] = (wsc_b * s2).astype(jnp.float32)
            blk["B2"] = b2.astype(jnp.float32)
            blk["R"] = (v_in / QMAX).astype(jnp.float32)
        else:
            blk["A2"] = (wsc_b * s2 * QMAX / v_out).astype(jnp.float32)
            blk["B2"] = (b2 * QMAX / v_out).astype(jnp.float32)
            blk["R"] = (v_in / v_out).astype(jnp.float32)
        q["blocks"].append(blk)
        v_in = v_out

    q["shrink_w"] = params["shrink"]["weight"][0].astype(jnp.bfloat16)
    q["shrink_b"] = params["shrink"]["bias"].astype(jnp.float32)
    return q


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _i8dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


# Dilations at or above this default to the accshift tap form below.
# Disabled by default: warm-chip interleaved A/Bs on v5e (tools/exp_realign.py,
# flagship mid-block shape, B=4/T_out=16384/C=1024/t_tile=512) measure the two
# forms within noise at every dilation — slice 1.75-2.00 ms/call vs accshift
# 1.98-2.04 across d=9/27/81, with slice marginally ahead.  The aligned
# controls (d=32/96: 1.74-1.82) put the true unaligned-slice tax at only
# ~5-12%, which accshift's +32-row tap dots and int32-side shifts consume.
# (An earlier cold-chip run that showed accshift winning 2.04 vs 2.41 at d=81
# did not reproduce warm; cold-start pollution.)  Kept as a measured,
# bit-identical experiment knob (forward_dilated_int8(accshift_min_d=...)).
ACCSHIFT_MIN_DILATION = 10 ** 9

# Extra VMEM-window rows the accshift form reads past the base window (one
# int8 sublane tile: tap dots start at aligned offsets <= the tap offset and
# cover t_tile + 32 rows).
_ACCSHIFT_SLACK = 32


def _stage_slack(tap_mode):
    return _ACCSHIFT_SLACK if tap_mode == "accshift" else 0


def _halves_for(tile, halves):
    """Clamp the chunk-interleave factor to what the tile supports: chunks
    must be whole int8 sublane tiles (32 rows) for the tap-slice alignment
    story to be unchanged."""
    if halves > 1 and tile % halves == 0 and (tile // halves) % 32 == 0:
        return halves
    return 1


def _taps_i8(x, wq_a, n_taps, dilation, t_tile, tap_mode, row0=0):
    """Accumulate the dilated taps ``sum_j x[row0 + j*d :][:t_tile] @ wq_a[j]``.

    ``slice`` — operand slices at the raw (sublane-unaligned for d % 32 != 0)
    offsets; Mosaic realigns the packed int8 rows before each MXU issue.

    ``accshift`` — every tap dot reads an ALIGNED slice ``x[(j*d)//32*32 :]``
    of t_tile + 32 rows and the sub-32 shift moves to the int32 accumulator
    side (``p[off : off + t_tile]``), where a 32-bit sublane rotate replaces
    the packed-int8 realignment.  Integer adds commute, so the two forms are
    bit-identical (asserted on real TPU and in tests/test_int8_serving.py).
    Costs +32/t_tile extra MXU rows per shifted tap; measured a wash vs the
    slice form at all production dilations (see ACCSHIFT_MIN_DILATION).
    """
    acc = _i8dot(x[row0:row0 + t_tile], wq_a[0])
    for j in range(1, n_taps):
        start = row0 + j * dilation
        if tap_mode == "slice" or start % 32 == 0:
            acc += _i8dot(x[start:start + t_tile], wq_a[j])
        else:
            astart = start // 32 * 32
            off = start - astart
            p = _i8dot(x[astart:astart + t_tile + 32], wq_a[j])
            acc += p[off:off + t_tile]
    return acc


def _residual_rows(x, res_offset, t_tile, tap_mode, row0=0):
    """The residual tap ``x[row0 + res_offset :][:t_tile]`` as f32 rows,
    realigned on the f32 side in accshift mode (same trick as _taps_i8 —
    the f32 convert is elementwise, so converting a superset of rows first
    and slicing after is value-identical)."""
    res_offset = res_offset + row0
    if tap_mode == "slice" or res_offset % 32 == 0:
        return x[res_offset:res_offset + t_tile].astype(jnp.float32)
    rstart = res_offset // 32 * 32
    roff = res_offset - rstart
    wide = x[rstart:rstart + t_tile + 32].astype(jnp.float32)
    return wide[roff:roff + t_tile]


def _quantize_relu(acc_i32, scale_row, shift_row):
    """relu + affine from an int32 accumulator, then *per-row dynamic*
    requantization into 0..127 int8.

    ``scale_row`` already folds the static per-channel calibration (so values
    land in "127 = calibrated max" units); the dynamic row scale then stretches
    each row to the full int8 range.  Row scales factor out of the following
    matmul's contraction, so the consumer just multiplies its accumulator rows
    by ``rowscale/127``.  Returns (int8 values, (rows, 1) f32 row maxima)."""
    real = jnp.maximum(acc_i32.astype(jnp.float32) * scale_row + shift_row, 0.0)
    rowmax = jnp.maximum(jnp.max(real, axis=1, keepdims=True), 1.0)
    q = jnp.round(real * (QMAX / rowmax)).astype(jnp.int8)
    return q, rowmax


def _chunked_block_i8(x, wq_a, a1, b1, wq_b, a2, b2, r, *, t_tile, dilation,
                      res_offset, n_taps, tap_mode, halves):
    """The common int8 residual-block body over one tile, split into
    ``halves`` independent row chunks with phase-major emission: every
    chunk's tap dots are emitted before any chunk's requantize, and every
    requantize before any second dot — giving the scheduler MXU work to
    overlap with each VPU phase (the single-chunk form is one strict
    MXU->VPU->MXU chain that idles the MXU through both epilogues; same
    trick as streaming_fused.py's ``halves``).  Per-row math is unchanged,
    so outputs are bit-identical to the single-chunk form.

    Returns the list of (t_tile/halves, C) f32 pre-clip block outputs.
    """
    th = t_tile // halves
    accs = [_taps_i8(x, wq_a, n_taps, dilation, th, tap_mode, row0=h * th)
            for h in range(halves)]
    qs = [_quantize_relu(acc, a1[0, :], b1[0, :]) for acc in accs]
    acc2s = [_i8dot(hq, wq_b[:, :]) for hq, _ in qs]
    outs = []
    for h in range(halves):
        rowmax = qs[h][1]
        y = jnp.maximum(
            acc2s[h].astype(jnp.float32) * (rowmax * (1.0 / QMAX)) * a2[0, :]
            + b2[0, :], 0.0)
        res = _residual_rows(x, res_offset, th, tap_mode, row0=h * th) * r[0, :]
        outs.append(res + y)
    return outs


def _mid_block_i8_kernel(x_hbm, wq_a, a1, b1, wq_b, a2, b2, r, out,
                         x_vmem, sems, *, t_tile, dilation, res_offset,
                         n_taps, win, tap_mode, halves):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    # Linear-index slot parity: the prefetch pipeline crosses batch-row
    # boundaries (see temporal_block.py _block_kernel).
    idx = b * n_t + t
    slot = jax.lax.rem(idx, 2)
    next_slot = jax.lax.rem(idx + 1, 2)

    def window_dma(dst_slot, row, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[row, pl.ds(tile_idx * t_tile, win)],
            x_vmem.at[dst_slot], sems.at[dst_slot])

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
    x = x_vmem[slot]

    outs = _chunked_block_i8(x, wq_a, a1, b1, wq_b, a2, b2, r,
                             t_tile=t_tile, dilation=dilation,
                             res_offset=res_offset, n_taps=n_taps,
                             tap_mode=tap_mode, halves=halves)
    th = t_tile // halves
    for h in range(halves):
        out[0, h * th:(h + 1) * th] = jnp.clip(
            jnp.round(outs[h]), 0.0, QMAX).astype(jnp.int8)


def _expand_block_i8_kernel(raw_hbm, w0, s0, b0, wq_a, a1, b1, wq_b, a2, b2,
                            r, out, raw_vmem, sems, *, t_tile, dilation,
                            res_offset, n_taps, win, tap_mode, halves):
    # The raw input arrives PRE-TAPPED by the host driver (one row already
    # holds all k0 taps), so the expand conv is exactly one bf16 matmul here.
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    # Linear-index slot parity: the prefetch pipeline crosses batch-row
    # boundaries (see temporal_block.py _block_kernel).
    idx = b * n_t + t
    slot = jax.lax.rem(idx, 2)
    next_slot = jax.lax.rem(idx + 1, 2)

    def window_dma(dst_slot, row, tile_idx):
        return pltpu.make_async_copy(
            raw_hbm.at[row, pl.ds(tile_idx * t_tile, win)],
            raw_vmem.at[dst_slot], sems.at[dst_slot])

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
    raw = raw_vmem[slot]

    eacc = jnp.dot(raw[0:win], w0[0], preferred_element_type=jnp.float32)
    eq = jnp.clip(jnp.round(jnp.maximum(
        eacc * s0[0, :] + b0[0, :], 0.0)), 0.0, QMAX).astype(jnp.int8)

    outs = _chunked_block_i8(eq, wq_a, a1, b1, wq_b, a2, b2, r,
                             t_tile=t_tile, dilation=dilation,
                             res_offset=res_offset, n_taps=n_taps,
                             tap_mode=tap_mode, halves=halves)
    th = t_tile // halves
    for h in range(halves):
        out[0, h * th:(h + 1) * th] = jnp.clip(
            jnp.round(outs[h]), 0.0, QMAX).astype(jnp.int8)


def _shrink_block_i8_kernel(x_hbm, wq_a, a1, b1, wq_b, a2, b2, r, ws, bs, out,
                            x_vmem, sems, *, t_tile, dilation, res_offset,
                            n_taps, win, tap_mode, halves):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    # Linear-index slot parity: the prefetch pipeline crosses batch-row
    # boundaries (see temporal_block.py _block_kernel).
    idx = b * n_t + t
    slot = jax.lax.rem(idx, 2)
    next_slot = jax.lax.rem(idx + 1, 2)

    def window_dma(dst_slot, row, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[row, pl.ds(tile_idx * t_tile, win)],
            x_vmem.at[dst_slot], sems.at[dst_slot])

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
    x = x_vmem[slot]

    outs = _chunked_block_i8(x, wq_a, a1, b1, wq_b, a2, b2, r,
                             t_tile=t_tile, dilation=dilation,
                             res_offset=res_offset, n_taps=n_taps,
                             tap_mode=tap_mode, halves=halves)
    projs = [jnp.dot(o.astype(jnp.bfloat16), ws[:, :],
                     preferred_element_type=jnp.float32) for o in outs]
    th = t_tile // halves
    for h in range(halves):
        out[0, h * th:(h + 1) * th] = projs[h] + bs[0, :]


# ---------------------------------------------------------------------------
# Host-side drivers
# ---------------------------------------------------------------------------


def _tile_geometry(t: int, t_out: int, t_tile: int, reach: int,
                   align: int = 32):
    """The shared wrapper geometry with int8 sublane alignment (32 rows —
    the (32, 128) int8 HBM tiling; see the bf16 definition for the rules)."""
    return _tile_geometry_bf16(t, t_out, t_tile, reach, align=align)


def _rowvec(v):
    return v.reshape(1, -1).astype(jnp.float32)


# Shared scratch-tail allocation rules at the int8 (align=32) geometry —
# one definition with the bf16 module (see its docstrings for the
# garbage-tail safety argument; the per-row dynamic requant additionally
# clamps its denominator here).
_alloc_rows = functools.partial(_alloc_rows_base, geometry=_tile_geometry)


def _mid_block_i8(xq, valid, blk, *, dilation, causal_shift, t_tile,
                  interpret, next_reach=None, tap_mode="slice",
                  next_slack=0, halves=1):
    """One mid int8 block over ``xq[:, :valid]`` (rows past ``valid`` are the
    producer's scratch tail).  Returns (stream, valid_out)."""
    n_taps = blk["wq_a"].shape[0]
    b, t_phys, c = xq.shape
    t = valid
    t_tile_param = t_tile
    res_offset = (n_taps - 1) * dilation // 2 + causal_shift
    t_out = t - (n_taps - 1) * dilation
    t_tile, n_tiles, t_padded_out, win, _ = _tile_geometry(
        t, t_out, t_tile, (n_taps - 1) * dilation)
    win += _stage_slack(tap_mode)
    t_needed = (n_tiles - 1) * t_tile + win
    if t_phys < t_needed:
        xq = jnp.pad(xq, ((0, 0), (0, t_needed - t_phys), (0, 0)))
    alloc = _alloc_rows(t_padded_out, t_tile, t_out, t_tile_param, next_reach,
                        next_slack=next_slack)

    kernel = functools.partial(
        _mid_block_i8_kernel, t_tile=t_tile, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, win=win, tap_mode=tap_mode,
        halves=_halves_for(t_tile, halves))
    vec = lambda: pl.BlockSpec((1, c), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, alloc, c), jnp.int8),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_padded_out * c * c * (n_taps + 1),
            bytes_accessed=b * (t_padded_out + t) * c * 2,
            transcendentals=0),
        interpret=interpret,
    )(xq, blk["wq_a"], _rowvec(blk["A1"]), _rowvec(blk["B1"]), blk["wq_b"],
      _rowvec(blk["A2"]), _rowvec(blk["B2"]), _rowvec(blk["R"]))
    return out, t_out


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("t_tile", "interpret", "accshift_min_d",
                                    "halves"))
def forward_dilated_int8(config: TemporalModelConfig, q, x, *,
                         t_tile: int = 512, interpret: bool = False,
                         accshift_min_d: int = ACCSHIFT_MIN_DILATION,
                         halves: int = 1):
    """w8a8 int8 inference over the full dilated model.

    Args:
      q: pytree from :func:`quantize_temporal_model`.
      x: (B, T, J_in, F) keypoints, T >= receptive_field.
      accshift_min_d: blocks whose dilation is >= this use the accshift tap
        form (see :func:`_taps_i8`); bit-identical either way, chosen per
        dilation for speed.  0 forces accshift everywhere, a huge value
        forces the slice form.
      halves: split each tile into this many row chunks with phase-major
        emission inside the kernels (overlaps requantize VPU epilogues with
        the next chunk's MXU dots; see :func:`_chunked_block_i8`).
        Bit-identical to halves=1.

    Returns:
      (B, T - receptive_field + 1, J_out, 3) f32 poses.
    """
    if jax.default_backend() == "cpu":
        interpret = True
    n_blocks = len(config.filter_widths) - 1
    assert n_blocks >= 2
    b, t, j_in, f = x.shape
    rf = receptive_field(config)
    if t < rf:
        raise ValueError(
            f"input has {t} frames but the model's receptive field is {rf}; "
            "pad the sequence (UnchunkedBatcher does this) before int8 serving")
    x = x.reshape(b, t, j_in * f)

    # --- expand + block 0, int8 stream out -------------------------------
    k0 = int(q["expand_w"].shape[0])
    n_taps = int(q["blocks"][0]["wq_a"].shape[0])
    dilation = config.dilations[1]
    c = q["expand_w"].shape[2]
    t_expand = t - (k0 - 1)
    # Pre-tap the (tiny) raw input in XLA: the expand conv becomes ONE
    # K=k0*C_in matmul per tile instead of k0 separate K=C_in dots each
    # MXU-padded to 128 lanes (34 -> 128 was 3.7x wasted MXU per tap).
    # The kernel therefore always sees a single-tap expand.
    if k0 > 1:
        x = jnp.concatenate([x[:, j: j + t_expand] for j in range(k0)],
                            axis=-1)
    c_in = k0 * j_in * f
    w0 = q["expand_w"].reshape(c_in, c)[None]      # one-tap form (1, kC_in, C)
    c_in_pad = -(-c_in // 128) * 128
    if c_in_pad != c_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_in_pad - c_in)))
        w0 = jnp.pad(w0, ((0, 0), (0, c_in_pad - c_in), (0, 0)))

    def _mode(d):
        return "accshift" if d >= accshift_min_d else "slice"

    res_offset = (n_taps - 1) * dilation // 2 + config.causal_shifts_dilated[1]
    t_out = t_expand - (n_taps - 1) * dilation
    t_tile0, n_tiles, t_padded_out, win, pad_amount = _tile_geometry(
        t_expand, t_out, t_tile, (n_taps - 1) * dilation)
    mode0 = _mode(dilation)
    win += _stage_slack(mode0)
    t_needed = (n_tiles - 1) * t_tile0 + win
    pad_amount = max(t_padded_out - t_out, t_needed - t_expand, pad_amount)
    if pad_amount > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_amount), (0, 0)))

    blk = q["blocks"][0]
    kernel = functools.partial(
        _expand_block_i8_kernel, t_tile=t_tile0, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, win=win, tap_mode=mode0,
        halves=_halves_for(t_tile0, halves))
    vec = lambda: pl.BlockSpec((1, c), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
    reach_next = ((int(q["blocks"][1]["wq_a"].shape[0]) - 1)
                  * config.dilations[2])
    alloc = _alloc_rows(t_padded_out, t_tile0, t_out, t_tile, reach_next,
                        next_slack=_stage_slack(_mode(config.dilations[2])))
    stream = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, alloc, c), jnp.int8),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c_in_pad, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
        ],
        out_specs=pl.BlockSpec((1, t_tile0, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, c_in_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100)),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w0, _rowvec(q["expand_scale"]),
      _rowvec(q["expand_shift"]), blk["wq_a"], _rowvec(blk["A1"]),
      _rowvec(blk["B1"]), blk["wq_b"], _rowvec(blk["A2"]),
      _rowvec(blk["B2"]), _rowvec(blk["R"]))
    valid = t_out  # rows past this are scratch tail for the next stage

    # --- middle blocks ----------------------------------------------------
    for i in range(1, n_blocks - 1):
        nxt = i + 1
        reach_next = ((int(q["blocks"][nxt]["wq_a"].shape[0]) - 1)
                      * config.dilations[nxt + 1])
        stream, valid = _mid_block_i8(
            stream, valid, q["blocks"][i], dilation=config.dilations[i + 1],
            causal_shift=config.causal_shifts_dilated[i + 1],
            t_tile=t_tile, interpret=interpret, next_reach=reach_next,
            tap_mode=_mode(config.dilations[i + 1]),
            next_slack=_stage_slack(_mode(config.dilations[nxt + 1])),
            halves=halves)

    # --- last block + shrink ----------------------------------------------
    i = n_blocks - 1
    blk = q["blocks"][i]
    dilation = config.dilations[i + 1]
    n_taps = int(blk["wq_a"].shape[0])
    bq, t_phys, c = stream.shape
    t = valid
    j3 = q["shrink_w"].shape[1]
    res_offset = ((n_taps - 1) * dilation // 2
                  + config.causal_shifts_dilated[i + 1])
    t_out = t - (n_taps - 1) * dilation
    t_tile_l, n_tiles, t_padded_out, win, _ = _tile_geometry(
        t, t_out, t_tile, (n_taps - 1) * dilation)
    mode_l = _mode(dilation)
    win += _stage_slack(mode_l)
    t_needed = (n_tiles - 1) * t_tile_l + win
    if t_phys < t_needed:
        stream = jnp.pad(stream, ((0, 0), (0, t_needed - t_phys), (0, 0)))

    kernel = functools.partial(
        _shrink_block_i8_kernel, t_tile=t_tile_l, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, win=win, tap_mode=mode_l,
        halves=_halves_for(t_tile_l, halves))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bq, t_padded_out, j3), jnp.float32),
        grid=(bq, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
            pl.BlockSpec((c, j3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j3), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile_l, j3), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100)),
        interpret=interpret,
    )(stream, blk["wq_a"], _rowvec(blk["A1"]), _rowvec(blk["B1"]),
      blk["wq_b"], _rowvec(blk["A2"]), _rowvec(blk["B2"]), _rowvec(blk["R"]),
      q["shrink_w"], _rowvec(q["shrink_b"]))
    if t_padded_out > t_out:
        out = out[:, :t_out]
    return out.reshape(out.shape[0], out.shape[1], -1, 3)
