"""Streaming causal inference: per-frame 2D->3D lifting for real-time serving.

The reference supports causal convolutions "for real-time applications"
(``/root/reference/common/model.py:95``, ``README``/``DOCUMENTATION.md``) but
only ever runs them offline over whole sequences.  This module adds the missing
serving path: a stateful incremental evaluator that consumes one frame per step
— for a *batch of independent video streams at once* — and emits the pose for
that frame with O(receptive-field) state and O(layers) compute per step,
matching the offline causal model frame-for-frame (up to float summation
order: streaming folds BatchNorm to an affine and keeps an f32 residual, so
outputs agree to last-bits rounding — golden-tested at 2e-5).

Design (TPU-first):

* Per-layer **ring buffers** hold each layer's recent causal history (raw input:
  ``filter_width`` frames; block ``i``: ``(k_i - 1) * dilation_i + 1`` frames of
  the previous layer's activations).  The whole step — buffer updates, the
  per-layer gathers, and the conv matmuls — is one jitted function with donated
  state, so serving N streams costs one XLA dispatch per frame.
* Per-frame convs collapse to ``(B, k*C) @ (k*C, C)`` matmuls over the stream
  batch: batch enough concurrent streams (>= 128) and the MXU stays busy.  The
  incremental evaluation does ~``2(L-1)+1`` matmuls per frame instead of
  recomputing the full strided tree (a ~receptive-field/filter-width-fold
  compute saving at RF 243).
* **Warm-up matches offline edge padding exactly**: the offline causal path
  left-pads the input window by replicating the first frame
  (``generators.py:106-118`` with ``causal_shift = pad``).  With a constant
  input, every layer's activation is constant over time, so ``reset()`` fills
  all ring buffers analytically with the steady-state activations of frame 0 —
  O(1), no warm-up loop — after which streamed outputs equal the offline causal
  model's outputs frame-for-frame.

BatchNorm runs in inference mode (running statistics folded to affine).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, Params, State)
from videopose3d_tpu.ops.pallas.temporal_block import fold_batchnorm as _bn_affine


def _buffer_capacities(config: TemporalModelConfig) -> List[int]:
    """Ring-buffer length per layer: raw input, then one per residual block."""
    caps = [config.filter_widths[0]]
    for i in range(1, len(config.filter_widths)):
        caps.append((config.filter_widths[i] - 1) * config.dilations[i] + 1)
    return caps


def _ring_push(buf, ptr, cap, value):
    """Write the newest frame at slot ``ptr % cap``.  Buffers are TIME-MAJOR
    ((cap, B, C)): a dynamic offset on the major axis is a contiguous slab
    DMA, where the same single-row op addressed (B, 1, C) on the
    second-minor tiled axis measured ~2.3x slower for bf16 on v5e (and the
    multi-row version of it ~260 us flat — see the micro-batched section)."""
    return jax.lax.dynamic_update_slice(
        buf, value[None, :, :], (jnp.mod(ptr, cap), 0, 0))


def _ring_push_dma_kernel(idx_ref, val, buf_in, buf_out, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    cp = pltpu.make_async_copy(val, buf_out.at[pl.ds(idx_ref[0], 1)], sem)
    cp.start()
    cp.wait()


def _ring_push_dma(buf, ptr, cap, value):
    """`_ring_push` as an in-place Pallas DMA: the ring stays in HBM
    (aliased input->output) and only the 1-row slab moves.  XLA's
    bitcast+dynamic-update-slice fusion for the same op profiled at ~23 us
    per ring at B=C=1024 bf16 (~10x the 2 MB write's HBM cost)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    idx = jnp.mod(ptr, cap).reshape(1).astype(jnp.int32)
    return pl.pallas_call(
        _ring_push_dma_kernel,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA]),
        input_output_aliases={2: 0},
        interpret=jax.default_backend() == "cpu",
    )(idx, value[None, :, :], buf)


def _ring_tap_rows(buf, ptr, cap, width, dilation):
    """The OLDER taps (lags ``(width-1-j)*dilation``, j=0..width-2) as a list
    of (B, C) rows, oldest first.  One single-frame major-axis
    ``dynamic_slice`` per tap — a dynamic-index ``take`` along the ring axis
    lowers to a gather that materializes the whole ring buffer (measured
    ~1 ms/frame at cap=163, B=1024 on v5e).  The lag-0 tap is the frame the
    caller just pushed, so it never needs a ring read — the per-frame steps
    pass the in-register activation instead and contract each tap against
    its own weight slice (``sum_j row_j @ w[j]``), skipping both one
    dynamic_slice and the (B, width*C) concat copy of the fused-operand
    form."""
    _, b, c = buf.shape
    rows = []
    for j in range(width - 1):
        lag = (width - 1 - j) * dilation
        idx = jnp.mod(ptr - lag, cap)
        rows.append(jax.lax.dynamic_slice(buf, (idx, 0, 0),
                                          (1, b, c)).reshape(b, c))
    return rows


def _check_per_frame_caps(bufs, caps):
    """Per-frame steps index rings mod the per-frame capacities; a
    micro-batched state (doubled, k-aligned buffers from init_*_multi) would
    be silently corrupted — pushes land in wrong slots with no shape error
    (the symmetric guard to _check_multi_alignment)."""
    got = tuple(b.shape[0] for b in bufs)
    if got != tuple(caps):
        raise ValueError(
            f"stream state has ring capacities {got}, expected {tuple(caps)}:"
            " this state was built for a different engine (micro-batched"
            " init_*_multi states are not interchangeable with per-frame"
            " steps)")


def _advance_ptrs(ptrs, caps):
    """Increment each layer's ring position modulo its own capacity.

    Per-layer positions (rather than one global frame counter reduced mod
    cap) keep a long-lived serving process exact forever: a shared counter
    would need to wrap at lcm(caps), which overflows int32 for deep causal
    stacks (7 temporal layers already reach lcm ~2.5e12)."""
    return jnp.mod(ptrs + 1, jnp.asarray(caps, jnp.int32))


def _stream_dtype(config: TemporalModelConfig):
    """The activation dtype streaming engines run at.  ``"mixed"`` is a
    TRAINING-only scheme (bf16 matmul operands over f32 activations,
    models/temporal.py) with no streaming meaning — fail with guidance
    instead of jnp.dtype's opaque ``TypeError: data type 'mixed'``."""
    if config.compute_dtype == "mixed":
        raise ValueError(
            "streaming engines need a concrete compute_dtype; 'mixed' is a "
            "training scheme — serve with compute_dtype='bfloat16' (same MXU "
            "operand rounding as 'mixed') or 'float32'")
    return jnp.dtype(config.compute_dtype)


@functools.partial(jax.jit, static_argnums=0)
def init_stream_state(config: TemporalModelConfig, params: Params, state: State,
                      first_frame) -> Dict[str, Any]:
    """Analytic warm-up: fill every ring buffer with the steady-state activation
    of ``first_frame`` so streaming matches the offline edge-padded causal model
    from the very first output.

    Args:
      first_frame: (B, J, F) first frame of each stream.

    Returns:
      stream state pytree {"bufs": time-major [(cap_i, B, C_i)], "ptr":
      per-layer int32 ring positions (len(caps),)}.
    """
    if not config.causal:
        raise ValueError("streaming inference requires a causal model")
    if config.dense:
        raise ValueError("streaming inference does not support dense convs")

    x = jnp.asarray(first_frame)
    assert x.ndim == 3, f"expected (B, J, F), got {x.shape}"
    b = x.shape[0]
    x = x.reshape(b, -1)
    caps = _buffer_capacities(config)
    compute_dtype = _stream_dtype(config)

    # Steady-state activations shared with the micro-batched engine's init
    # (one implementation of the warm-up algebra, see _steady_acts_bf16).
    bufs = [jnp.broadcast_to(x[None, :, :], (caps[0], b, x.shape[-1]))
            .astype(compute_dtype)]
    for cap, act in zip(caps[1:],
                        _steady_acts_bf16(config, params, state, x)):
        bufs.append(jnp.broadcast_to(
            act[None, :, :].astype(compute_dtype),
            (cap, b, act.shape[-1])))

    return {"bufs": bufs,
            "ptr": jnp.zeros(len(caps), jnp.int32)}


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3,
                   static_argnames=("_ring_impl",))
def stream_step(config: TemporalModelConfig, params: Params, state: State,
                stream_state, frame, _ring_impl="dus"):
    """Advance all streams by one frame.

    Args:
      stream_state: pytree from :func:`init_stream_state` (donated).
      frame: (B, J, F) the newest 2D keypoints of each stream.
      _ring_impl: ring-write lowering, "dus" (XLA dynamic-update-slice) or
        "dma" (in-place Pallas copy) — bit-identical, perf A/B only.

    Returns:
      ((B, J_out, 3) poses for this frame, new stream state).
    """
    push = _ring_push if _ring_impl == "dus" else _ring_push_dma
    compute_dtype = _stream_dtype(config)
    caps = _buffer_capacities(config)
    bufs = list(stream_state["bufs"])
    _check_per_frame_caps(bufs, caps)
    ptr = stream_state["ptr"]

    x = jnp.asarray(frame)
    b = x.shape[0]
    x = x.reshape(b, -1).astype(compute_dtype)

    # Raw input layer (tiny C_in: the concat form is fine here, and the
    # newest tap is ``x`` itself; stays "dus" — 34 lanes, not DMA-tileable).
    bufs[0] = _ring_push(bufs[0], ptr[0], caps[0], x)
    w0 = params["expand_conv"]["weight"]
    k0 = w0.shape[0]
    t0 = jnp.concatenate(
        _ring_tap_rows(bufs[0], ptr[0], caps[0], k0, 1) + [x], axis=-1)
    act = jnp.dot(t0, w0.reshape(k0 * w0.shape[1], -1).astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    s, t_ = _bn_affine(params["expand_bn"], state["expand_bn"])
    act = jax.nn.relu(act * s + t_)

    for i in range(len(config.filter_widths) - 1):
        cap = caps[i + 1]
        k = config.filter_widths[i + 1]
        d = config.dilations[i + 1]
        act_c = act.astype(compute_dtype)
        bufs[i + 1] = push(bufs[i + 1], ptr[i + 1], cap, act_c)

        # Per-tap dots (newest tap = the activation just pushed, read from
        # registers): same accumulation order as the offline fused kernel's
        # tap loop, no (B, k*C) concat operand.
        w1 = params["layers_conv"][2 * i]["weight"].astype(compute_dtype)
        rows = _ring_tap_rows(bufs[i + 1], ptr[i + 1], cap, k, d) + [act_c]
        h = jnp.dot(rows[0], w1[0], preferred_element_type=jnp.float32)
        for j in range(1, k):
            h += jnp.dot(rows[j], w1[j], preferred_element_type=jnp.float32)
        s1, t1 = _bn_affine(params["layers_bn"][2 * i],
                            state["layers_bn"][2 * i])
        h = jax.nn.relu(h * s1 + t1).astype(compute_dtype)

        w2 = params["layers_conv"][2 * i + 1]["weight"][0]
        z = jnp.dot(h, w2.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        s2, t2 = _bn_affine(params["layers_bn"][2 * i + 1],
                            state["layers_bn"][2 * i + 1])
        act = act + jax.nn.relu(z * s2 + t2)

    w_s = params["shrink"]["weight"][0]
    out = jnp.dot(act.astype(compute_dtype), w_s.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    out = out + params["shrink"]["bias"]
    out = out.reshape(b, config.num_joints_out, 3).astype(jnp.float32)

    new_state = {"bufs": bufs, "ptr": _advance_ptrs(ptr, caps)}
    return out, new_state


@functools.partial(jax.jit, static_argnums=0)
def prepare_bf16_fused(config: TemporalModelConfig, params: Params,
                       state: State):
    """One-time weight preparation for :func:`stream_step_bf16_fused`.

    Pallas operands must be materialized buffers (no fusing the f32->bf16
    convert into the dot's operand read like XLA does), so casting inside the
    step would copy ~25 MB of weights per frame at the flagship config.
    Build this pytree once per weight set and pass it to every step.
    """
    if _stream_dtype(config) != jnp.bfloat16:
        raise ValueError("the fused bf16 engine requires "
                         "compute_dtype='bfloat16'")
    n_blocks = len(config.filter_widths) - 1
    w0 = params["expand_conv"]["weight"]
    k0 = w0.shape[0]
    s0, t0 = _bn_affine(params["expand_bn"], state["expand_bn"])

    from videopose3d_tpu.ops.pallas.streaming_fused import pack_vec_rows

    def vecs(i):
        s1, t1 = _bn_affine(params["layers_bn"][2 * i],
                            state["layers_bn"][2 * i])
        s2, t2 = _bn_affine(params["layers_bn"][2 * i + 1],
                            state["layers_bn"][2 * i + 1])
        return pack_vec_rows([s1, t1, s2, t2])

    return {
        "expand_w": w0.reshape(k0 * w0.shape[1], -1).astype(jnp.bfloat16),
        "expand_s": s0, "expand_t": t0,
        "w1": [params["layers_conv"][2 * i]["weight"].astype(jnp.bfloat16)
               for i in range(n_blocks)],
        "w2": [params["layers_conv"][2 * i + 1]["weight"][0]
               .astype(jnp.bfloat16) for i in range(n_blocks)],
        "vecs": [vecs(i) for i in range(n_blocks)],
        "shrink_w": params["shrink"]["weight"][0].astype(jnp.bfloat16),
        "shrink_b": params["shrink"]["bias"],
    }


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
def stream_step_bf16_fused(config: TemporalModelConfig, prepared,
                           stream_state, frame):
    """Advance all streams one frame with the single-kernel bf16 pipeline.

    Same state pytree and same bit-exact outputs as :func:`stream_step` with
    ``compute_dtype="bfloat16"`` (regression-tested); every residual block,
    ring update, and the shrink projection run inside ONE ``pallas_call``
    (``ops/pallas/streaming_fused.fused_blocks_step_bf16``).

    Args:
      prepared: weights pytree from :func:`prepare_bf16_fused` (built once
        per weight set; the casts are too expensive to repeat per frame).
    """
    from videopose3d_tpu.ops.pallas.streaming_fused import (
        fused_blocks_step_bf16)

    caps = _buffer_capacities(config)
    bufs = list(stream_state["bufs"])
    _check_per_frame_caps(bufs, caps)
    ptr = stream_state["ptr"]

    x = jnp.asarray(frame)
    b = x.shape[0]
    x = x.reshape(b, -1).astype(jnp.bfloat16)

    # Raw ring + expand stay in XLA (tiny matmul, odd lane counts).
    bufs[0] = _ring_push(bufs[0], ptr[0], caps[0], x)
    k0 = config.filter_widths[0]
    t0 = jnp.concatenate(
        _ring_tap_rows(bufs[0], ptr[0], caps[0], k0, 1) + [x], axis=-1)
    a0 = jnp.dot(t0, prepared["expand_w"],
                 preferred_element_type=jnp.float32)
    a0 = jax.nn.relu(a0 * prepared["expand_s"] + prepared["expand_t"])

    widths = tuple(config.filter_widths[1:])
    idx = []
    for i, kw in enumerate(widths):
        cap = caps[i + 1]
        d = config.dilations[i + 1]
        idx.append(jnp.mod(ptr[i + 1], cap))
        idx += [jnp.mod(ptr[i + 1] - (kw - 1 - j) * d, cap)
                for j in range(kw - 1)]
    idx = jnp.stack(idx).astype(jnp.int32)

    poses_flat, new_rings = fused_blocks_step_bf16(prepared, bufs[1:], a0,
                                                   idx, widths=widths)
    poses = poses_flat.reshape(b, config.num_joints_out, 3)
    new_state = {"bufs": [bufs[0]] + new_rings,
                 "ptr": _advance_ptrs(ptr, caps)}
    return poses, new_state


# ---------------------------------------------------------------------------
# w8a8 int8 streaming (serving)
# ---------------------------------------------------------------------------
#
# Same ring-buffer design, but the per-layer activation history is stored as
# the *int8 stream* of the w8a8 serving path (ops/pallas/temporal_block_int8):
# per-channel statically-calibrated stream scales, per-row (= per-stream)
# dynamic requantization of the mid activation, residual folded as a
# per-channel f32 rescale.  The per-frame convs become int8 MXU matmuls
# (2x bf16 throughput) and the ring buffers shrink to half the HBM footprint.
# Consumes the pytree built by
# :func:`videopose3d_tpu.ops.pallas.temporal_block_int8.quantize_temporal_model`.

from videopose3d_tpu.ops.pallas.temporal_block_int8 import (  # noqa: E402
    QMAX as _QMAX, _i8dot, _quantize_relu)


def _expand_step_i8(q, raw_taps):
    """bf16 expand conv over concatenated raw taps -> int8 expand stream.

    Mirrors ``_expand_block_i8_kernel``'s pre-tapped single-matmul form
    (``temporal_block_int8.py``): one (B, k0*C_in) x (k0*C_in, C) dot.
    """
    w0 = q["expand_w"]                                    # (k0, C_in, C)
    k0, c_in, c = w0.shape
    eacc = jnp.dot(raw_taps.astype(jnp.bfloat16),
                   w0.reshape(k0 * c_in, c),
                   preferred_element_type=jnp.float32)
    real = jnp.maximum(eacc * q["expand_scale"] + q["expand_shift"], 0.0)
    return jnp.clip(jnp.round(real), 0.0, _QMAX).astype(jnp.int8)


def _block_step_i8(blk, tap_rows, newest_q, *, last):
    """One residual block on one frame: int8 tap rows -> (output, is_int8).

    Same unit algebra as ``_mid_block_i8_kernel`` / ``_shrink_block_i8_kernel``:
    ``A1/B1`` land the mid activation in "127 = calibrated max" units, the
    dynamic row scale stretches each stream's row to full int8 range and
    factors out of the second contraction, and ``R`` rescales the residual
    stream into the block-output units (real units for the last block).

    ``tap_rows`` are the (B, C) int8 taps oldest-first, newest (== the
    caller's just-pushed activation) last; contracting each against its own
    ``wq_a[j]`` is bit-identical to the fused (B, k*C) operand form (int32
    adds commute) without materializing the concat.
    """
    acc = _i8dot(tap_rows[0], blk["wq_a"][0])
    for j in range(1, len(tap_rows)):
        acc += _i8dot(tap_rows[j], blk["wq_a"][j])
    hq, rowmax = _quantize_relu(acc, blk["A1"], blk["B1"])
    acc2 = _i8dot(hq, blk["wq_b"])
    y = jnp.maximum(
        acc2.astype(jnp.float32) * (rowmax * (1.0 / _QMAX)) * blk["A2"]
        + blk["B2"], 0.0)
    res = newest_q.astype(jnp.float32) * blk["R"]
    out = res + y
    if last:
        return out                                        # f32 real units
    return jnp.clip(jnp.round(out), 0.0, _QMAX).astype(jnp.int8)


@functools.partial(jax.jit, static_argnums=0)
def init_stream_state_int8(config: TemporalModelConfig, q,
                           first_frame) -> Dict[str, Any]:
    """Analytic warm-up for the w8a8 engine.

    Runs the identical per-layer int8 step math once with every tap equal to
    the steady-state activation of ``first_frame`` (a constant input is a
    fixed point of each layer), so streamed outputs equal the offline int8
    causal path from the first frame.

    Args:
      q: pytree from ``quantize_temporal_model``.
      first_frame: (B, J, F) first frame of each stream.

    Returns:
      stream state pytree {"bufs": [raw bf16, int8 streams...], "ptr":
      per-layer int32 ring positions (len(caps),)}.
    """
    if not config.causal:
        raise ValueError("streaming inference requires a causal model")
    if config.dense:
        raise ValueError("streaming inference does not support dense convs")

    x = jnp.asarray(first_frame)
    assert x.ndim == 3, f"expected (B, J, F), got {x.shape}"
    b = x.shape[0]
    x = x.reshape(b, -1).astype(jnp.bfloat16)
    caps = _buffer_capacities(config)

    # Steady-state int8 streams shared with the micro-batched engine's init
    # (one implementation of the warm-up algebra, see _steady_acts_int8).
    bufs = [jnp.broadcast_to(x[None, :, :], (caps[0], b, x.shape[-1]))]
    for cap, act_q in zip(caps[1:], _steady_acts_int8(config, q, x)):
        bufs.append(jnp.broadcast_to(
            act_q[None, :, :], (cap, b, act_q.shape[-1])))

    return {"bufs": bufs,
            "ptr": jnp.zeros(len(caps), jnp.int32)}


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
def stream_step_int8(config: TemporalModelConfig, q, stream_state, frame):
    """Advance all streams by one frame through the w8a8 int8 pipeline.

    Args:
      q: pytree from ``quantize_temporal_model``.
      stream_state: pytree from :func:`init_stream_state_int8` (donated).
      frame: (B, J, F) newest 2D keypoints of each stream.

    Returns:
      ((B, J_out, 3) f32 poses for this frame, new stream state).
    """
    caps = _buffer_capacities(config)
    bufs = list(stream_state["bufs"])
    _check_per_frame_caps(bufs, caps)
    ptr = stream_state["ptr"]

    x = jnp.asarray(frame)
    b = x.shape[0]
    x = x.reshape(b, -1).astype(jnp.bfloat16)

    bufs[0] = _ring_push(bufs[0], ptr[0], caps[0], x)
    k0 = config.filter_widths[0]
    raw_taps = jnp.concatenate(
        _ring_tap_rows(bufs[0], ptr[0], caps[0], k0, 1) + [x], axis=-1)
    act_q = _expand_step_i8(q, raw_taps)

    n_blocks = len(config.filter_widths) - 1
    out = None
    for i in range(n_blocks):
        cap = caps[i + 1]
        k = config.filter_widths[i + 1]
        d = config.dilations[i + 1]
        bufs[i + 1] = _ring_push(bufs[i + 1], ptr[i + 1], cap, act_q)
        last = i == n_blocks - 1
        result = _block_step_i8(
            q["blocks"][i],
            _ring_tap_rows(bufs[i + 1], ptr[i + 1], cap, k, d) + [act_q],
            act_q, last=last)
        if last:
            out = result
        else:
            act_q = result

    proj = jnp.dot(out.astype(jnp.bfloat16), q["shrink_w"],
                   preferred_element_type=jnp.float32)
    proj = proj + q["shrink_b"]
    poses = proj.reshape(b, config.num_joints_out, 3).astype(jnp.float32)

    new_state = {"bufs": bufs, "ptr": _advance_ptrs(ptr, caps)}
    return poses, new_state


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
def stream_step_int8_fused(config: TemporalModelConfig, q, stream_state,
                           frame):
    """Advance all streams one frame with the single-kernel int8 pipeline.

    Same state pytree and same bit-exact outputs as :func:`stream_step_int8`
    (regression-tested); every residual block, ring update, and the shrink
    projection run inside ONE ``pallas_call``
    (``ops/pallas/streaming_fused.py``), eliminating the per-layer fusion
    boundaries and dynamic-update-slice pushes of the XLA engine.
    """
    from videopose3d_tpu.ops.pallas.streaming_fused import fused_blocks_step

    caps = _buffer_capacities(config)
    bufs = list(stream_state["bufs"])
    _check_per_frame_caps(bufs, caps)
    ptr = stream_state["ptr"]

    x = jnp.asarray(frame)
    b = x.shape[0]
    x = x.reshape(b, -1).astype(jnp.bfloat16)

    # Raw ring + expand stay in XLA (tiny matmul, odd lane counts).
    bufs[0] = _ring_push(bufs[0], ptr[0], caps[0], x)
    k0 = config.filter_widths[0]
    raw_taps = jnp.concatenate(
        _ring_tap_rows(bufs[0], ptr[0], caps[0], k0, 1) + [x], axis=-1)
    eq = _expand_step_i8(q, raw_taps)

    widths = tuple(config.filter_widths[1:])
    idx = []
    for i, kw in enumerate(widths):
        cap = caps[i + 1]
        d = config.dilations[i + 1]
        idx.append(jnp.mod(ptr[i + 1], cap))
        idx += [jnp.mod(ptr[i + 1] - (kw - 1 - j) * d, cap)
                for j in range(kw - 1)]
    idx = jnp.stack(idx).astype(jnp.int32)

    poses_flat, new_rings = fused_blocks_step(q, bufs[1:], eq, idx,
                                              widths=widths)
    poses = poses_flat.reshape(b, config.num_joints_out, 3)
    new_state = {"bufs": [bufs[0]] + new_rings,
                 "ptr": _advance_ptrs(ptr, caps)}
    return poses, new_state


# ---------------------------------------------------------------------------
# Micro-batched streaming: k frames per step
# ---------------------------------------------------------------------------
#
# The per-frame engines re-read every layer's weights each step — at 1024
# streams that weight traffic is the dominant non-MXU HBM cost, and each
# matmul is only (B, k*C).  Lifting k frames per dispatch amortizes the
# weight reads k-fold and widens every matmul to (B*k, k*C), trading k frames
# of latency for throughput (k=8 at 50 fps adds 160 ms — a knob, not a
# default).
#
# Ring layout: TIME-MAJOR doubled buffers ((2*cap, B, C), every write lands at
# ptr and ptr+cap), capacity rounded up so the pointer stays a multiple of k
# and a k-frame write never wraps.  Time-major matters enormously on TPU: a
# dynamic offset on the MAJOR axis is a contiguous slab DMA, while the same
# k-frame window addressed as (B, k, C) — a dynamic offset on the
# second-minor, tiled axis — ran at ~260 us per op REGARDLESS of size
# (measured v5e; the time-major form measured at noise level).  Activations
# therefore flow through the step frame-major as (k*B, C) rows; only the
# step's input/output transpose to the caller's (B, k, ...) layout, a ~1 MB
# copy.


def _buffer_capacities_multi(config: TemporalModelConfig,
                             frames_per_step: int) -> List[int]:
    """Ring capacity per layer for k-frame blocks: the k rows being written
    must never clobber live history (the max tap lag, original cap - 1 rows
    before the write position), so each capacity is
    ``(ceil(max_lag / k) + 1) * k`` — k-aligned, and >= max_lag + k."""
    k = frames_per_step
    return [(-(-(c - 1) // k) + 1) * k for c in _buffer_capacities(config)]


def _check_multi_alignment(config, caps, k):
    """A state built for frames_per_step=k' stepped with k frames is silent
    corruption, not an out-of-bounds error: a too-large k clobbers ring rows
    the taps still need.  Checking ``cap % k`` alone is an incomplete proxy
    (e.g. caps (12, 24) built for k=4 also divide by 6, yet 12 < 8 + 6), so
    also require every capacity to hold the max tap lag PLUS the k rows
    being written."""
    max_lags = [c - 1 for c in _buffer_capacities(config)]
    if any(cap % k or cap < lag + k for cap, lag in zip(caps, max_lags)):
        raise ValueError(
            f"stream state (caps {caps}) was built for a different "
            f"frames_per_step than the {k} frames passed; re-init with "
            f"frames_per_step={k}")


def _ring_push_block(buf, ptr, cap, block):
    """Write a (k, B, C) block of newest frames at ``ptr`` into a time-major
    doubled ring buffer (2*cap, B, C); both copies are kept in sync so any
    window of up to ``cap`` consecutive ring frames reads as one contiguous
    slab."""
    buf = jax.lax.dynamic_update_slice(buf, block, (ptr, 0, 0))
    return jax.lax.dynamic_update_slice(buf, block, (ptr + cap, 0, 0))


def _ring_tap_rows_block(buf, ptr, cap, width, dilation, k):
    """The OLDER tap slabs (lags ``(width-1-j)*dilation``, j=0..width-2) as
    frame-major (k*B, C) rows, oldest first.  The lag-0 slab is exactly the
    k-frame block the caller just pushed, so it reads from registers instead
    of the ring — see :func:`_ring_tap_rows` for the per-frame analogue and
    the per-tap-contraction rationale.  Lags below ``k`` overlap the pushed
    block; those windows still read the ring, which was updated first."""
    _, b, c = buf.shape
    rows = []
    for j in range(width - 1):
        lag = (width - 1 - j) * dilation
        start = jnp.mod(ptr - lag, cap)
        rows.append(jax.lax.dynamic_slice(
            buf, (start, 0, 0), (k, b, c)).reshape(k * b, c))
    return rows


def _steady_acts_bf16(config, params, state, x):
    """Per-layer steady-state activations under a constant input ``x``
    (B, C_in): [expand output, block 0 output, ...] — the analytic warm-up
    values (a constant input is a fixed point of every layer)."""
    compute_dtype = _stream_dtype(config)
    w0 = params["expand_conv"]["weight"]
    act = jnp.dot(x.astype(compute_dtype),
                  jnp.sum(w0, axis=0).astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    s, t = _bn_affine(params["expand_bn"], state["expand_bn"])
    act = jax.nn.relu(act * s + t)
    acts = [act]
    for i in range(len(config.filter_widths) - 2):
        w1 = params["layers_conv"][2 * i]["weight"]
        h = jnp.dot(act.astype(compute_dtype),
                    jnp.sum(w1, axis=0).astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        s1, t1 = _bn_affine(params["layers_bn"][2 * i],
                            state["layers_bn"][2 * i])
        h = jax.nn.relu(h * s1 + t1)
        w2 = params["layers_conv"][2 * i + 1]["weight"][0]
        z = jnp.dot(h.astype(compute_dtype), w2.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        s2, t2 = _bn_affine(params["layers_bn"][2 * i + 1],
                            state["layers_bn"][2 * i + 1])
        act = act + jax.nn.relu(z * s2 + t2)
        acts.append(act)
    return acts


def _steady_acts_int8(config, q, x):
    """int8 counterpart of :func:`_steady_acts_bf16` (x: (B, C_in) bf16)."""
    k0 = config.filter_widths[0]
    act_q = _expand_step_i8(q, jnp.tile(x, (1, k0)))
    acts = [act_q]
    for i in range(len(config.filter_widths) - 2):
        kw = config.filter_widths[i + 1]
        act_q = _block_step_i8(q["blocks"][i], [act_q] * kw,
                               act_q, last=False)
        acts.append(act_q)
    return acts


def _multi_init(config, frames_per_step, x_flat, acts, dtype0):
    caps = _buffer_capacities_multi(config, frames_per_step)
    b = x_flat.shape[0]
    bufs = [jnp.broadcast_to(x_flat[None, :, :].astype(dtype0),
                             (2 * caps[0], b, x_flat.shape[-1]))]
    for cap, act in zip(caps[1:], acts):
        bufs.append(jnp.broadcast_to(act[None, :, :],
                                     (2 * cap, b, act.shape[-1])))
    return {"bufs": bufs, "ptr": jnp.zeros(len(caps), jnp.int32)}


@functools.partial(jax.jit, static_argnums=(0, 4))
def init_stream_state_multi(config: TemporalModelConfig, params: Params,
                            state: State, first_frame,
                            frames_per_step: int) -> Dict[str, Any]:
    """Analytic warm-up for the micro-batched bf16 engine (k-aligned doubled
    ring buffers); semantics of :func:`init_stream_state` otherwise."""
    if not config.causal:
        raise ValueError("streaming inference requires a causal model")
    if config.dense:
        raise ValueError("streaming inference does not support dense convs")
    compute_dtype = _stream_dtype(config)
    x = jnp.asarray(first_frame)
    x = x.reshape(x.shape[0], -1)
    acts = [a.astype(compute_dtype)
            for a in _steady_acts_bf16(config, params, state, x)]
    return _multi_init(config, frames_per_step, x, acts, compute_dtype)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=3)
def stream_step_multi(config: TemporalModelConfig, params: Params,
                      state: State, stream_state, frames):
    """Advance all streams by k frames in one dispatch (bf16 engine).

    Args:
      stream_state: pytree from :func:`init_stream_state_multi` (donated);
        its buffer alignment must match ``frames.shape[1]``.
      frames: (B, k, J, F) the newest k keypoint frames of each stream.

    Returns:
      ((B, k, J_out, 3) poses, new stream state).
    """
    compute_dtype = _stream_dtype(config)
    bufs = list(stream_state["bufs"])
    ptr = stream_state["ptr"]
    caps = [buf.shape[0] // 2 for buf in bufs]

    x = jnp.asarray(frames)
    b, k = x.shape[0], x.shape[1]
    _check_multi_alignment(config, caps, k)
    # Frame-major from here on: rows are (frame, stream) pairs.
    x = jnp.swapaxes(x, 0, 1).reshape(k, b, -1).astype(compute_dtype)

    bufs[0] = _ring_push_block(bufs[0], ptr[0], caps[0], x)
    w0 = params["expand_conv"]["weight"]
    k0 = w0.shape[0]
    t0 = jnp.concatenate(
        _ring_tap_rows_block(bufs[0], ptr[0], caps[0], k0, 1, k)
        + [x.reshape(k * b, -1)], axis=-1)
    act = jnp.dot(t0, w0.reshape(k0 * w0.shape[1], -1).astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    s, t_ = _bn_affine(params["expand_bn"], state["expand_bn"])
    act = jax.nn.relu(act * s + t_)

    for i in range(len(config.filter_widths) - 1):
        cap = caps[i + 1]
        kw = config.filter_widths[i + 1]
        d = config.dilations[i + 1]
        act_c = act.astype(compute_dtype)
        bufs[i + 1] = _ring_push_block(
            bufs[i + 1], ptr[i + 1], cap, act_c.reshape(k, b, -1))
        w1 = params["layers_conv"][2 * i]["weight"].astype(compute_dtype)
        rows = _ring_tap_rows_block(
            bufs[i + 1], ptr[i + 1], cap, kw, d, k) + [act_c]
        h = jnp.dot(rows[0], w1[0], preferred_element_type=jnp.float32)
        for j in range(1, kw):
            h += jnp.dot(rows[j], w1[j], preferred_element_type=jnp.float32)
        s1, t1 = _bn_affine(params["layers_bn"][2 * i],
                            state["layers_bn"][2 * i])
        h = jax.nn.relu(h * s1 + t1).astype(compute_dtype)
        w2 = params["layers_conv"][2 * i + 1]["weight"][0]
        z = jnp.dot(h, w2.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        s2, t2 = _bn_affine(params["layers_bn"][2 * i + 1],
                            state["layers_bn"][2 * i + 1])
        act = act + jax.nn.relu(z * s2 + t2)

    w_s = params["shrink"]["weight"][0]
    out = jnp.dot(act.astype(compute_dtype), w_s.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    out = out + params["shrink"]["bias"]
    out = jnp.swapaxes(
        out.reshape(k, b, config.num_joints_out, 3), 0, 1).astype(jnp.float32)

    new_state = {"bufs": bufs,
                 "ptr": jnp.mod(ptr + k, jnp.asarray(caps, jnp.int32))}
    return out, new_state


@functools.partial(jax.jit, static_argnums=(0, 3))
def init_stream_state_int8_multi(config: TemporalModelConfig, q, first_frame,
                                 frames_per_step: int) -> Dict[str, Any]:
    """Analytic warm-up for the micro-batched w8a8 engine."""
    if not config.causal:
        raise ValueError("streaming inference requires a causal model")
    if config.dense:
        raise ValueError("streaming inference does not support dense convs")
    x = jnp.asarray(first_frame)
    x = x.reshape(x.shape[0], -1).astype(jnp.bfloat16)
    acts = _steady_acts_int8(config, q, x)
    return _multi_init(config, frames_per_step, x, acts, jnp.bfloat16)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
def stream_step_int8_multi(config: TemporalModelConfig, q, stream_state,
                           frames):
    """Advance all streams by k frames through the w8a8 pipeline in one
    dispatch.  Same per-frame algebra as :func:`stream_step_int8` (the
    dynamic row requantization is per (stream, frame) row, exactly as the
    per-frame engine computes it); outputs agree to f32 rounding (only the
    bf16 shrink matmul's accumulation tiling differs with row count).

    Args:
      frames: (B, k, J, F).

    Returns:
      ((B, k, J_out, 3) f32 poses, new stream state).
    """
    bufs = list(stream_state["bufs"])
    ptr = stream_state["ptr"]
    caps = [buf.shape[0] // 2 for buf in bufs]

    x = jnp.asarray(frames)
    b, k = x.shape[0], x.shape[1]
    _check_multi_alignment(config, caps, k)
    # Frame-major from here on: rows are (frame, stream) pairs.
    x = jnp.swapaxes(x, 0, 1).reshape(k, b, -1).astype(jnp.bfloat16)

    bufs[0] = _ring_push_block(bufs[0], ptr[0], caps[0], x)
    k0 = config.filter_widths[0]
    x_rows = x.reshape(k * b, -1)
    taps0 = jnp.concatenate(
        _ring_tap_rows_block(bufs[0], ptr[0], caps[0], k0, 1, k) + [x_rows],
        axis=-1)
    act_q = _expand_step_i8(q, taps0)

    n_blocks = len(config.filter_widths) - 1
    out = None
    for i in range(n_blocks):
        cap = caps[i + 1]
        kw = config.filter_widths[i + 1]
        d = config.dilations[i + 1]
        bufs[i + 1] = _ring_push_block(bufs[i + 1], ptr[i + 1], cap,
                                       act_q.reshape(k, b, -1))
        rows = _ring_tap_rows_block(
            bufs[i + 1], ptr[i + 1], cap, kw, d, k) + [act_q]
        last = i == n_blocks - 1
        result = _block_step_i8(q["blocks"][i], rows, act_q, last=last)
        if last:
            out = result
        else:
            act_q = result

    proj = jnp.dot(out.astype(jnp.bfloat16), q["shrink_w"],
                   preferred_element_type=jnp.float32)
    proj = proj + q["shrink_b"]
    poses = jnp.swapaxes(
        proj.reshape(k, b, config.num_joints_out, 3), 0, 1).astype(jnp.float32)

    new_state = {"bufs": bufs,
                 "ptr": jnp.mod(ptr + k, jnp.asarray(caps, jnp.int32))}
    return poses, new_state


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
def stream_step_bf16_multi_fused(config: TemporalModelConfig, prepared,
                                 stream_state, frames):
    """Advance all streams by k frames with the single-kernel bf16 pipeline.

    Same state pytree (doubled bf16 rings from
    :func:`init_stream_state_multi` at compute_dtype=bfloat16) and same math
    as :func:`stream_step_multi`; every residual block, ring slab push, and
    the shrink run inside ONE ``pallas_call``
    (``ops/pallas/streaming_fused.fused_blocks_step_bf16_multi``), so the
    (k*B, C) f32 activations never round-trip HBM between layers.

    Args:
      prepared: weights pytree from :func:`prepare_bf16_fused`.
    """
    from videopose3d_tpu.ops.pallas.streaming_fused import (
        fused_blocks_step_bf16_multi)

    bufs = list(stream_state["bufs"])
    ptr = stream_state["ptr"]
    caps = [buf.shape[0] // 2 for buf in bufs]

    x = jnp.asarray(frames)
    b, k = x.shape[0], x.shape[1]
    _check_multi_alignment(config, caps, k)
    x = jnp.swapaxes(x, 0, 1).reshape(k, b, -1).astype(jnp.bfloat16)

    # Raw ring + expand stay in XLA (odd lane counts), as in the int8 path.
    bufs[0] = _ring_push_block(bufs[0], ptr[0], caps[0], x)
    k0 = config.filter_widths[0]
    t0 = jnp.concatenate(
        _ring_tap_rows_block(bufs[0], ptr[0], caps[0], k0, 1, k)
        + [x.reshape(k * b, -1)], axis=-1)
    a0 = jnp.dot(t0, prepared["expand_w"], preferred_element_type=jnp.float32)
    a0 = jax.nn.relu(a0 * prepared["expand_s"] + prepared["expand_t"])
    a0 = a0.reshape(k, b, -1)

    widths = tuple(config.filter_widths[1:])
    dils = tuple(config.dilations[1:])
    lags = tuple(tuple((kw - 1 - j) * d for j in range(kw - 1))
                 for kw, d in zip(widths, dils))
    idx = []
    for i, kw in enumerate(widths):
        cap = caps[i + 1]
        idx.append(ptr[i + 1])           # k-aligned, never wraps mid-write
        idx += [jnp.mod(ptr[i + 1] - (kw - 1 - j) * dils[i], cap)
                for j in range(kw - 1)]
    idx = jnp.stack(idx).astype(jnp.int32)

    poses_flat, new_rings = fused_blocks_step_bf16_multi(
        prepared, bufs[1:], a0, idx, widths=widths, lags=lags,
        caps=tuple(caps[1:]), k=k)
    poses = jnp.swapaxes(
        poses_flat.reshape(k, b, config.num_joints_out, 3), 0, 1
    ).astype(jnp.float32)
    new_state = {"bufs": [bufs[0]] + new_rings,
                 "ptr": jnp.mod(ptr + k, jnp.asarray(caps, jnp.int32))}
    return poses, new_state


@functools.partial(jax.jit, static_argnums=0, donate_argnums=2,
                   static_argnames=("_experiment",))
def stream_step_int8_multi_fused(config: TemporalModelConfig, q, stream_state,
                                 frames, _experiment=None):
    """Advance all streams by k frames with the single-kernel int8 pipeline.

    Same state pytree (doubled time-major rings) and same math as
    :func:`stream_step_int8_multi`; every residual block, ring slab push, and
    the shrink run inside ONE ``pallas_call``
    (``ops/pallas/streaming_fused.py:fused_blocks_step_multi``), so the
    (k*B, C) activations never round-trip HBM between layers (~32 MB of f32
    per layer boundary at k=8/B=1024 in the XLA engine).
    """
    from videopose3d_tpu.ops.pallas.streaming_fused import (
        fused_blocks_step_multi)

    bufs = list(stream_state["bufs"])
    ptr = stream_state["ptr"]
    caps = [buf.shape[0] // 2 for buf in bufs]

    x = jnp.asarray(frames)
    b, k = x.shape[0], x.shape[1]
    _check_multi_alignment(config, caps, k)
    x = jnp.swapaxes(x, 0, 1).reshape(k, b, -1).astype(jnp.bfloat16)

    # Raw ring + expand stay in XLA (odd lane counts), as in the k=1 kernel.
    bufs[0] = _ring_push_block(bufs[0], ptr[0], caps[0], x)
    k0 = config.filter_widths[0]
    taps0 = jnp.concatenate(
        _ring_tap_rows_block(bufs[0], ptr[0], caps[0], k0, 1, k)
        + [x.reshape(k * b, -1)], axis=-1)
    eq = _expand_step_i8(q, taps0).reshape(k, b, -1)

    widths = tuple(config.filter_widths[1:])
    dils = tuple(config.dilations[1:])
    lags = tuple(tuple((kw - 1 - j) * d for j in range(kw - 1))
                 for kw, d in zip(widths, dils))
    idx = []
    for i, kw in enumerate(widths):
        cap = caps[i + 1]
        idx.append(ptr[i + 1])           # k-aligned, never wraps mid-write
        idx += [jnp.mod(ptr[i + 1] - (kw - 1 - j) * dils[i], cap)
                for j in range(kw - 1)]
    idx = jnp.stack(idx).astype(jnp.int32)

    poses_flat, new_rings = fused_blocks_step_multi(
        q, bufs[1:], eq, idx, widths=widths, lags=lags,
        caps=tuple(caps[1:]), k=k, experiment=_experiment)
    poses = jnp.swapaxes(
        poses_flat.reshape(k, b, config.num_joints_out, 3), 0, 1
    ).astype(jnp.float32)
    new_state = {"bufs": [bufs[0]] + new_rings,
                 "ptr": jnp.mod(ptr + k, jnp.asarray(caps, jnp.int32))}
    return poses, new_state


class StreamingCausalLifter:
    """Convenience wrapper: many concurrent video streams, one pose per frame.

    Example::

        lifter = StreamingCausalLifter(config, params, state)
        lifter.reset(first_frames)            # (B, J, 2)
        for frame in frames:                  # each (B, J, 2)
            poses = lifter.step(frame)        # (B, J_out, 3)

    With ``engine="int8"``, pass the w8a8 serving pytree (from
    ``quantize_temporal_model``) as ``quantized`` and the per-frame pipeline
    runs on the int8 MXU path (~2x bf16 throughput, mm-scale accuracy delta —
    see ``tests/test_int8_serving.py``).

    With ``mesh=``, streams scale out across chips: ring buffers and frames
    are sharded over the batch (stream) axis, weights replicated.  Every op in
    the step is stream-parallel, so GSPMD compiles it collective-free — N
    chips serve N x the streams at the single-chip rate.
    """

    def __init__(self, config: TemporalModelConfig, params: Params = None,
                 state: State = None, *, engine: str = "bf16", quantized=None,
                 mesh=None, frames_per_step: int = 1, device=None):
        if engine not in ("bf16", "bf16_fused", "int8", "int8_fused"):
            raise ValueError(f"unknown streaming engine {engine!r}")
        if engine in ("int8", "int8_fused") and quantized is None:
            raise ValueError(f"engine={engine!r} requires the quantized pytree")
        if engine in ("bf16", "bf16_fused") and (params is None
                                                 or state is None):
            raise ValueError(f"engine={engine!r} requires params and state")
        if frames_per_step < 1:
            raise ValueError("frames_per_step must be >= 1")
        if engine in ("bf16", "bf16_fused"):
            _stream_dtype(config)  # reject 'mixed' with guidance up front
        if (engine == "bf16_fused"
                and _stream_dtype(config) != jnp.bfloat16):
            raise ValueError("engine='bf16_fused' requires "
                             "compute_dtype='bfloat16'")
        if engine.endswith("_fused") and mesh is not None:
            # The fused pallas_call has no GSPMD partitioning rule; sharded
            # operands would be gathered and run replicated, silently doing
            # N x the work per chip instead of the documented scale-out.
            raise ValueError(f"engine={engine!r} does not support mesh=; "
                             "use the per-layer XLA engine for multi-chip "
                             "serving")
        self.config = config
        self.params = params
        self.state = state
        self.engine = engine
        self.quantized = quantized
        # > 1: micro-batched engine — step() takes (B, k, J, F) and returns
        # (B, k, J_out, 3); k frames of latency traded for amortized weight
        # reads and k-fold wider matmuls (see the multi-engine section).
        self.frames_per_step = frames_per_step
        self._stream_state = None
        self._bf16_prepared = None   # lazy prepare_bf16_fused cache
        if mesh is not None and device is not None:
            raise ValueError("mesh= and device= are mutually exclusive")
        if mesh is not None:
            from videopose3d_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding)
            self._stream_sharding = batch_sharding(mesh)
            rep = replicated_sharding(mesh)
            for attr in ("params", "state", "quantized"):
                if getattr(self, attr) is not None:
                    setattr(self, attr,
                            jax.device_put(getattr(self, attr), rep))
        elif device is not None:
            # Pin this lifter's streams to one local device: weights move
            # once; every step's inputs are committed there, so the whole
            # ring-buffer pipeline (including the fused Pallas kernels, which
            # have no GSPMD rule) stays on that chip.  Composed by
            # MultiDeviceStreamingLifter for independent-group scale-out.
            self._stream_sharding = device
            for attr in ("params", "state", "quantized"):
                if getattr(self, attr) is not None:
                    setattr(self, attr,
                            jax.device_put(getattr(self, attr), device))
        else:
            self._stream_sharding = None

    def _shard_frames(self, frames):
        if self._stream_sharding is None:
            return frames
        # Single hop: device_put uploads host data straight to the pinned
        # device (a jnp.asarray staging step would commit to the DEFAULT
        # device first and pay a second device->device copy per step).
        if not isinstance(frames, jax.Array):
            frames = np.asarray(frames)
        return jax.device_put(frames, self._stream_sharding)

    def reset(self, first_frames) -> None:
        first_frames = self._shard_frames(first_frames)
        k = self.frames_per_step
        if self.engine in ("int8", "int8_fused"):
            if k > 1:
                self._stream_state = init_stream_state_int8_multi(
                    self.config, self.quantized, first_frames, k)
            else:
                self._stream_state = init_stream_state_int8(
                    self.config, self.quantized, first_frames)
        elif k > 1:
            self._stream_state = init_stream_state_multi(
                self.config, self.params, self.state, first_frames, k)
        else:
            self._stream_state = init_stream_state(
                self.config, self.params, self.state, first_frames)

    def step(self, frame) -> jnp.ndarray:
        """One dispatch: frame is (B, J, F) — or (B, k, J, F) with
        ``frames_per_step`` k > 1, returning (B, k, J_out, 3)."""
        assert self._stream_state is not None, "call reset() first"
        frame = self._shard_frames(frame)
        k = self.frames_per_step
        if self.engine == "int8_fused":
            if k > 1:
                out, self._stream_state = stream_step_int8_multi_fused(
                    self.config, self.quantized, self._stream_state, frame)
            else:
                out, self._stream_state = stream_step_int8_fused(
                    self.config, self.quantized, self._stream_state, frame)
        elif self.engine == "bf16_fused":
            if self._bf16_prepared is None:
                self._bf16_prepared = prepare_bf16_fused(
                    self.config, self.params, self.state)
            if k > 1:
                out, self._stream_state = stream_step_bf16_multi_fused(
                    self.config, self._bf16_prepared, self._stream_state,
                    frame)
            else:
                out, self._stream_state = stream_step_bf16_fused(
                    self.config, self._bf16_prepared, self._stream_state,
                    frame)
        elif self.engine == "int8":
            if k > 1:
                out, self._stream_state = stream_step_int8_multi(
                    self.config, self.quantized, self._stream_state, frame)
            else:
                out, self._stream_state = stream_step_int8(
                    self.config, self.quantized, self._stream_state, frame)
        elif k > 1:
            out, self._stream_state = stream_step_multi(
                self.config, self.params, self.state, self._stream_state,
                frame)
        else:
            out, self._stream_state = stream_step(
                self.config, self.params, self.state, self._stream_state, frame)
        return out


class MultiDeviceStreamingLifter:
    """Scale streaming out over local devices with independent stream groups.

    The GSPMD ``mesh=`` path scales the per-layer XLA engines collective-free,
    but the single-kernel fused engines have no GSPMD partitioning rule.
    Streams are embarrassingly parallel, so this wrapper simply pins one
    :class:`StreamingCausalLifter` replica per device — contiguous stream
    groups ``[i*B/N, (i+1)*B/N)`` live on ``devices[i]`` — and dispatches
    every device's step asynchronously.  Works with EVERY engine, including
    ``int8_fused``/``bf16_fused``; N chips serve N× the streams at the
    single-chip rate with no cross-chip traffic.

    ``step`` returns the per-device outputs as a list (concatenate on host
    only if a single array is required — that fetch is the only sync point).
    """

    def __init__(self, config: TemporalModelConfig, params: Params = None,
                 state: State = None, *, engine: str = "bf16", quantized=None,
                 frames_per_step: int = 1, devices=None):
        self.devices = list(devices) if devices else list(jax.local_devices())
        self.lifters = [
            StreamingCausalLifter(config, params, state, engine=engine,
                                  quantized=quantized,
                                  frames_per_step=frames_per_step, device=d)
            for d in self.devices
        ]
        self.frames_per_step = frames_per_step
        self._groups = None

    def _bounds(self, n_streams: int):
        n = len(self.devices)
        if n_streams % n:
            raise ValueError(
                f"{n_streams} streams do not split evenly over "
                f"{n} devices")
        g = n_streams // n
        return [(i * g, (i + 1) * g) for i in range(len(self.devices))]

    def reset(self, first_frames) -> None:
        first_frames = np.asarray(first_frames)
        self._groups = self._bounds(first_frames.shape[0])
        for (lo, hi), lifter in zip(self._groups, self.lifters):
            lifter.reset(first_frames[lo:hi])

    def step(self, frames):
        """frames: (B, J, F) — or (B, k, J, F) with ``frames_per_step`` k>1.
        Returns the list of per-device (B/N, [k,] J_out, 3) outputs."""
        assert self._groups is not None, "call reset() first"
        frames = np.asarray(frames)
        return [lifter.step(frames[lo:hi])
                for (lo, hi), lifter in zip(self._groups, self.lifters)]


# ---------------------------------------------------------------------------
# Serving CLI: wild archive -> per-frame streamed poses
# ---------------------------------------------------------------------------
#
# The terminal step of the in-the-wild pipeline
# (``/root/reference/INFERENCE.md:30-79`` chains detectron -> custom 2D prep ->
# offline evaluation; the reference never ships the real-time serving step its
# causal mode exists for).  This CLI consumes the same custom-dataset archive
# as ``run.py -d custom`` plus a causal checkpoint and emits one pose per
# frame per video through the incremental engine — every video is one stream
# in a single batched state, so N videos cost one dispatch per frame.


def _load_wild_streams(data_dir: str, keypoints: str):
    """Load a custom-dataset archive and return (video names, per-video
    normalized (T, J, 2) keypoints) with the same screen normalization as the
    offline driver (runner.load_2d_detections)."""
    import os

    from videopose3d_tpu.datasets.custom import CustomDataset
    from videopose3d_tpu.ops.camera import normalize_screen_coordinates

    archive_path = os.path.join(data_dir, f"data_2d_custom_{keypoints}.npz")
    dataset = CustomDataset(archive_path)
    archive = np.load(archive_path, allow_pickle=True)
    detections = archive["positions_2d"].item()
    videos, streams = [], []
    for video in dataset.subjects():
        kps = detections[video]["custom"][0].astype(np.float32)
        cam = dataset.cameras()[video][0]
        kps[..., :2] = np.asarray(normalize_screen_coordinates(
            kps[..., :2], w=cam["res_w"], h=cam["res_h"]))
        videos.append(video)
        streams.append(kps)
    return videos, streams


def stream_archive(config: TemporalModelConfig, lifter: "StreamingCausalLifter",
                   streams) -> List[np.ndarray]:
    """Serve every video as one stream of a shared batch: videos that end
    early keep being fed their last frame (their outputs are cut to length).
    Honors the lifter's ``frames_per_step`` (micro-batched dispatches).

    Returns one (T_i, J_out, 3) array per video."""
    lengths = [s.shape[0] for s in streams]
    t_max = max(lengths)
    k = lifter.frames_per_step
    first = np.stack([s[0] for s in streams])
    lifter.reset(first)
    outputs = [[] for _ in streams]
    for t0 in range(0, t_max, k):
        block = np.stack([
            np.stack([s[min(t, n - 1)] for t in range(t0, t0 + k)])
            for s, n in zip(streams, lengths)])          # (B, k, J, F)
        poses = lifter.step(block if k > 1 else block[:, 0])
        if isinstance(poses, list):   # MultiDeviceStreamingLifter groups
            poses = np.concatenate([np.asarray(p) for p in poses], axis=0)
        else:
            poses = np.asarray(poses)
        if k == 1:
            poses = poses[:, None]
        for i, n in enumerate(lengths):
            take = min(k, n - t0)
            if take > 0:
                outputs[i].extend(poses[i, :take])
    return [np.stack(o) for o in outputs]


def main(argv=None):
    import argparse
    import os
    import time

    from videopose3d_tpu.models.convert import params_from_torch_state_dict
    from videopose3d_tpu.models.temporal import receptive_field

    ap = argparse.ArgumentParser(
        prog="python -m videopose3d_tpu.streaming",
        description="Per-frame streaming 3D lifting over a wild "
                    "(custom-dataset) archive with a causal checkpoint")
    ap.add_argument("-k", "--keypoints", required=True,
                    help="custom archive suffix (data_2d_custom_<k>.npz)")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--checkpoint", required=True,
                    help="path to a causal-model checkpoint (.bin or orbax)")
    ap.add_argument("-arc", "--architecture", default="3,3,3,3,3")
    ap.add_argument("-ch", "--channels", type=int, default=1024)
    ap.add_argument("--engine", choices=("bf16", "bf16_fused", "int8",
                                         "int8_fused"),
                    default="bf16")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="bf16-engine compute dtype (int8 ignores this)")
    ap.add_argument("--videos", default=None,
                    help="comma-separated subset of video names")
    ap.add_argument("--frames-per-step", type=int, default=1,
                    help="micro-batch k frames per dispatch (higher "
                         "throughput, k frames of added latency)")
    ap.add_argument("--calibration-clips", type=int, default=8,
                    help="int8 engines: max clips sampled for activation "
                         "calibration (evenly spaced across the archive)")
    ap.add_argument("--shard-devices", type=int, default=1,
                    help="split the stream batch into independent groups "
                         "over this many local devices (works with every "
                         "engine incl. the fused kernels; short batches are "
                         "padded with a repeated stream)")
    ap.add_argument("--output", required=True,
                    help="output .npz: one (T, J, 3) pose array per video")
    args = ap.parse_args(argv)
    if args.calibration_clips < 1:
        ap.error("--calibration-clips must be >= 1")

    if args.engine == "bf16_fused" and args.compute_dtype != "bfloat16":
        ap.error("--engine bf16_fused requires --compute-dtype bfloat16")

    videos, streams = _load_wild_streams(args.data_dir, args.keypoints)
    if args.videos:
        wanted = args.videos.split(",")
        missing = [v for v in wanted if v not in videos]
        if missing:
            raise KeyError(f"videos not in archive: {missing}")
        streams = [streams[videos.index(v)] for v in wanted]
        videos = wanted

    from videopose3d_tpu.runner import load_any_checkpoint
    checkpoint = load_any_checkpoint(args.checkpoint)
    filter_widths = tuple(int(x) for x in args.architecture.split(","))
    config = TemporalModelConfig(
        num_joints_in=streams[0].shape[-2], in_features=streams[0].shape[-1],
        num_joints_out=17, filter_widths=filter_widths, causal=True,
        channels=args.channels, compute_dtype=args.compute_dtype)
    params, state = params_from_torch_state_dict(
        config, checkpoint["model_pos"])
    rf = receptive_field(config)
    print(f"INFO: streaming {len(videos)} video(s), receptive field {rf} "
          f"frames, engine {args.engine}")

    if args.engine in ("int8", "int8_fused"):
        from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
            quantize_temporal_model)
        # Calibrate across clips (trained ReLU channels can be silent on one
        # clip and active on another — see quantize_temporal_model), but
        # BOUNDED: activation ranges need a few hundred representative
        # frames, not a full f32 forward over a million-frame archive, and
        # separate clips (not one concat) avoid receptive-field windows that
        # straddle unrelated videos.
        max_clips, max_len = args.calibration_clips, rf + 256
        if len(streams) <= max_clips:
            picked = streams
        elif max_clips == 1:
            picked = [streams[0]]
        else:
            picked = [streams[i * (len(streams) - 1) // (max_clips - 1)]
                      for i in range(max_clips)]
        print(f"INFO: int8 calibration on {len(picked)} of {len(streams)} "
              f"clip(s) (--calibration-clips {max_clips}), up to "
              f"{max_len} frames each")
        t_cal = max(rf, min(max_len, max(s.shape[0] for s in picked)))
        clips = []
        for s in picked:
            s = s[:t_cal]
            if s.shape[0] < t_cal:  # short clip: edge-replicate the tail
                s = np.concatenate(
                    [s, np.repeat(s[-1:], t_cal - s.shape[0], axis=0)])
            clips.append(s)
        q = quantize_temporal_model(config, params, state,
                                    jnp.asarray(np.stack(clips)))
        lifter_kwargs = dict(engine=args.engine, quantized=q,
                             frames_per_step=args.frames_per_step)
        lifter_args = (config,)
    else:
        lifter_kwargs = dict(engine=args.engine,
                             frames_per_step=args.frames_per_step)
        lifter_args = (config, params, state)

    if args.shard_devices > 1:
        devices = jax.local_devices()
        if args.shard_devices > len(devices):
            ap.error(f"--shard-devices {args.shard_devices} > "
                     f"{len(devices)} local devices")
        devices = devices[:args.shard_devices]
        # Independent stream groups must split evenly: pad the batch by
        # repeating the last stream (extra outputs are dropped below).
        n_pad = (-len(streams)) % len(devices)
        streams = streams + [streams[-1]] * n_pad
        print(f"INFO: sharding {len(streams)} streams "
              f"({n_pad} padding) over {len(devices)} local devices")
        lifter = MultiDeviceStreamingLifter(*lifter_args, devices=devices,
                                            **lifter_kwargs)
    else:
        lifter = StreamingCausalLifter(*lifter_args, **lifter_kwargs)

    t0 = time.perf_counter()
    all_outputs = stream_archive(config, lifter, streams)
    elapsed = time.perf_counter() - t0
    outputs = all_outputs[:len(videos)]
    n_frames = sum(o.shape[0] for o in outputs)
    n_computed = sum(o.shape[0] for o in all_outputs)
    pad_note = ("" if n_computed == n_frames else
                f"; wall time includes {n_computed - n_frames} "
                f"computed padding frames from --shard-devices")
    print(f"INFO: streamed {n_frames} frames in {elapsed:.2f} s "
          f"({n_frames / max(elapsed, 1e-9):.0f} poses/s end-to-end"
          f"{pad_note})")

    out_dir = os.path.dirname(os.path.abspath(args.output))
    os.makedirs(out_dir, exist_ok=True)
    np.savez(args.output, **dict(zip(videos, outputs)))
    print("Saved streamed poses to", args.output)


if __name__ == "__main__":
    main()
