"""Single-kernel int8 streaming step: all residual blocks + shrink fused.

The XLA per-frame engine (``streaming.stream_step_int8``) spends ~35% of its
device time outside the MXU: one fusion boundary per layer round-trips the
(B, C) activation through HBM, each ring push is a separate
dynamic-update-slice fusion, and the epilogues split across fusions
(profiled ~134 us/frame vs an ~87 us MXU floor at B=1024, C=1024, RF 243 —
tools/profile_streaming.py).  This kernel runs the whole post-expand
pipeline — every residual block, the ring-buffer reads/writes, and the
shrink projection — as ONE ``pallas_call``:

* Ring buffers stay in HBM (``pl.ANY``) and are updated IN PLACE via
  ``input_output_aliases``; the newest row is written by an async DMA that
  overlaps the block's matmuls.
* All older-tap reads start at kernel entry (they touch rows this frame
  never writes: tap lag > 0), so every block's operands are resident by the
  time its dots issue.
* Activations never leave VMEM between layers.

Math is copied operation-for-operation from ``streaming._block_step_i8``
(same int32 accumulation order, same f32 epilogue order), so outputs are
bit-identical to the XLA engine — asserted in tests/test_streaming_fused.py.

Parity anchor: the reference's causal "real-time" mode
(/root/reference/common/model.py:95) has no serving engine at all; this is
the TPU-native terminal step of BASELINE config 5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videopose3d_tpu.ops.pallas.temporal_block_int8 import QMAX, _i8dot


def _fused_blocks_kernel(idx_ref, eq, *refs, n_blocks, widths, caps, j3):
    """refs layout (after idx/eq):
    inputs:  per block: wq_a, wq_b, vecs(8,C f32: A1,B1,A2,B2,R,pad...);
             shrink_w, shrink_b; per block: ring_i (ANY).
    outputs: poses, per block: ring_out_i (ANY, aliased to ring_i).
    scratch: per block: taps (k-1, B, C) i8; stage (n_blocks-1, B, C) i8;
             read_sems (n_blocks, max_taps); write_sems (n_blocks,).
    """
    pos = 0
    blk = []
    for i in range(n_blocks):
        blk.append({"wq_a": refs[pos], "wq_b": refs[pos + 1],
                    "vecs": refs[pos + 2]})
        pos += 3
    shrink_w = refs[pos]; shrink_b = refs[pos + 1]; pos += 2
    rings_in = refs[pos:pos + n_blocks]; pos += n_blocks
    poses = refs[pos]; pos += 1
    rings_out = refs[pos:pos + n_blocks]; pos += n_blocks
    taps = refs[pos:pos + n_blocks]; pos += n_blocks
    stage = refs[pos]; pos += 1
    read_sems = refs[pos]; write_sems = refs[pos + 1]

    # Scalar-prefetched ring indices: per block [write_slot, tap_slots...].
    off = [0]
    for i in range(n_blocks):
        off.append(off[-1] + widths[i])

    def tap_dma(i, j):
        t = idx_ref[off[i] + 1 + j]
        return pltpu.make_async_copy(
            rings_in[i].at[pl.ds(t, 1)], taps[i].at[pl.ds(j, 1)],
            read_sems.at[i, j])

    # 1. Kick off every older-tap read: none of these rows is written this
    # frame (tap lag > 0), so they are all safe to fetch up front.
    for i in range(n_blocks):
        for j in range(widths[i] - 1):
            tap_dma(i, j).start()

    # 2. Push the expand stream (block 0's newest tap) straight from the
    # operand ref while block 0's dots run on it.
    w0 = idx_ref[off[0]]
    eq_push = pltpu.make_async_copy(eq, rings_out[0].at[pl.ds(w0, 1)],
                                    write_sems.at[0])
    eq_push.start()

    newest = eq[...].reshape(eq.shape[-2], eq.shape[-1])
    out_f32 = None
    for i in range(n_blocks):
        k = widths[i]
        vecs = blk[i]["vecs"]
        for j in range(k - 1):
            tap_dma(i, j).wait()
        acc = _i8dot(taps[i][0], blk[i]["wq_a"][0])
        for j in range(1, k - 1):
            acc += _i8dot(taps[i][j], blk[i]["wq_a"][j])
        acc += _i8dot(newest, blk[i]["wq_a"][k - 1])

        # _quantize_relu, inlined (same op order for bit-parity).
        real = jnp.maximum(
            acc.astype(jnp.float32) * vecs[0:1, :] + vecs[1:2, :], 0.0)
        rowmax = jnp.maximum(jnp.max(real, axis=1, keepdims=True), 1.0)
        hq = jnp.round(real * (QMAX / rowmax)).astype(jnp.int8)

        acc2 = _i8dot(hq, blk[i]["wq_b"][...])
        y = jnp.maximum(
            acc2.astype(jnp.float32) * (rowmax * (1.0 / QMAX)) * vecs[2:3, :]
            + vecs[3:4, :], 0.0)
        res = newest.astype(jnp.float32) * vecs[4:5, :]
        out = res + y
        if i < n_blocks - 1:
            newest = jnp.clip(jnp.round(out), 0.0, QMAX).astype(jnp.int8)
            # Push block i+1's newest tap; the DMA overlaps its dots.
            stage[pl.ds(i, 1)] = newest[None]
            w = idx_ref[off[i + 1]]
            pltpu.make_async_copy(
                stage.at[pl.ds(i, 1)], rings_out[i + 1].at[pl.ds(w, 1)],
                write_sems.at[i + 1]).start()
        else:
            out_f32 = out

    proj = jnp.dot(out_f32.astype(jnp.bfloat16), shrink_w[...],
                   preferred_element_type=jnp.float32)
    poses[...] = proj + shrink_b[0:1, :]

    # All in-flight ring writes must land before the kernel retires.
    for i in range(n_blocks):
        write_sems_wait = pltpu.make_async_copy(
            eq if i == 0 else stage.at[pl.ds(i - 1, 1)],
            rings_out[i].at[pl.ds(idx_ref[off[i]], 1)], write_sems.at[i])
        write_sems_wait.wait()


def _pack_vecs(blk):
    rows = [blk["A1"], blk["B1"], blk["A2"], blk["B2"], blk["R"]]
    v = jnp.stack([jnp.asarray(r, jnp.float32).reshape(-1) for r in rows])
    return jnp.pad(v, ((0, 8 - v.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("widths", "interpret"))
def fused_blocks_step(q, rings, eq, idx, *, widths, interpret=False):
    """Run every residual block + shrink on one frame in a single kernel.

    Args:
      q: serving pytree from ``quantize_temporal_model``.
      rings: list of per-block int8 ring buffers, time-major (cap_i, B, C);
        DONATED (updated in place via aliasing).
      eq: (B, C) int8 expand stream for this frame (block 0's newest tap).
      idx: (sum_i widths[i],) int32 — per block ``[write_slot,
        oldest_tap_slot, ...]`` ring indices, blocks concatenated.
      widths: static tuple of per-block filter widths.

    Returns:
      ((B, J3) f32 flat poses, [updated rings]).
    """
    if jax.default_backend() == "cpu":
        interpret = True
    n_blocks = len(widths)
    b, c = eq.shape
    j3 = q["shrink_w"].shape[1]

    inputs = [idx, eq[None]]     # (1, B, C): rank-matched to ring-row DMAs
    for i in range(n_blocks):
        blk = q["blocks"][i]
        inputs += [blk["wq_a"], blk["wq_b"], _pack_vecs(blk)]
    inputs += [q["shrink_w"].astype(jnp.bfloat16),
               jnp.pad(jnp.asarray(q["shrink_b"], jnp.float32)[None],
                       ((0, 7), (0, 0)))]
    inputs += list(rings)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([vm()]                       # eq
                + [vm()] * (3 * n_blocks)    # block weights
                + [vm(), vm()]               # shrink
                + [any_()] * n_blocks)       # rings
    out_specs = [vm()] + [any_()] * n_blocks
    out_shape = ([jax.ShapeDtypeStruct((b, j3), jnp.float32)]
                 + [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rings])
    # Ring input positions in the flattened operand list (incl. the scalar
    # prefetch operand at 0): 2 + 3*n_blocks + 2 + i ; outputs: 1 + i.
    ring_in0 = 2 + 3 * n_blocks + 2
    aliases = {ring_in0 + i: 1 + i for i in range(n_blocks)}

    max_taps = max(w - 1 for w in widths)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((w - 1, b, c), jnp.int8) for w in widths]
            + [pltpu.VMEM((n_blocks - 1, b, c), jnp.int8),
               pltpu.SemaphoreType.DMA((n_blocks, max_taps)),
               pltpu.SemaphoreType.DMA((n_blocks,))]))

    kernel = functools.partial(
        _fused_blocks_kernel, n_blocks=n_blocks, widths=tuple(widths),
        caps=tuple(r.shape[0] for r in rings), j3=j3)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 120)),
        interpret=interpret,
    )(*inputs)
    return outs[0], list(outs[1:])
