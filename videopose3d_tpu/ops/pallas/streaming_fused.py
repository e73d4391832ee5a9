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

Measured (v5e, B=1024, C=1024, RF 243, interleaved same-process A/B —
tools/exp_stream_ab.py, 5 reps): int8 XLA engine 0.1346-0.1444 ms/frame
(mean 0.1396) vs this kernel 0.1334-0.1471 (mean 0.1405) — STATISTICAL
PARITY.  The kernel's wins (no per-layer HBM round-trips, in-place DMA ring
pushes) are exactly offset by what XLA's per-layer fusions already achieve;
sequential non-interleaved benches swung ±10% across processes and briefly
read as a 2% win (and a 30% win vs one outlier XLA leg) — only the
interleaved reps settled it.  Form notes: the single-chain kernel body
measured 0.143 (the strict MXU->VPU->MXU dependency chain idles the MXU
through every requantize epilogue); halves=2 chunk interleaving recovered
~10 us; halves=4 regressed (0.141) — 512-row dots are the sweet spot
between overlap granularity and MXU efficiency.  Kernel-internal time ~113
us/frame vs a ~92 us dot floor; the remaining XLA-side ~16 us is the raw
ring push + expand step + the eq HBM round-trip into the kernel.  The bf16
variant is consistently ~15% SLOWER than its XLA engine (0.236-0.250 vs
0.202-0.208): bf16 dots leave less epilogue time to hide and the kernel
forgoes XLA's residual-add fusion.  Both fused engines therefore ship as
non-default alternatives; the XLA engines remain the defaults.

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


def _unpack_refs(refs, n_blocks, a_key, b_key):
    """Shared ref layout for both fused kernels (after the idx/activation
    operands): per block [a, b, vecs(8, C)]; shrink_w, shrink_b; rings (ANY);
    poses out; rings out (aliased); taps scratch per block; stage scratch;
    read/write DMA semaphores."""
    pos = 0
    blk = []
    for i in range(n_blocks):
        blk.append({a_key: refs[pos], b_key: refs[pos + 1],
                    "vecs": refs[pos + 2]})
        pos += 3
    shrink_w = refs[pos]; shrink_b = refs[pos + 1]; pos += 2
    rings_in = refs[pos:pos + n_blocks]; pos += n_blocks
    poses = refs[pos]; pos += 1
    rings_out = refs[pos:pos + n_blocks]; pos += n_blocks
    taps = refs[pos:pos + n_blocks]; pos += n_blocks
    stage = refs[pos]; pos += 1
    read_sems = refs[pos]; write_sems = refs[pos + 1]
    return (blk, shrink_w, shrink_b, rings_in, poses, rings_out, taps,
            stage, read_sems, write_sems)


def _start_tap_reads(idx_ref, widths, rings_in, taps, read_sems):
    """Kick off every older-tap ring read up front — none of those rows is
    written this frame (tap lag > 0), so they are all safe to fetch at kernel
    entry.  Returns (off, tap_dma): the per-block scalar-prefetch offsets
    (idx layout per block: [write_slot, tap_slots...]) and the DMA factory
    (reconstructable for the waits)."""
    off = [0]
    for w in widths:
        off.append(off[-1] + w)

    def tap_dma(i, j):
        t = idx_ref[off[i] + 1 + j]
        return pltpu.make_async_copy(
            rings_in[i].at[pl.ds(t, 1)], taps[i].at[pl.ds(j, 1)],
            read_sems.at[i, j])

    for i in range(len(widths)):
        for j in range(widths[i] - 1):
            tap_dma(i, j).start()
    return off, tap_dma


def _fused_blocks_kernel(idx_ref, eq, *refs, n_blocks, widths, halves):
    """int8 fused streaming kernel; ref layout in :func:`_unpack_refs`.

    ``halves`` > 1 splits the batch into independent row chunks and emits
    each block's work chunk-interleaved, so one chunk's VPU epilogue
    (requantize / rowmax) has another chunk's MXU dots available to overlap
    with — the single-chunk form is one strict MXU->VPU->MXU dependency
    chain that leaves the MXU idle through every epilogue.  Per-row math is
    unchanged (row chunks are independent), so outputs stay bit-identical.
    """
    (blk, shrink_w, shrink_b, rings_in, poses, rings_out, taps, stage,
     read_sems, write_sems) = _unpack_refs(refs, n_blocks, "wq_a", "wq_b")
    off, tap_dma = _start_tap_reads(idx_ref, widths, rings_in, taps,
                                    read_sems)

    # Push the expand stream (block 0's newest tap) straight from the
    # operand ref while block 0's dots run on it.
    w0 = idx_ref[off[0]]
    eq_push = pltpu.make_async_copy(eq, rings_out[0].at[pl.ds(w0, 1)],
                                    write_sems.at[0])
    eq_push.start()

    b_total = eq.shape[-2]
    bh = b_total // halves
    row = lambda h: pl.ds(h * bh, bh)
    eq_full = eq[...].reshape(b_total, eq.shape[-1])
    newest = [eq_full[h * bh:(h + 1) * bh] for h in range(halves)]
    out_f32 = [None] * halves
    for i in range(n_blocks):
        k = widths[i]
        vecs = blk[i]["vecs"]
        for j in range(k - 1):
            tap_dma(i, j).wait()
        tap_rows = [taps[i][j] for j in range(k - 1)]

        # Emission is phase-major over chunks: every chunk's dots precede
        # every chunk's epilogue, giving the scheduler MXU work to overlap
        # with each VPU phase.  Math per row matches _block_step_i8 exactly.
        acc = []
        for h in range(halves):
            a = _i8dot(tap_rows[0][h * bh:(h + 1) * bh], blk[i]["wq_a"][0])
            for j in range(1, k - 1):
                a += _i8dot(tap_rows[j][h * bh:(h + 1) * bh],
                            blk[i]["wq_a"][j])
            acc.append(a + _i8dot(newest[h], blk[i]["wq_a"][k - 1]))

        # _quantize_relu, inlined (same op order for bit-parity).
        hq, rowmax = [], []
        for h in range(halves):
            real = jnp.maximum(
                acc[h].astype(jnp.float32) * vecs[0:1, :] + vecs[1:2, :], 0.0)
            rm = jnp.maximum(jnp.max(real, axis=1, keepdims=True), 1.0)
            rowmax.append(rm)
            hq.append(jnp.round(real * (QMAX / rm)).astype(jnp.int8))

        acc2 = [_i8dot(hq[h], blk[i]["wq_b"][...]) for h in range(halves)]
        for h in range(halves):
            y = jnp.maximum(
                acc2[h].astype(jnp.float32) * (rowmax[h] * (1.0 / QMAX))
                * vecs[2:3, :] + vecs[3:4, :], 0.0)
            res = newest[h].astype(jnp.float32) * vecs[4:5, :]
            out = res + y
            if i < n_blocks - 1:
                newest[h] = jnp.clip(jnp.round(out), 0.0, QMAX
                                     ).astype(jnp.int8)
                stage[pl.ds(i, 1), row(h)] = newest[h][None]
            else:
                out_f32[h] = out
        if i < n_blocks - 1:
            # Push block i+1's newest tap; the DMA overlaps its dots.
            w = idx_ref[off[i + 1]]
            pltpu.make_async_copy(
                stage.at[pl.ds(i, 1)], rings_out[i + 1].at[pl.ds(w, 1)],
                write_sems.at[i + 1]).start()

    proj = [jnp.dot(out_f32[h].astype(jnp.bfloat16), shrink_w[...],
                    preferred_element_type=jnp.float32)
            for h in range(halves)]
    for h in range(halves):
        poses[row(h)] = proj[h] + shrink_b[0:1, :]

    # All in-flight ring writes must land before the kernel retires.
    for i in range(n_blocks):
        write_sems_wait = pltpu.make_async_copy(
            eq if i == 0 else stage.at[pl.ds(i - 1, 1)],
            rings_out[i].at[pl.ds(idx_ref[off[i]], 1)], write_sems.at[i])
        write_sems_wait.wait()


def pack_vec_rows(rows):
    """Stack per-channel epilogue vectors into one sublane-padded (8, C)
    f32 operand (fewer tiny VMEM operands than one ref per vector)."""
    v = jnp.stack([jnp.asarray(r, jnp.float32).reshape(-1) for r in rows])
    return jnp.pad(v, ((0, 8 - v.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("widths", "halves", "interpret"))
def fused_blocks_step(q, rings, eq, idx, *, widths, halves=2,
                      interpret=False):
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
    # Row chunks must keep int8 sublane alignment (32-row multiples).
    if b % halves or (b // halves) % 32:
        halves = 1
    j3 = q["shrink_w"].shape[1]

    inputs = [idx, eq[None]]     # (1, B, C): rank-matched to ring-row DMAs
    for i in range(n_blocks):
        blk = q["blocks"][i]
        inputs += [blk["wq_a"], blk["wq_b"],
                   pack_vec_rows([blk["A1"], blk["B1"], blk["A2"],
                                  blk["B2"], blk["R"]])]
    inputs += [q["shrink_w"].astype(jnp.bfloat16),
               jnp.pad(jnp.asarray(q["shrink_b"], jnp.float32)[None],
                       ((0, 7), (0, 0)))]
    inputs += list(rings)

    kernel = functools.partial(
        _fused_blocks_kernel, n_blocks=n_blocks, widths=tuple(widths),
        halves=halves)
    return _fused_call(kernel, inputs, rings, b, c, j3, widths,
                       scratch_dtype=jnp.int8, stage_rows=n_blocks - 1,
                       interpret=interpret)


def _fused_call(kernel, inputs, rings, b, c, j3, widths, *, scratch_dtype,
                stage_rows, interpret):
    """Shared pallas_call scaffolding for both fused streaming kernels:
    VMEM specs for the activation + weights, ANY (HBM) rings aliased
    input->output for in-place updates, per-block tap scratch, the staging
    scratch, and the DMA semaphores (ref layout: _unpack_refs)."""
    n_blocks = len(widths)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([vm()]                       # activation operand
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
            [pltpu.VMEM((w - 1, b, c), scratch_dtype) for w in widths]
            + [pltpu.VMEM((stage_rows, b, c), scratch_dtype),
               pltpu.SemaphoreType.DMA((n_blocks, max_taps)),
               pltpu.SemaphoreType.DMA((n_blocks,))]))

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


# ---------------------------------------------------------------------------
# Micro-batched fused kernel: k frames per dispatch
# ---------------------------------------------------------------------------
#
# The XLA micro-batched engine (``streaming.stream_step_int8_multi``) does the
# right dots — (k*B, C) x (C, C) — but every layer boundary round-trips the
# (k*B, C) f32 activation through HBM (~32 MB per boundary at k=8/B=1024) and
# every ring push writes the doubled buffer as two separate dus fusions.
# This kernel runs all residual blocks + shrink on the k-frame slab in ONE
# pallas_call: activations never leave VMEM, taps arrive as contiguous
# time-major slabs DMA'd from the doubled rings, pushes are in-place DMAs
# issued as soon as each block's input exists.
#
# Within-dispatch taps: for a tap lag < k (block 1 at d=3 when k >= 4), the
# first ``lag`` rows of the slab are history (DMA) and the remaining
# ``k - lag`` rows are this dispatch's own input frames, copied from VMEM —
# exactly the semantics of the XLA engine's push-then-slice on the ring.


def _fused_blocks_multi_kernel(idx_ref, eq, *refs, n_blocks, widths, lags,
                               caps, k, chunks, experiment=None):
    """int8 k-frame fused streaming kernel.

    Refs as in :func:`_unpack_refs` with multi-frame scratch shapes: ONE
    shared double-buffered tap scratch ``(2, max_taps, k, B, C)`` (per-block
    scratches would cost 64 MB of VMEM at k=8/B=1024/C=1024 — over budget;
    block i+1's slab DMAs are issued as block i's compute starts, so the
    ~20 us fetch hides under ~200 us of dots), stage ``(n_blocks-1, k, B,
    C)``, write semaphores ``(n_blocks, 2)`` (doubled-ring pushes are two
    DMAs).  ``lags``/``caps`` are static per-block tap lags and ring
    capacities.  Math per (frame, stream) row is identical to
    ``_block_step_i8``.

    Row chunking here is a 2-deep SKEWED software pipeline — chunk h's conv
    dots are emitted before chunk h-1's requantize → 1x1 → epilogue chain —
    not the k=1 kernel's phase-major form: phase-major holds every chunk's
    f32 intermediates live at once, which at k=8/B=1024 spilled 63 MB of
    registers and blew the 128 MB VMEM budget (compile-time OOM on v5e; a
    4-deep skew still spilled 48 MB).  The 2-deep skew keeps ≤2 chunks in
    flight — each VPU phase still has the next chunk's conv dots adjacent
    to overlap with — and folds the shrink projection into the last block's
    epilogue stage so no (k*B, C) f32 output slab accumulates.  The stage
    scratch is likewise double-buffered (2 rows, not one per block): block
    i waits for block i-1's ring push before reusing its row.  Chunks are
    whole frames (``fr = k // chunks``); per-row math is unchanged, so
    outputs stay bit-identical to the XLA engine in interpret mode; on
    hardware every int8 ring state is bit-equal and poses agree to 1-2 f32
    ulps (~2e-7: MXU accumulation order in the final bf16 shrink dot,
    measured over 6 steps on v5e).

    Measured (v5e, B=1024, k=8, interleaved A/B vs both int8 engines,
    5 reps): **0.1240 ms/frame** vs 0.1394-0.1407 XLA k=8 multi and
    0.1308-0.1411 per-frame — the first engine to beat the per-frame
    in-graph number: the k-frame slab amortizes weight traffic and epilogue
    setup across 8x the rows per dot, and the skew keeps the MXU fed
    through the requantize epilogues.
    """
    pos = 0
    blk = []
    for _ in range(n_blocks):
        blk.append({"wq_a": refs[pos], "wq_b": refs[pos + 1],
                    "vecs": refs[pos + 2]})
        pos += 3
    shrink_w = refs[pos]; shrink_b = refs[pos + 1]; pos += 2
    rings_in = refs[pos:pos + n_blocks]; pos += n_blocks
    poses = refs[pos]; pos += 1
    rings_out = refs[pos:pos + n_blocks]; pos += n_blocks
    taps = refs[pos]          # shared scratch (2, max_taps, k, B, C)
    stage = refs[pos + 1]     # (min(2, n_blocks-1), k, B, C) double-buffered
    read_sems = refs[pos + 2]   # (2, max_taps)
    write_sems = refs[pos + 3]  # (n_blocks, 2)
    stage_rows = stage.shape[0]

    off = [0]
    for w in widths:
        off.append(off[-1] + w)

    def tap_dma(i, j):
        t = idx_ref[off[i] + 1 + j]
        read_len = min(lags[i][j], k)   # static
        s = i % 2
        return pltpu.make_async_copy(
            rings_in[i].at[pl.ds(t, read_len)],
            taps.at[s, j, pl.ds(0, read_len)],
            read_sems.at[s, j])

    def start_block_reads(i):
        for j in range(widths[i] - 1):
            tap_dma(i, j).start()

    start_block_reads(0)

    def push_src(p):
        return eq if p == 0 else stage.at[(p - 1) % stage_rows]

    def push_copies(p):
        w = idx_ref[off[p]]
        src = push_src(p)
        return (pltpu.make_async_copy(src, rings_out[p].at[pl.ds(w, k)],
                                      write_sems.at[p, 0]),
                pltpu.make_async_copy(src,
                                      rings_out[p].at[pl.ds(w + caps[p], k)],
                                      write_sems.at[p, 1]))

    def push(p):
        """Write block p's (k, B, C) input into ring p's doubled buffer."""
        for cp in push_copies(p):
            cp.start()

    push(0)
    push_waited = set()

    b, c = eq.shape[-2], eq.shape[-1]
    rh = (k * b) // chunks
    fr = k // chunks                     # frames per row chunk
    newest = [eq[pl.ds(h * fr, fr)].reshape(rh, c) for h in range(chunks)]
    for i in range(n_blocks):
        kw = widths[i]
        s = i % 2
        vecs = blk[i]["vecs"]
        last = i == n_blocks - 1
        if not last and i >= stage_rows:
            # Block i reuses stage row i % stage_rows; block i-stage_rows'
            # push out of that row must have landed first (issued a full
            # block of compute ago, so this wait is free in practice).
            p = i - stage_rows + 1
            for cp in push_copies(p):
                cp.wait()
            push_waited.add(p)
        for j in range(kw - 1):
            tap_dma(i, j).wait()
        if i + 1 < n_blocks:
            # Next block's slabs land in the other scratch slot while this
            # block computes.
            start_block_reads(i + 1)
        for j in range(kw - 1):
            lag = lags[i][j]
            if lag < k:
                # Within-dispatch frames of this tap come from the block's
                # own input (frames 0..k-lag-1), already in VMEM.
                need = k - lag
                pieces = [newest[h].reshape(fr, b, c)
                          for h in range(-(-need // fr))]
                cur = (jnp.concatenate(pieces, axis=0)
                       if len(pieces) > 1 else pieces[0])
                taps[s, j, pl.ds(lag, need)] = cur[:need]

        # Skewed pipeline stages; math per row exactly as _block_step_i8.
        acc = [None] * chunks
        hq = [None] * chunks
        rowmax = [None] * chunks
        acc2 = [None] * chunks

        def s_conv(h):
            a = _i8dot(taps[s, 0, pl.ds(h * fr, fr)].reshape(rh, c),
                       blk[i]["wq_a"][0])
            for j in range(1, kw - 1):
                a += _i8dot(taps[s, j, pl.ds(h * fr, fr)].reshape(rh, c),
                            blk[i]["wq_a"][j])
            acc[h] = a + _i8dot(newest[h], blk[i]["wq_a"][kw - 1])

        def s_quant(h):
            # ``experiment`` (timing decomposition ONLY, wrong numerics —
            # see fused_blocks_step_multi): "dots_only" strips the whole VPU
            # epilogue to a cast; "static_requant" keeps relu+scale+round but
            # drops the per-row max reduce.
            if experiment == "dots_only":
                hq[h] = acc[h].astype(jnp.int8)
                acc[h] = None
                return
            real = jnp.maximum(
                acc[h].astype(jnp.float32) * vecs[0:1, :] + vecs[1:2, :], 0.0)
            if experiment == "static_requant":
                hq[h] = jnp.round(real * (QMAX / 64.0)).astype(jnp.int8)
            else:
                rm = jnp.maximum(jnp.max(real, axis=1, keepdims=True), 1.0)
                rowmax[h] = rm
                hq[h] = jnp.round(real * (QMAX / rm)).astype(jnp.int8)
            acc[h] = None

        def s_proj(h):
            acc2[h] = _i8dot(hq[h], blk[i]["wq_b"][...])
            hq[h] = None

        def s_epi(h):
            if experiment == "dots_only":
                out = acc2[h].astype(jnp.float32)
            else:
                scale = ((64.0 / QMAX) if experiment == "static_requant"
                         else rowmax[h] * (1.0 / QMAX))
                y = jnp.maximum(
                    acc2[h].astype(jnp.float32) * scale
                    * vecs[2:3, :] + vecs[3:4, :], 0.0)
                res = newest[h].astype(jnp.float32) * vecs[4:5, :]
                out = res + y
            acc2[h] = None
            rowmax[h] = None
            if not last:
                newest[h] = (out.astype(jnp.int8)
                             if experiment == "dots_only" else
                             jnp.clip(jnp.round(out), 0.0, QMAX
                                      ).astype(jnp.int8))
                stage[i % stage_rows, pl.ds(h * fr, fr)] = (
                    newest[h].reshape(fr, b, c))
            else:
                prj = jnp.dot(out.astype(jnp.bfloat16), shrink_w[...],
                              preferred_element_type=jnp.float32)
                poses[pl.ds(h * rh, rh)] = prj + shrink_b[0:1, :]

        # 2-deep skew: chunk t's conv dots are emitted ahead of chunk t-1's
        # VPU-heavy tail, giving every epilogue phase adjacent MXU work
        # while keeping only two chunks of f32 intermediates live.
        for t in range(chunks + 1):
            if t < chunks:
                s_conv(t)
            if t >= 1:
                s_quant(t - 1)
                s_proj(t - 1)
                s_epi(t - 1)
        if i < n_blocks - 1:
            push(i + 1)

    # All in-flight ring writes must land before the kernel retires.
    for p in range(n_blocks):
        if p not in push_waited:
            for cp in push_copies(p):
                cp.wait()


@functools.partial(jax.jit, static_argnames=("widths", "lags", "caps", "k",
                                             "chunks", "interpret",
                                             "experiment"))
def fused_blocks_step_multi(q, rings, eq, idx, *, widths, lags, caps, k,
                            chunks=None, interpret=False, experiment=None):
    """Run every residual block + shrink on a k-frame slab in one kernel.

    Args:
      q: serving pytree from ``quantize_temporal_model``.
      rings: per-block int8 DOUBLED time-major ring buffers (2*cap_i, B, C)
        from ``init_stream_state_int8_multi``; DONATED (aliased in place).
      eq: (k, B, C) int8 expand stream for this dispatch's frames.
      idx: (sum_i widths[i],) int32 per block ``[write_slot, tap_starts...]``.
      widths / lags / caps: static per-block filter widths, tap lags
        ((kw-1-j) * dilation), and single-copy ring capacities.
      k: frames per dispatch (ring capacities are k-aligned so the k-row
        write window never wraps).
      chunks: row chunks for the in-kernel software pipeline (whole frames
        per chunk; must divide k with 32-row-aligned chunks).  Default: one
        frame per chunk.  Bit-identical across values.
      experiment: timing-decomposition variants with WRONG numerics, for
        floor analysis only (tools/exp_stream_floor.py) — never reachable
        from the engines: "static_requant" drops the per-row max reduce,
        "dots_only" strips the VPU epilogues to casts (same dataflow/DMAs).

    Returns:
      ((k*B, J3) f32 flat poses frame-major, [updated rings]).
    """
    if jax.default_backend() == "cpu":
        interpret = True
    n_blocks = len(widths)
    kk, b, c = eq.shape
    assert kk == k
    if chunks is None:
        chunks = k
    while chunks > 1 and (k % chunks or ((k * b) // chunks) % 32):
        chunks -= 1
    j3 = q["shrink_w"].shape[1]

    inputs = [idx, eq]
    for i in range(n_blocks):
        blk = q["blocks"][i]
        inputs += [blk["wq_a"], blk["wq_b"],
                   pack_vec_rows([blk["A1"], blk["B1"], blk["A2"],
                                  blk["B2"], blk["R"]])]
    inputs += [q["shrink_w"].astype(jnp.bfloat16),
               jnp.pad(jnp.asarray(q["shrink_b"], jnp.float32)[None],
                       ((0, 7), (0, 0)))]
    inputs += list(rings)

    kernel = functools.partial(
        _fused_blocks_multi_kernel, n_blocks=n_blocks, widths=tuple(widths),
        lags=tuple(lags), caps=tuple(caps), k=k, chunks=chunks,
        experiment=experiment)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([vm()] + [vm()] * (3 * n_blocks) + [vm(), vm()]
                + [any_()] * n_blocks)
    out_specs = [vm()] + [any_()] * n_blocks
    out_shape = ([jax.ShapeDtypeStruct((k * b, j3), jnp.float32)]
                 + [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rings])
    ring_in0 = 2 + 3 * n_blocks + 2
    aliases = {ring_in0 + i: 1 + i for i in range(n_blocks)}
    max_taps = max(w - 1 for w in widths)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((2, max_taps, k, b, c), jnp.int8),
             pltpu.VMEM((max(1, min(2, n_blocks - 1)), k, b, c), jnp.int8),
             pltpu.SemaphoreType.DMA((2, max_taps)),
             pltpu.SemaphoreType.DMA((n_blocks, 2))]))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 127)),
        interpret=interpret,
    )(*inputs)
    return outs[0], list(outs[1:])


def _fused_blocks_bf16_multi_kernel(idx_ref, a0, *refs, n_blocks, widths,
                                    lags, caps, k, chunks):
    """bf16 k-frame fused streaming kernel (skew-pipelined like the int8
    multi kernel; math per (frame, stream) row identical to
    ``streaming.stream_step_multi`` at compute_dtype=bfloat16).

    Differences from the int8 multi kernel: the inter-block carry is the f32
    residual stream ``act`` (all chunks stay live across blocks — at
    k=4/B=1024 that is 16 MB of VMEM, which is why the flagship bf16 slab is
    k=4 where int8 runs k=8); rings store the bf16 cast of each block's
    input, so EVERY push (block 0 included) goes through the bf16 ``stage``
    scratch (the f32 ``a0`` operand cannot be DMA'd into a bf16 ring).
    vecs rows are [s1, t1, s2, t2] from ``prepare_bf16_fused``.
    """
    pos = 0
    blk = []
    for _ in range(n_blocks):
        blk.append({"w1": refs[pos], "w2": refs[pos + 1],
                    "vecs": refs[pos + 2]})
        pos += 3
    shrink_w = refs[pos]; shrink_b = refs[pos + 1]; pos += 2
    rings_in = refs[pos:pos + n_blocks]; pos += n_blocks
    poses = refs[pos]; pos += 1
    rings_out = refs[pos:pos + n_blocks]; pos += n_blocks
    taps = refs[pos]          # shared scratch (2, max_taps, k, B, C) bf16
    stage = refs[pos + 1]     # (min(2, n_blocks), k, B, C) bf16
    read_sems = refs[pos + 2]
    write_sems = refs[pos + 3]
    stage_rows = stage.shape[0]

    off = [0]
    for w in widths:
        off.append(off[-1] + w)

    def tap_dma(i, j):
        t = idx_ref[off[i] + 1 + j]
        read_len = min(lags[i][j], k)   # static
        s = i % 2
        return pltpu.make_async_copy(
            rings_in[i].at[pl.ds(t, read_len)],
            taps.at[s, j, pl.ds(0, read_len)],
            read_sems.at[s, j])

    def start_block_reads(i):
        for j in range(widths[i] - 1):
            tap_dma(i, j).start()

    start_block_reads(0)

    def push_copies(p):
        w = idx_ref[off[p]]
        src = stage.at[p % stage_rows]
        return (pltpu.make_async_copy(src, rings_out[p].at[pl.ds(w, k)],
                                      write_sems.at[p, 0]),
                pltpu.make_async_copy(src,
                                      rings_out[p].at[pl.ds(w + caps[p], k)],
                                      write_sems.at[p, 1]))

    def push(p):
        for cp in push_copies(p):
            cp.start()

    b, c = a0.shape[-2], a0.shape[-1]
    rh = (k * b) // chunks
    fr = k // chunks                     # frames per row chunk
    # Block 0's input: f32 residual carry + bf16 cast staged for the push.
    act = [a0[pl.ds(h * fr, fr)].reshape(rh, c) for h in range(chunks)]
    newest = [None] * chunks
    for h in range(chunks):
        newest[h] = act[h].astype(jnp.bfloat16)
        stage[0, pl.ds(h * fr, fr)] = newest[h].reshape(fr, b, c)
    push(0)
    push_waited = set()

    for i in range(n_blocks):
        kw = widths[i]
        s = i % 2
        vecs = blk[i]["vecs"]
        last = i == n_blocks - 1
        if not last and (i + 1) >= stage_rows:
            # Block i writes stage row (i+1) % stage_rows in its epilogues;
            # the previous push out of that row must have landed first.
            p = i + 1 - stage_rows
            for cp in push_copies(p):
                cp.wait()
            push_waited.add(p)
        for j in range(kw - 1):
            tap_dma(i, j).wait()
        if i + 1 < n_blocks:
            start_block_reads(i + 1)
        for j in range(kw - 1):
            lag = lags[i][j]
            if lag < k:
                need = k - lag
                pieces = [newest[h].reshape(fr, b, c)
                          for h in range(-(-need // fr))]
                cur = (jnp.concatenate(pieces, axis=0)
                       if len(pieces) > 1 else pieces[0])
                taps[s, j, pl.ds(lag, need)] = cur[:need]

        # Skewed pipeline stages; per-row math as stream_step_multi.
        acc = [None] * chunks
        mid = [None] * chunks
        acc2 = [None] * chunks

        def s_conv(h):
            a = jnp.dot(taps[s, 0, pl.ds(h * fr, fr)].reshape(rh, c),
                        blk[i]["w1"][0], preferred_element_type=jnp.float32)
            for j in range(1, kw - 1):
                a += jnp.dot(taps[s, j, pl.ds(h * fr, fr)].reshape(rh, c),
                             blk[i]["w1"][j],
                             preferred_element_type=jnp.float32)
            acc[h] = a + jnp.dot(newest[h], blk[i]["w1"][kw - 1],
                                 preferred_element_type=jnp.float32)

        def s_mid(h):
            mid[h] = jnp.maximum(
                acc[h] * vecs[0:1, :] + vecs[1:2, :], 0.0
            ).astype(jnp.bfloat16)
            acc[h] = None

        def s_proj(h):
            acc2[h] = jnp.dot(mid[h], blk[i]["w2"][...],
                              preferred_element_type=jnp.float32)
            mid[h] = None

        def s_epi(h):
            act[h] = act[h] + jnp.maximum(
                acc2[h] * vecs[2:3, :] + vecs[3:4, :], 0.0)
            acc2[h] = None
            if not last:
                newest[h] = act[h].astype(jnp.bfloat16)
                stage[(i + 1) % stage_rows, pl.ds(h * fr, fr)] = (
                    newest[h].reshape(fr, b, c))
            else:
                prj = jnp.dot(act[h].astype(jnp.bfloat16), shrink_w[...],
                              preferred_element_type=jnp.float32)
                poses[pl.ds(h * rh, rh)] = prj + shrink_b[0:1, :]

        for t in range(chunks + 1):
            if t < chunks:
                s_conv(t)
            if t >= 1:
                s_mid(t - 1)
                s_proj(t - 1)
                s_epi(t - 1)
        if i < n_blocks - 1:
            push(i + 1)

    for p in range(n_blocks):
        if p not in push_waited:
            for cp in push_copies(p):
                cp.wait()


@functools.partial(jax.jit, static_argnames=("widths", "lags", "caps", "k",
                                             "chunks", "interpret"))
def fused_blocks_step_bf16_multi(prepared, rings, a0, idx, *, widths, lags,
                                 caps, k, chunks=None, interpret=False):
    """bf16 counterpart of :func:`fused_blocks_step_multi`.

    Args:
      prepared: weights pytree from ``streaming.prepare_bf16_fused``.
      rings: per-block bf16 DOUBLED time-major ring buffers (2*cap_i, B, C);
        DONATED (aliased in place).
      a0: (k, B, C) f32 expand activations for this dispatch's frames.
      idx / widths / lags / caps / k / chunks: as in
        :func:`fused_blocks_step_multi`.

    Returns:
      ((k*B, J3) f32 flat poses frame-major, [updated rings]).
    """
    if jax.default_backend() == "cpu":
        interpret = True
    n_blocks = len(widths)
    kk, b, c = a0.shape
    assert kk == k
    if chunks is None:
        chunks = k
    while chunks > 1 and (k % chunks or ((k * b) // chunks) % 16):
        chunks -= 1
    j3 = prepared["shrink_w"].shape[1]

    inputs = [idx, a0.astype(jnp.float32)]
    for i in range(n_blocks):
        inputs += [jnp.asarray(prepared["w1"][i], jnp.bfloat16),
                   jnp.asarray(prepared["w2"][i], jnp.bfloat16),
                   prepared["vecs"][i]]
    inputs += [jnp.asarray(prepared["shrink_w"], jnp.bfloat16),
               jnp.pad(jnp.asarray(prepared["shrink_b"], jnp.float32)[None],
                       ((0, 7), (0, 0)))]
    inputs += list(rings)

    kernel = functools.partial(
        _fused_blocks_bf16_multi_kernel, n_blocks=n_blocks,
        widths=tuple(widths), lags=tuple(lags), caps=tuple(caps), k=k,
        chunks=chunks)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)
    in_specs = ([vm()] + [vm()] * (3 * n_blocks) + [vm(), vm()]
                + [any_()] * n_blocks)
    out_specs = [vm()] + [any_()] * n_blocks
    out_shape = ([jax.ShapeDtypeStruct((k * b, j3), jnp.float32)]
                 + [jax.ShapeDtypeStruct(r.shape, r.dtype) for r in rings])
    ring_in0 = 2 + 3 * n_blocks + 2
    aliases = {ring_in0 + i: 1 + i for i in range(n_blocks)}
    max_taps = max(w - 1 for w in widths)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((2, max_taps, k, b, c), jnp.bfloat16),
             pltpu.VMEM((max(1, min(2, n_blocks)), k, b, c), jnp.bfloat16),
             pltpu.SemaphoreType.DMA((2, max_taps)),
             pltpu.SemaphoreType.DMA((n_blocks, 2))]))

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 127)),
        interpret=interpret,
    )(*inputs)
    return outs[0], list(outs[1:])


def _fused_blocks_bf16_kernel(idx_ref, a0, *refs, n_blocks, widths, halves):
    """bf16 variant of :func:`_fused_blocks_kernel`.

    Differences: the activation carried between blocks is the f32 residual
    stream (``act = act + relu(z*s2 + t2)``, matching
    ``streaming.stream_step``'s epilogue exactly); rings store its bf16 cast,
    so EVERY ring push goes through the bf16 ``stage`` scratch (block 0's
    newest tap ``a0`` arrives as f32).  vecs rows are [s1, t1, s2, t2] from
    ``fold_batchnorm``.
    """
    (blk, shrink_w, shrink_b, rings_in, poses, rings_out, taps, stage,
     read_sems, write_sems) = _unpack_refs(refs, n_blocks, "w1", "w2")
    off, tap_dma = _start_tap_reads(idx_ref, widths, rings_in, taps,
                                    read_sems)

    b_total = a0.shape[-2]
    bh = b_total // halves
    row = lambda h: pl.ds(h * bh, bh)
    a0_full = a0[...].reshape(b_total, a0.shape[-1])
    act = [a0_full[h * bh:(h + 1) * bh] for h in range(halves)]

    def push(i, values):
        """Stage the bf16 cast of this block's input and DMA it to ring i."""
        cast = [v.astype(jnp.bfloat16) for v in values]
        for h in range(halves):
            stage[pl.ds(i, 1), row(h)] = cast[h][None]
        w = idx_ref[off[i]]
        pltpu.make_async_copy(stage.at[pl.ds(i, 1)],
                              rings_out[i].at[pl.ds(w, 1)],
                              write_sems.at[i]).start()
        return cast

    newest = push(0, act)
    for i in range(n_blocks):
        k = widths[i]
        vecs = blk[i]["vecs"]
        for j in range(k - 1):
            tap_dma(i, j).wait()
        tap_rows = [taps[i][j] for j in range(k - 1)]

        # Phase-major over chunks, as in the int8 kernel; per-row math
        # matches streaming.stream_step exactly (per-tap f32-accumulated
        # dots, f32 residual carried between blocks).
        acc = []
        for h in range(halves):
            a = jnp.dot(tap_rows[0][h * bh:(h + 1) * bh], blk[i]["w1"][0],
                        preferred_element_type=jnp.float32)
            for j in range(1, k - 1):
                a += jnp.dot(tap_rows[j][h * bh:(h + 1) * bh],
                             blk[i]["w1"][j],
                             preferred_element_type=jnp.float32)
            acc.append(a + jnp.dot(newest[h], blk[i]["w1"][k - 1],
                                   preferred_element_type=jnp.float32))

        mid = [jnp.maximum(acc[h] * vecs[0:1, :] + vecs[1:2, :], 0.0
                           ).astype(jnp.bfloat16) for h in range(halves)]
        acc2 = [jnp.dot(mid[h], blk[i]["w2"][...],
                        preferred_element_type=jnp.float32)
                for h in range(halves)]
        for h in range(halves):
            act[h] = act[h] + jnp.maximum(
                acc2[h] * vecs[2:3, :] + vecs[3:4, :], 0.0)
        if i < n_blocks - 1:
            newest = push(i + 1, act)

    proj = [jnp.dot(act[h].astype(jnp.bfloat16), shrink_w[...],
                    preferred_element_type=jnp.float32)
            for h in range(halves)]
    for h in range(halves):
        poses[row(h)] = proj[h] + shrink_b[0:1, :]

    for i in range(n_blocks):
        pltpu.make_async_copy(
            stage.at[pl.ds(i, 1)],
            rings_out[i].at[pl.ds(idx_ref[off[i]], 1)],
            write_sems.at[i]).wait()


@functools.partial(jax.jit, static_argnames=("widths", "halves", "interpret"))
def fused_blocks_step_bf16(weights, rings, a0, idx, *, widths, halves=2,
                           interpret=False):
    """bf16 counterpart of :func:`fused_blocks_step`.

    Args:
      weights: dict with per-block lists ``w1`` ((k, C, C) arrays), ``w2``
        ((C, C)), ``vecs`` ((8, C) f32 rows [s1, t1, s2, t2] from
        ``fold_batchnorm``), plus ``shrink_w`` (C, J3) and ``shrink_b``
        (J3,) — built ONCE per weight set by
        ``streaming.prepare_bf16_fused`` (casting per step would copy
        ~25 MB of weights per frame: pallas operands are materialized
        buffers, the convert cannot fuse into the dot's operand read).
      rings: per-block bf16 ring buffers, time-major (cap_i, B, C); DONATED.
      a0: (B, C) f32 expand activation for this frame.
      idx: as in :func:`fused_blocks_step`.

    Returns:
      ((B, J3) f32 flat poses, [updated rings]).
    """
    if jax.default_backend() == "cpu":
        interpret = True
    n_blocks = len(widths)
    b, c = a0.shape
    if b % halves or (b // halves) % 32:
        halves = 1
    j3 = weights["shrink_w"].shape[1]

    inputs = [idx, a0[None].astype(jnp.float32)]
    for i in range(n_blocks):
        inputs += [jnp.asarray(weights["w1"][i], jnp.bfloat16),
                   jnp.asarray(weights["w2"][i], jnp.bfloat16),
                   weights["vecs"][i]]
    inputs += [jnp.asarray(weights["shrink_w"], jnp.bfloat16),
               jnp.pad(jnp.asarray(weights["shrink_b"], jnp.float32)[None],
                       ((0, 7), (0, 0)))]
    inputs += list(rings)

    kernel = functools.partial(
        _fused_blocks_bf16_kernel, n_blocks=n_blocks, widths=tuple(widths),
        halves=halves)
    return _fused_call(kernel, inputs, rings, b, c, j3, widths,
                       scratch_dtype=jnp.bfloat16, stage_rows=n_blocks,
                       interpret=interpret)
