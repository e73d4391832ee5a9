"""Bit-parity of the single-kernel fused int8 streaming step.

``stream_step_int8_fused`` must produce bit-identical poses AND bit-identical
ring-buffer state to the per-layer XLA engine ``stream_step_int8`` at every
frame, including after the ring pointers wrap.  Runs in Pallas interpret mode
on CPU (the kernel self-selects interpret off-TPU).

Parity anchor: the reference's causal mode (/root/reference/common/model.py:95)
has no streaming engine; both engines here implement the same TPU-native
serving step, so they must agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, init_temporal_model, receptive_field)
from videopose3d_tpu import streaming
from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
    quantize_temporal_model)


def _setup(filter_widths, channels, b, seed=0):
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=filter_widths, causal=True, dropout=0.0,
        channels=channels, compute_dtype="bfloat16")
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    calib = jnp.asarray(
        rng.standard_normal((1, receptive_field(cfg) + 64, 17, 2)),
        jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
    return cfg, q, first, rng


@pytest.mark.parametrize("filter_widths,channels,b", [
    ((3, 3, 3), 64, 4),
    ((3, 3, 3, 3), 32, 2),
    ((3, 5, 5), 32, 2),
    # b=64 activates the chunk-interleaved (halves=2) kernel form.
    ((3, 3, 3), 32, 64),
])
def test_fused_step_bit_parity(filter_widths, channels, b):
    cfg, q, first, rng = _setup(filter_widths, channels, b)
    ss_ref = streaming.init_stream_state_int8(cfg, q, first)
    ss_fused = jax.tree_util.tree_map(jnp.copy, ss_ref)

    # Enough frames for every ring to wrap at least once.
    caps = streaming._buffer_capacities(cfg)
    n_frames = max(caps) + 3
    for t in range(n_frames):
        frame = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
        p_ref, ss_ref = streaming.stream_step_int8(cfg, q, ss_ref, frame)
        p_fused, ss_fused = streaming.stream_step_int8_fused(
            cfg, q, ss_fused, frame)
        np.testing.assert_array_equal(
            np.asarray(p_ref), np.asarray(p_fused),
            err_msg=f"pose mismatch at frame {t}")
        for i, (br, bf) in enumerate(zip(ss_ref["bufs"], ss_fused["bufs"])):
            np.testing.assert_array_equal(
                np.asarray(br), np.asarray(bf),
                err_msg=f"ring {i} mismatch at frame {t}")
        np.testing.assert_array_equal(
            np.asarray(ss_ref["ptr"]), np.asarray(ss_fused["ptr"]))


@pytest.mark.parametrize("filter_widths,channels,b", [
    ((3, 3, 3), 64, 4),
    ((3, 5, 5), 32, 2),
    # b=64 activates the chunk-interleaved (halves=2) kernel form.
    ((3, 3, 3), 32, 64),
])
def test_fused_bf16_step_bit_parity(filter_widths, channels, b):
    """stream_step_bf16_fused is bit-identical to the per-layer XLA bf16
    engine at every frame, including ring state after pointer wrap."""
    cfg, _, first, rng = _setup(filter_widths, channels, b)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(7))
    prepared = streaming.prepare_bf16_fused(cfg, params, state)
    ss_ref = streaming.init_stream_state(cfg, params, state, first)
    ss_fused = jax.tree_util.tree_map(jnp.copy, ss_ref)

    caps = streaming._buffer_capacities(cfg)
    n_frames = max(caps) + 3
    for t in range(n_frames):
        frame = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
        p_ref, ss_ref = streaming.stream_step(cfg, params, state, ss_ref,
                                              frame)
        p_fused, ss_fused = streaming.stream_step_bf16_fused(
            cfg, prepared, ss_fused, frame)
        np.testing.assert_array_equal(
            np.asarray(p_ref), np.asarray(p_fused),
            err_msg=f"pose mismatch at frame {t}")
        for i, (br, bf) in enumerate(zip(ss_ref["bufs"], ss_fused["bufs"])):
            np.testing.assert_array_equal(
                np.asarray(br), np.asarray(bf),
                err_msg=f"ring {i} mismatch at frame {t}")


def test_fused_bf16_requires_bf16_compute():
    import dataclasses
    cfg, _, first, _ = _setup((3, 3, 3), 32, 2)
    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="bfloat16"):
        streaming.prepare_bf16_fused(cfg, params, state)
    with pytest.raises(ValueError, match="bfloat16"):
        streaming.StreamingCausalLifter(cfg, params, state,
                                        engine="bf16_fused")


def test_fused_engines_reject_mesh():
    cfg, q, first, _ = _setup((3, 3, 3), 32, 2)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    from videopose3d_tpu.parallel import make_mesh
    mesh = make_mesh()
    with pytest.raises(ValueError, match="mesh"):
        streaming.StreamingCausalLifter(cfg, quantized=q,
                                        engine="int8_fused", mesh=mesh)
    with pytest.raises(ValueError, match="mesh"):
        streaming.StreamingCausalLifter(cfg, params, state,
                                        engine="bf16_fused", mesh=mesh)


def test_per_frame_step_rejects_multi_state():
    """A micro-batched (doubled, k-aligned) state fed to a per-frame step
    must raise, not silently corrupt the rings."""
    cfg, q, first, _ = _setup((3, 3, 3), 64, 4)
    ss_multi = streaming.init_stream_state_int8_multi(cfg, q, first, 2)
    with pytest.raises(ValueError, match="capacities"):
        streaming.stream_step_int8(cfg, q, ss_multi, first)


def test_fused_matches_offline_causal():
    """Fused engine vs the offline int8 causal kernels on an edge-padded
    sequence (same check as test_streaming_int8.py for the XLA engine)."""
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        forward_dilated_int8)
    cfg, q, first, rng = _setup((3, 3, 3), 64, 3, seed=1)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    n, b = 24, 3
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)

    seq = np.transpose(frames, (1, 0, 2, 3))              # (B, N, J, 2)
    padded = np.concatenate(
        [np.repeat(seq[:, :1], 2 * pad, axis=1), seq], axis=1)
    want = np.asarray(forward_dilated_int8(cfg, q, jnp.asarray(padded),
                                           interpret=True, t_tile=32))

    ss = streaming.init_stream_state_int8(cfg, q, jnp.asarray(frames[0]))
    got = []
    for t in range(n):
        p, ss = streaming.stream_step_int8_fused(
            cfg, q, ss, jnp.asarray(frames[t]))
        got.append(np.asarray(p))
    got = np.stack(got, axis=1)                           # (B, N, J, 3)

    assert got.shape == want.shape
    scale = np.sqrt((want ** 2).mean())
    err = np.abs(got - want).max()
    assert err < 0.01 * scale, (err, scale)


@pytest.mark.parametrize("filter_widths,channels,b,k", [
    # k=4 > d=3: block-1 taps overlap the dispatch (VMEM-fill path).
    ((3, 3, 3), 64, 8, 4),
    # k=2 <= all lags: pure ring-slab taps.
    ((3, 3, 3, 3), 32, 4, 2),
    # k*b = 256 rows with halves=2 -> 128-row chunks (chunked kernel form).
    ((3, 3, 3), 32, 64, 4),
    # k=8: two of block 1's taps (lags 3, 6) overlap the dispatch.
    ((3, 3, 3), 32, 16, 8),
])
def test_fused_multi_step_parity(filter_widths, channels, b, k):
    """The k-frame single-kernel engine must match the XLA micro-batched
    engine frame-for-frame — poses and ring state — through several ring
    wraps, including taps whose lag is shorter than the dispatch (served
    from the in-flight VMEM activations)."""
    cfg, q, first, rng = _setup(filter_widths, channels, b)
    ss_ref = streaming.init_stream_state_int8_multi(cfg, q, first, k)
    ss_fused = jax.tree_util.tree_map(jnp.copy, ss_ref)

    caps = [buf.shape[0] // 2 for buf in ss_ref["bufs"]]
    n_steps = (max(caps) + 3 * k) // k + 2
    for t in range(n_steps):
        frames = jnp.asarray(
            rng.standard_normal((b, k, 17, 2)), jnp.float32)
        p_ref, ss_ref = streaming.stream_step_int8_multi(
            cfg, q, ss_ref, frames)
        p_fused, ss_fused = streaming.stream_step_int8_multi_fused(
            cfg, q, ss_fused, frames)
        np.testing.assert_allclose(
            np.asarray(p_ref), np.asarray(p_fused), rtol=0, atol=1e-5,
            err_msg=f"pose mismatch at step {t}")
        for i, (br, bf) in enumerate(zip(ss_ref["bufs"], ss_fused["bufs"])):
            np.testing.assert_array_equal(
                np.asarray(br), np.asarray(bf),
                err_msg=f"ring {i} mismatch at step {t}")
        np.testing.assert_array_equal(
            np.asarray(ss_ref["ptr"]), np.asarray(ss_fused["ptr"]))


@pytest.mark.parametrize("chunks", [1, 2, 4])
def test_fused_multi_chunks_bit_identical(chunks):
    """The software-pipeline ``chunks`` knob must not change any bit: row
    chunks are independent and the skew only reorders instruction emission.
    Compares every chunking against the XLA multi engine through a wrap."""
    from videopose3d_tpu.ops.pallas.streaming_fused import (
        fused_blocks_step_multi)

    cfg, q, first, rng = _setup((3, 3, 3), 32, 16)
    k = 4
    ss_ref = streaming.init_stream_state_int8_multi(cfg, q, first, k)
    ss_fused = jax.tree_util.tree_map(jnp.copy, ss_ref)

    widths = tuple(cfg.filter_widths[1:])
    dils = tuple(cfg.dilations[1:])
    lags = tuple(tuple((kw - 1 - j) * d for j in range(kw - 1))
                 for kw, d in zip(widths, dils))

    def step_chunked(ss, frames):
        # stream_step_int8_multi_fused with an explicit chunks value.
        bufs = list(ss["bufs"])
        ptr = ss["ptr"]
        caps = [buf.shape[0] // 2 for buf in bufs]
        x = jnp.swapaxes(jnp.asarray(frames), 0, 1).reshape(
            k, 16, -1).astype(jnp.bfloat16)
        bufs[0] = streaming._ring_push_block(bufs[0], ptr[0], caps[0], x)
        taps0 = jnp.concatenate(
            streaming._ring_tap_rows_block(
                bufs[0], ptr[0], caps[0], cfg.filter_widths[0], 1, k)
            + [x.reshape(k * 16, -1)], axis=-1)
        eq = streaming._expand_step_i8(q, taps0).reshape(k, 16, -1)
        idx = []
        for i, kw in enumerate(widths):
            idx.append(ptr[i + 1])
            idx += [jnp.mod(ptr[i + 1] - (kw - 1 - j) * dils[i], caps[i + 1])
                    for j in range(kw - 1)]
        poses_flat, new_rings = fused_blocks_step_multi(
            q, bufs[1:], eq, jnp.stack(idx).astype(jnp.int32),
            widths=widths, lags=lags, caps=tuple(caps[1:]), k=k,
            chunks=chunks)
        poses = jnp.swapaxes(
            poses_flat.reshape(k, 16, cfg.num_joints_out, 3), 0, 1
        ).astype(jnp.float32)
        return poses, {"bufs": [bufs[0]] + new_rings,
                       "ptr": jnp.mod(ptr + k, jnp.asarray(caps, jnp.int32))}

    caps = [buf.shape[0] // 2 for buf in ss_ref["bufs"]]
    for t in range((max(caps) + 2 * k) // k + 1):
        frames = jnp.asarray(
            rng.standard_normal((16, k, 17, 2)), jnp.float32)
        p_ref, ss_ref = streaming.stream_step_int8_multi(
            cfg, q, ss_ref, frames)
        p_fused, ss_fused = step_chunked(ss_fused, frames)
        np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_fused),
                                      err_msg=f"chunks={chunks} step {t}")
        for br, bf in zip(ss_ref["bufs"], ss_fused["bufs"]):
            np.testing.assert_array_equal(np.asarray(br), np.asarray(bf))


@pytest.mark.parametrize("filter_widths,channels,b,k", [
    ((3, 3, 3), 64, 8, 4),      # k=4 > d=3: within-dispatch tap fill
    ((3, 3, 3, 3), 32, 4, 2),   # 3 blocks: stage-row reuse wait path
    ((3, 3, 3), 32, 16, 8),
])
def test_fused_bf16_multi_step_parity(filter_widths, channels, b, k):
    """The bf16 k-frame single-kernel engine must match the XLA
    micro-batched bf16 engine frame-for-frame — poses and ring state —
    through several ring wraps (interpret mode: bit-identical)."""
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=filter_widths, causal=True, dropout=0.0,
        channels=channels, compute_dtype="bfloat16")
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
    prepared = streaming.prepare_bf16_fused(cfg, params, state)

    ss_ref = streaming.init_stream_state_multi(cfg, params, state, first, k)
    ss_fused = jax.tree_util.tree_map(jnp.copy, ss_ref)

    caps = [buf.shape[0] // 2 for buf in ss_ref["bufs"]]
    n_steps = (max(caps) + 3 * k) // k + 2
    for t in range(n_steps):
        frames = jnp.asarray(
            rng.standard_normal((b, k, 17, 2)), jnp.float32)
        p_ref, ss_ref = streaming.stream_step_multi(
            cfg, params, state, ss_ref, frames)
        p_fused, ss_fused = streaming.stream_step_bf16_multi_fused(
            cfg, prepared, ss_fused, frames)
        np.testing.assert_array_equal(
            np.asarray(p_ref), np.asarray(p_fused),
            err_msg=f"pose mismatch at step {t}")
        for i, (br, bf) in enumerate(zip(ss_ref["bufs"], ss_fused["bufs"])):
            np.testing.assert_array_equal(
                np.asarray(br), np.asarray(bf),
                err_msg=f"ring {i} mismatch at step {t}")


def test_fused_bf16_multi_lifter_wiring():
    """engine='bf16_fused' + frames_per_step>1 routes through the bf16
    k-frame kernel and matches the XLA multi engine through the lifter."""
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3), causal=True, dropout=0.0,
        channels=32, compute_dtype="bfloat16")
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    first = jnp.asarray(rng.standard_normal((4, 17, 2)), jnp.float32)
    k = 2
    lifter_a = streaming.StreamingCausalLifter(
        cfg, params, state, engine="bf16_fused", frames_per_step=k)
    lifter_b = streaming.StreamingCausalLifter(
        cfg, params, state, engine="bf16", frames_per_step=k)
    lifter_a.reset(first)
    lifter_b.reset(first)
    for _ in range(4):
        frames = jnp.asarray(rng.standard_normal((4, k, 17, 2)), jnp.float32)
        pa = np.asarray(lifter_a.step(frames))
        pb = np.asarray(lifter_b.step(frames))
        np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-5)


def test_fused_multi_lifter_wiring():
    """engine='int8_fused' + frames_per_step>1 routes through the k-frame
    kernel and matches the XLA multi engine through the lifter API."""
    cfg, q, first, rng = _setup((3, 3, 3), 32, 4)
    k = 2
    lifter_a = streaming.StreamingCausalLifter(
        cfg, quantized=q, engine="int8_fused", frames_per_step=k)
    lifter_b = streaming.StreamingCausalLifter(
        cfg, quantized=q, engine="int8", frames_per_step=k)
    lifter_a.reset(first)
    lifter_b.reset(first)
    for _ in range(4):
        frames = jnp.asarray(rng.standard_normal((4, k, 17, 2)), jnp.float32)
        pa = np.asarray(lifter_a.step(frames))
        pb = np.asarray(lifter_b.step(frames))
        np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-5)
