"""Streaming causal inference tests: frame-by-frame outputs must equal the
offline causal model evaluated over the whole (edge-padded) sequence."""

import numpy as np
import jax
import pytest

from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, forward_dilated, receptive_field)
from videopose3d_tpu.streaming import StreamingCausalLifter, init_stream_state


def _cfg(fw=(3, 3), channels=32):
    return TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=fw, causal=True, dropout=0.0, channels=channels)


@pytest.mark.parametrize("fw", [(3, 3), (3, 3, 3), (5, 3)])
def test_streaming_matches_offline_causal(fw):
    cfg = _cfg(fw)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    n, b = 20, 3
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)

    # Offline causal: edge-pad (2*pad, 0) like UnchunkedBatcher with
    # causal_shift = pad, then run the dilated model over the whole sequence.
    seq = np.transpose(frames, (1, 0, 2, 3))              # (B, N, J, 2)
    padded = np.concatenate(
        [np.repeat(seq[:, :1], 2 * pad, axis=1), seq], axis=1)
    want, _ = forward_dilated(cfg, params, state, padded, train=False)
    want = np.asarray(want)                               # (B, N, J, 3)

    lifter = StreamingCausalLifter(cfg, params, state)
    lifter.reset(frames[0])
    got = np.stack([np.asarray(lifter.step(frames[t])) for t in range(n)],
                   axis=1)                                # (B, N, J, 3)

    np.testing.assert_allclose(got, want, atol=2e-5)


def test_streaming_requires_causal():
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3), causal=False, dropout=0.0, channels=16)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="causal"):
        init_stream_state(cfg, params, state, np.zeros((1, 17, 2), np.float32))


def test_streaming_state_is_bounded():
    cfg = _cfg((3, 3, 3))
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    st = init_stream_state(cfg, params, state, np.zeros((2, 17, 2), np.float32))
    # Ring buffers: raw (3 frames) + blocks ((k-1)*d+1 = 7, 19 frames);
    # time-major layout (cap, B, C).
    caps = [buf.shape[0] for buf in st["bufs"]]
    assert caps == [3, 7, 19]


@pytest.mark.parametrize("k", [2, 4, 5])
def test_multi_frame_engine_matches_per_frame(k):
    """The micro-batched bf16 engine (k frames per dispatch, doubled
    k-aligned ring buffers) reproduces the per-frame engine's outputs across
    multiple ring wraps."""
    cfg = _cfg((3, 3, 3))
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    n, b = 40, 3
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)

    single = StreamingCausalLifter(cfg, params, state)
    single.reset(frames[0])
    want = np.stack([np.asarray(single.step(frames[t])) for t in range(n)],
                    axis=1)

    multi = StreamingCausalLifter(cfg, params, state, frames_per_step=k)
    multi.reset(frames[0])
    got = []
    for t0 in range(0, n, k):
        chunk = frames[t0:t0 + k]
        pad_n = k - chunk.shape[0]
        if pad_n:  # final partial chunk: feed the last frame again
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad_n, axis=0)])
        out = np.asarray(multi.step(np.transpose(chunk, (1, 0, 2, 3))))
        got.append(out[:, :k - pad_n])
    got = np.concatenate(got, axis=1)

    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("k", [4])
def test_multi_frame_engine_matches_per_frame_int8(k):
    """int8 micro-batched engine: same integer matmuls and per-row epilogues
    as the per-frame engine — poses agree to f32 rounding (the bf16 shrink
    matmul's accumulation tiling differs between the (B,) and (B*k,) row
    shapes)."""
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        quantize_temporal_model)
    cfg = _cfg((3, 3, 3))
    rf = receptive_field(cfg)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    n, b = 24, 3
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32) * 0.4
    calib = rng.standard_normal((1, rf + 50, 17, 2)).astype(np.float32) * 0.4
    q = quantize_temporal_model(cfg, params, state, calib)

    single = StreamingCausalLifter(cfg, engine="int8", quantized=q)
    single.reset(frames[0])
    want = np.stack([np.asarray(single.step(frames[t])) for t in range(n)],
                    axis=1)

    multi = StreamingCausalLifter(cfg, engine="int8", quantized=q,
                                  frames_per_step=k)
    multi.reset(frames[0])
    got = np.concatenate(
        [np.asarray(multi.step(np.transpose(frames[t0:t0 + k], (1, 0, 2, 3))))
         for t0 in range(0, n, k)], axis=1)

    np.testing.assert_allclose(got, want, atol=1e-6)


def test_multi_frame_wrong_alignment_raises():
    cfg = _cfg((3, 3, 3))
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    from videopose3d_tpu.streaming import (init_stream_state_multi,
                                           stream_step_multi)
    rng = np.random.default_rng(4)
    first = rng.standard_normal((2, 17, 2)).astype(np.float32)
    ss = init_stream_state_multi(cfg, params, state, first, 4)
    with pytest.raises(ValueError, match="frames_per_step"):
        stream_step_multi(cfg, params, state, ss,
                          rng.standard_normal((2, 3, 17, 2)).astype(
                              np.float32))


def test_multi_frame_k_mismatch_that_divides_caps_raises():
    """Review r3: caps built for k=4 with fw=(9,3) are (12, 24) — divisible
    by 6 too, but stepping with k=6 would clobber live history; the guard
    must catch it (cap >= max_lag + k), not just cap % k."""
    from videopose3d_tpu.streaming import (init_stream_state_multi,
                                           stream_step_multi)
    cfg = _cfg((9, 3))
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    first = rng.standard_normal((2, 17, 2)).astype(np.float32)
    ss = init_stream_state_multi(cfg, params, state, first, 4)
    with pytest.raises(ValueError, match="frames_per_step"):
        stream_step_multi(cfg, params, state, ss,
                          rng.standard_normal((2, 6, 17, 2)).astype(
                              np.float32))


@pytest.mark.slow
def test_multi_device_lifter_matches_single():
    """MultiDeviceStreamingLifter: independent stream groups pinned to the 8
    virtual devices must reproduce the single-device lifter exactly (streams
    never interact), for both a plain and a fused engine."""
    from videopose3d_tpu.streaming import MultiDeviceStreamingLifter
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        quantize_temporal_model)

    cfg = _cfg((3, 3, 3), channels=32)
    rf = receptive_field(cfg)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    n, b = 6, 16   # 2 streams per virtual device
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)
    calib = rng.standard_normal((1, rf + 32, 17, 2)).astype(np.float32)
    q = quantize_temporal_model(cfg, params, state, calib)

    for engine, kwargs in (("bf16", dict(params=params, state=state)),
                           ("int8_fused", dict(quantized=q))):
        single = StreamingCausalLifter(cfg, engine=engine, **kwargs)
        single.reset(frames[0])
        multi = MultiDeviceStreamingLifter(
            cfg, engine=engine, devices=jax.local_devices(), **kwargs)
        multi.reset(frames[0])
        assert len(multi.lifters) == 8
        for t in range(n):
            want = np.asarray(single.step(frames[t]))
            parts = multi.step(frames[t])
            assert len(parts) == 8
            for i, part in enumerate(parts):
                assert list(part.devices()) == [jax.local_devices()[i]]
            got = np.concatenate([np.asarray(p) for p in parts], axis=0)
            # Not bitwise: XLA's reduction tiling differs between the B and
            # B/8 batch shapes (bf16 matmul accumulation order).
            np.testing.assert_allclose(got, want, atol=2e-5)


def test_multi_device_lifter_uneven_split_raises():
    from videopose3d_tpu.streaming import MultiDeviceStreamingLifter
    cfg = _cfg((3, 3))
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(8)
    multi = MultiDeviceStreamingLifter(cfg, params, state,
                                       devices=jax.local_devices()[:3])
    with pytest.raises(ValueError, match="split evenly"):
        multi.reset(rng.standard_normal((8, 17, 2)).astype(np.float32))


def test_mixed_compute_dtype_rejected_with_guidance():
    """'mixed' is a training-only scheme (bf16 operands over f32 activations);
    streaming engines run one concrete dtype.  The guard must raise a clear
    ValueError (jnp.dtype('mixed') used to surface an opaque TypeError)."""
    import dataclasses
    cfg = dataclasses.replace(_cfg(), compute_dtype="mixed")
    params, state = init_temporal_model(
        dataclasses.replace(cfg, compute_dtype="float32"),
        jax.random.PRNGKey(0))
    frame = np.zeros((2, 17, 2), np.float32)
    with pytest.raises(ValueError, match="mixed"):
        init_stream_state(cfg, params, state, frame)
    with pytest.raises(ValueError, match="mixed"):
        StreamingCausalLifter(cfg, params, state)
