"""w8a8 int8 streaming engine tests: the per-frame int8 pipeline must track
the offline int8 causal serving path (same quantized pytree) and stay at
mm scale vs the f32 offline causal model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, forward_dilated, receptive_field)
from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
    quantize_temporal_model, forward_dilated_int8)
from videopose3d_tpu.streaming import StreamingCausalLifter


def _setup(fw=(3, 3, 3), channels=64, seed=0):
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=fw, causal=True, dropout=0.0, channels=channels)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(seed))
    rf = receptive_field(cfg)
    rng = np.random.default_rng(seed)
    calib = jnp.asarray(rng.standard_normal((2, rf + 64, 17, 2)), jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)
    return cfg, params, state, q, rng


@pytest.mark.parametrize("fw,channels", [((3, 3, 3), 64), ((3, 3, 3, 3), 32)])
def test_streaming_int8_matches_offline_int8(fw, channels):
    """Streamed int8 outputs vs the offline int8 kernels on the same
    edge-padded sequence.  Both paths quantize identically; the only drift is
    f32 rounding order at the requantization boundaries, which can flip a
    borderline int8 step — tolerance is a small fraction of the f32 output
    scale, far tighter than the int8-vs-f32 accuracy budget."""
    cfg, params, state, q, rng = _setup(fw, channels)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    n, b = 24, 3
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)

    seq = np.transpose(frames, (1, 0, 2, 3))              # (B, N, J, 2)
    padded = np.concatenate(
        [np.repeat(seq[:, :1], 2 * pad, axis=1), seq], axis=1)
    want = np.asarray(forward_dilated_int8(cfg, q, jnp.asarray(padded),
                                           interpret=True, t_tile=32))

    lifter = StreamingCausalLifter(cfg, engine="int8", quantized=q)
    lifter.reset(frames[0])
    got = np.stack([np.asarray(lifter.step(frames[t])) for t in range(n)],
                   axis=1)                                # (B, N, J, 3)

    assert got.shape == want.shape
    scale = np.sqrt((want ** 2).mean())
    err = np.abs(got - want).max()
    assert err < 0.01 * scale, (err, scale)


def test_streaming_int8_mm_scale_vs_f32():
    """End-to-end accuracy anchor: streamed int8 vs the f32 offline causal
    model (same budget as tests/test_int8_serving.py)."""
    cfg, params, state, q, rng = _setup()
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    n, b = 24, 3
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)

    seq = np.transpose(frames, (1, 0, 2, 3))
    padded = np.concatenate(
        [np.repeat(seq[:, :1], 2 * pad, axis=1), seq], axis=1)
    want, _ = forward_dilated(cfg, params, state, padded, train=False)
    want = np.asarray(want)

    lifter = StreamingCausalLifter(cfg, engine="int8", quantized=q)
    lifter.reset(frames[0])
    got = np.stack([np.asarray(lifter.step(frames[t])) for t in range(n)],
                   axis=1)

    per_joint = np.linalg.norm(got - want, axis=-1).mean()
    scale = np.sqrt((want ** 2).mean())
    assert per_joint < 0.06 * scale, (per_joint, scale)


def test_streaming_int8_state_is_bounded():
    cfg, params, state, q, _ = _setup(fw=(3, 3, 3), channels=64)
    lifter = StreamingCausalLifter(cfg, engine="int8", quantized=q)
    lifter.reset(np.zeros((2, 17, 2), np.float32))
    bufs = lifter._stream_state["bufs"]
    assert [b.shape[0] for b in bufs] == [3, 7, 19]  # time-major (cap, B, C)
    assert bufs[0].dtype == jnp.bfloat16          # raw input history
    assert all(b.dtype == jnp.int8 for b in bufs[1:])  # int8 streams


@pytest.mark.parametrize("engine", ["bf16", "int8"])
def test_streaming_mesh_sharded_matches_single(engine):
    """Streams sharded over the 8-device mesh produce the same poses as the
    unsharded path (collective-free batch parallelism)."""
    import jax
    from videopose3d_tpu.parallel import make_mesh

    assert jax.device_count() == 8
    cfg, params, state, q, rng = _setup(fw=(3, 3, 3), channels=32)
    n, b = 6, 16
    frames = rng.standard_normal((n, b, 17, 2)).astype(np.float32)

    kw = (dict(engine="int8", quantized=q) if engine == "int8"
          else dict(engine="bf16"))
    args = (cfg,) if engine == "int8" else (cfg, params, state)
    single = StreamingCausalLifter(*args, **kw)
    sharded = StreamingCausalLifter(*args, **kw, mesh=make_mesh())
    single.reset(frames[0])
    sharded.reset(frames[0])
    for t in range(n):
        a = single.step(frames[t])
        bout = sharded.step(frames[t])
        assert len(bout.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(a), np.asarray(bout),
                                   atol=2e-5)


def test_streaming_lifter_engine_validation():
    cfg, params, state, q, _ = _setup()
    with pytest.raises(ValueError, match="engine"):
        StreamingCausalLifter(cfg, params, state, engine="fp8")
    with pytest.raises(ValueError, match="quantized"):
        StreamingCausalLifter(cfg, engine="int8")
    with pytest.raises(ValueError, match="params"):
        StreamingCausalLifter(cfg, engine="bf16")


@pytest.mark.parametrize("engine", ["bf16", "int8"])
def test_streaming_mesh_sharded_multi_frame(engine):
    """The micro-batched (k frames/step) engines under mesh sharding: the
    doubled-ring pushes and block taps are stream-parallel, so sharded ==
    unsharded."""
    import jax
    from videopose3d_tpu.parallel import make_mesh

    assert jax.device_count() == 8
    cfg, params, state, q, rng = _setup(fw=(3, 3, 3), channels=32)
    k, b = 4, 16
    frames = rng.standard_normal((3, b, k, 17, 2)).astype(np.float32)

    kw = (dict(engine="int8", quantized=q) if engine == "int8"
          else dict(engine="bf16"))
    args = (cfg,) if engine == "int8" else (cfg, params, state)
    single = StreamingCausalLifter(*args, **kw, frames_per_step=k)
    sharded = StreamingCausalLifter(*args, **kw, frames_per_step=k,
                                    mesh=make_mesh())
    single.reset(frames[0, :, 0])
    sharded.reset(frames[0, :, 0])
    for t in range(frames.shape[0]):
        a = single.step(frames[t])
        bout = sharded.step(frames[t])
        assert len(bout.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(a), np.asarray(bout),
                                   atol=2e-5)
