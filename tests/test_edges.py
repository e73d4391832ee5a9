"""Edge-case coverage: pow2 eval bucketing, humaneva20 layout, streaming with
confidence-score inputs, sampler corner cases."""

import numpy as np
import jax
import pytest

from videopose3d_tpu.data import ChunkedPairSampler
from videopose3d_tpu.data.generators import UnchunkedBatcher
from videopose3d_tpu.data.prepare.layouts import LAYOUTS
from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, receptive_field, forward_dilated)
from videopose3d_tpu.streaming import StreamingCausalLifter


def test_pow2_bucketing_bounds_compilations():
    rng = np.random.default_rng(0)
    lengths = [33, 90, 200, 511, 513]
    poses_2d 	= [rng.standard_normal((l, 5, 2)).astype(np.float32)
                   for l in lengths]
    b = UnchunkedBatcher(None, None, poses_2d, pad=2, bucket=64,
                         bucket_pow2=True)
    seen = set()
    for _, _, b2, n in b.next_epoch():
        seen.add(b2.shape[1])
    # Buckets are 64*2^k (+2*pad): 64, 128, 256, 512, 1024 -> at most 5 shapes.
    # 33->64, 90->128, 200->256, 511->512, 513->1024: all power-of-two buckets.
    assert seen == {64 + 4, 128 + 4, 256 + 4, 512 + 4, 1024 + 4}


def test_humaneva20_layout():
    meta = LAYOUTS["humaneva20"]
    assert meta["num_joints"] == 20
    left, right = meta["keypoints_symmetry"]
    assert len(left) == len(right) == 8
    assert not set(left) & set(right)


def test_streaming_with_confidence_inputs():
    """Streaming works with (x, y, score) 3-feature inputs (d-pt-243 style)."""
    cfg = TemporalModelConfig(num_joints_in=17, in_features=3,
                              num_joints_out=17, filter_widths=(3, 3),
                              causal=True, dropout=0.0, channels=16)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((6, 2, 17, 3)).astype(np.float32)

    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    seq = np.transpose(frames, (1, 0, 2, 3))
    padded = np.concatenate([np.repeat(seq[:, :1], 2 * pad, axis=1), seq],
                            axis=1)
    want, _ = forward_dilated(cfg, params, state, padded, train=False)

    lifter = StreamingCausalLifter(cfg, params, state)
    lifter.reset(frames[0])
    got = np.stack([np.asarray(lifter.step(frames[t])) for t in range(6)],
                   axis=1)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_sampler_single_short_sequence():
    """A sequence shorter than the batch still yields one padded batch."""
    s = ChunkedPairSampler([3], batch_size=8, chunk_length=1)
    batches = list(s.next_epoch())
    assert len(batches) == 1
    meta, n_valid = batches[0]
    assert meta.shape == (8, 4)
    assert n_valid == 3
    # Padded rows replicate row 0.
    np.testing.assert_array_equal(meta[3:], np.broadcast_to(meta[0], (5, 4)))


def test_sampler_chunk_overhang_centering():
    """Chunk offsets center the overhang like the reference (generators.py:42-44)."""
    s = ChunkedPairSampler([10], batch_size=16, chunk_length=4, shuffle=False)
    meta, n_valid = next(s.next_epoch())
    starts = sorted(meta[:n_valid, 1].tolist())
    # n_chunks = 3, offset = (12-10)//2 = 1 -> starts -1, 3, 7.
    assert starts == [-1, 3, 7]


def test_fused_evaluator_close_to_exact():
    """Serving-mode Evaluator (fused Pallas path, interpret on CPU via f32)
    tracks the metric-grade evaluator closely."""
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.data.generators import UnchunkedBatcher
    cfg = TemporalModelConfig(num_joints_in=17, in_features=2,
                              num_joints_out=17, filter_widths=(3, 3),
                              dropout=0.0, channels=128)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seq = rng.standard_normal((40, 17, 2)).astype(np.float32) * 0.5
    pad = (receptive_field(cfg) - 1) // 2
    perm = np.arange(17)
    b = UnchunkedBatcher(None, None, [seq], pad=pad, augment=False,
                         kps_flip_perm=perm, joints_flip_perm=perm, bucket=16)
    _, _, b2, n = next(b.next_epoch())

    exact = Evaluator(cfg, joints_flip_perm=perm)
    fused = Evaluator(cfg, joints_flip_perm=perm, fused=True)
    p_exact = exact.predict(params, state, b2, augment=False)[:, :n]
    p_fused = fused.predict(params, state, b2, augment=False)[:, :n]
    np.testing.assert_allclose(p_fused, p_exact, atol=5e-4)
