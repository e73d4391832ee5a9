"""Learning integration test: on a synthetic lifting task whose depth is a
deterministic function of the 2D keypoints, supervised training drives the
whole-video evaluation MPJPE far below the untrained baseline — exercising the
full train->eval machinery (on-device pipeline, epoch scan, BN running stats,
dilated evaluator) for actual learning, not just loss movement.  Evaluation is
on the training sequences: a 2-block/128-channel net cannot generalize a
17-joint nonlinear depth map from 2.4k frames, and generalization is not what
this test guards."""

import numpy as np
import jax
import pytest

from videopose3d_tpu.data import FlatSequenceDataset, ChunkedPairSampler
from videopose3d_tpu.data.generators import UnchunkedBatcher
from videopose3d_tpu.evaluate import Evaluator, evaluate
from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, receptive_field)
from videopose3d_tpu.train import (
    TrainLoopConfig, SupervisedTrainer, bn_momentum_for_epoch,
    set_learning_rate)

J = 17


def _solvable_data(rng, n_seqs, length):
    """Temporally smooth 2D trajectories whose 3D target depth is pointwise
    recoverable: (x, y) -> (x, y, 0.4*sin(2x) + 0.3*cos(3y)), root zeroed."""
    poses_2d, poses_3d = [], []
    for _ in range(n_seqs):
        steps = rng.standard_normal((length, J, 2)).astype(np.float32) * 0.08
        p2 = np.sin(np.cumsum(steps, axis=0)).astype(np.float32)
        z = 0.4 * np.sin(2 * p2[..., 0]) + 0.3 * np.cos(3 * p2[..., 1])
        p3 = np.concatenate([p2, z[..., None]], axis=-1).astype(np.float32)
        p3[:, 0] = 0.0  # root-relative target with zeroed hip
        poses_2d.append(p2)
        poses_3d.append(p3)
    return poses_2d, poses_3d


def test_training_converges_to_low_mpjpe():
    rng = np.random.default_rng(0)
    train_2d, train_3d = _solvable_data(rng, 4, 600)
    test_2d, test_3d = train_2d[:2], train_3d[:2]  # held-in (see docstring)

    cfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=J,
                              filter_widths=(3, 3), dropout=0.0, channels=128)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    epochs = 15
    loop = TrainLoopConfig(batch_size=128, chunk_length=1, pad=pad,
                           causal_shift=0, learning_rate=3e-3, epochs=epochs, lr_decay=0.98)

    margins = FlatSequenceDataset.training_margins(pad, 0, 1)
    dev = FlatSequenceDataset(train_2d, train_3d, margins=margins).to_device()
    sampler = ChunkedPairSampler([p.shape[0] for p in train_2d], 128, 1,
                                 augment=False)
    perm = np.arange(J)
    trainer = SupervisedTrainer(cfg, loop, perm, perm)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(1)

    batcher = UnchunkedBatcher(None, test_3d, test_2d, pad=pad, augment=False,
                               kps_flip_perm=perm, joints_flip_perm=perm,
                               bucket=32)
    evaluator = Evaluator(cfg, joints_flip_perm=perm)

    e1_before, *_ = evaluate(evaluator, params, state, batcher, verbose=False)

    lr = loop.learning_rate
    for epoch in range(epochs):
        momentum = bn_momentum_for_epoch(loop, epoch - 1)
        metas, n_valids = [], []
        for meta, n_valid in sampler.next_epoch():
            metas.append(meta)
            n_valids.append(n_valid)
        params, state, opt_state, step_rng, _ = trainer.run_epoch(
            params, state, opt_state, step_rng, dev, np.stack(metas),
            np.array(n_valids), momentum)
        lr *= loop.lr_decay
        opt_state = set_learning_rate(opt_state, lr)

    e1_after, e2_after, e3_after, _ = evaluate(
        evaluator, params, state, batcher, verbose=False)

    # Untrained: hundreds of mm on this scale. Trained: tens.
    assert e1_after < e1_before / 3, (e1_before, e1_after)
    assert e1_after < 250.0, e1_after
    # Scale/rigid-aligned protocols can only be better or equal.
    assert e2_after <= e1_after + 1e-6
    assert e3_after <= e1_after + 1e-6


def test_bfloat16_training_converges_like_float32():
    """--compute-dtype bfloat16 (the fast MXU path) reaches a similar eval
    error to float32 on the solvable task — de-risking the bf16 training
    recommendation."""
    rng = np.random.default_rng(3)
    train_2d, train_3d = _solvable_data(rng, 4, 600)

    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = TemporalModelConfig(
            num_joints_in=J, in_features=2, num_joints_out=J,
            filter_widths=(3, 3), dropout=0.0, channels=128,
            compute_dtype=dtype)
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=128, chunk_length=1, pad=pad,
                               causal_shift=0, learning_rate=3e-3, epochs=10,
                               lr_decay=0.98)
        margins = FlatSequenceDataset.training_margins(pad, 0, 1)
        dev = FlatSequenceDataset(train_2d, train_3d,
                                  margins=margins).to_device()
        sampler = ChunkedPairSampler([p.shape[0] for p in train_2d], 128, 1,
                                     augment=False)
        perm = np.arange(J)
        trainer = SupervisedTrainer(cfg, loop, perm, perm)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(1)
        for epoch in range(10):
            momentum = bn_momentum_for_epoch(loop, epoch - 1)
            metas, n_valids = [], []
            for meta, n_valid in sampler.next_epoch():
                metas.append(meta)
                n_valids.append(n_valid)
            params, state, opt_state, step_rng, _ = trainer.run_epoch(
                params, state, opt_state, step_rng, dev, np.stack(metas),
                np.array(n_valids), momentum)

        batcher = UnchunkedBatcher(None, train_3d[:2], train_2d[:2], pad=pad,
                                   augment=False, kps_flip_perm=perm,
                                   joints_flip_perm=perm, bucket=32)
        evaluator = Evaluator(cfg, joints_flip_perm=perm)
        e1, *_ = evaluate(evaluator, params, state, batcher, verbose=False)
        results[dtype] = e1

    # bf16 training lands within 25% (relative) of f32 on this task.
    assert results["bfloat16"] < results["float32"] * 1.25, results
