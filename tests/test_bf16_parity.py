"""Statistical f32-vs-bf16 TRAINING parity (paired seeds, dropout on).

The bf16 headline sweep config (``--compute-dtype bfloat16``) is a mixed-
precision scheme, not a wholesale downcast: parameters, optimizer state, BN
*statistics*, matmul accumulation, model output, and the loss all stay
float32 (models/temporal.py — ``_batchnorm`` accumulates in f32,
``_conv_matmul`` uses ``preferred_element_type=f32``, ``forward_*`` casts the
output to f32 before the loss); only the stored activations and the MXU
operand casts are bfloat16.  The question this test answers statistically is
whether that activation rounding degrades *converged accuracy*.

Method (the VERDICT r4 ask, pattern of ``test_dropout_parity.py``): N>=5
paired seeds on the solvable-task harness at dropout 0.25 — per seed, the
f32 and bf16 runs share the init, the dropout mask seed, and the batch
stream, so the ONLY difference is the compute dtype.  bf16 rounding still
re-randomizes the trajectory chaotically (deltas are spread like cross-seed
noise, not like a micro-perturbation), so the detector is the paired-delta
mean against its standard error, plus a 2% relative bound: a 2% relative
degradation is what a >=1 mm gap at the reference's 46.8 mm H36M operating
point (/root/reference/README.md:18) looks like at this harness's error
level.  Evaluation is always metric-grade f32 (the Evaluator forces f32,
evaluate.py) — only training numerics differ.
"""

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

from test_convergence import _solvable_data

J = 17
N_SEEDS = 5
EPOCHS = 30
DROPOUT = 0.25
CHANNELS = 128
FW = (3, 3)
BATCH = 128


def _train_once(dtype, seed, train_2d, train_3d):
    cfg = TemporalModelConfig(
        num_joints_in=J, in_features=2, num_joints_out=J,
        filter_widths=FW, dropout=DROPOUT, channels=CHANNELS,
        compute_dtype=dtype)
    pad = (receptive_field(cfg) - 1) // 2
    loop = TrainLoopConfig(batch_size=BATCH, chunk_length=1, pad=pad,
                           causal_shift=0, learning_rate=3e-3, epochs=EPOCHS,
                           lr_decay=0.98)
    margins = FlatSequenceDataset.training_margins(pad, 0, 1)
    dev = FlatSequenceDataset(train_2d, train_3d, margins=margins).to_device()
    sampler = ChunkedPairSampler([p.shape[0] for p in train_2d], BATCH, 1,
                                 augment=False, random_seed=1234)
    perm = np.arange(J)
    trainer = SupervisedTrainer(cfg, loop, perm, perm)
    # Same init and same dropout-mask key for both dtypes of a pair: the
    # compute dtype is the only difference.
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(100 + seed))
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(200 + seed)
    lr = loop.learning_rate
    for epoch in range(EPOCHS):
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

    batcher = UnchunkedBatcher(None, train_3d[:2], train_2d[:2], pad=pad,
                               augment=False, kps_flip_perm=perm,
                               joints_flip_perm=perm, bucket=32)
    evaluator = Evaluator(cfg, joints_flip_perm=perm)
    e1, *_ = evaluate(evaluator, params, state, batcher, verbose=False)
    return float(e1)


@pytest.mark.slow
def test_mixed_training_statistical_parity():
    """``--compute-dtype mixed`` (bf16 MXU operand casts, f32 activations/BN
    normalize/residual/dropout) must be statistically indistinguishable from
    f32 — this is the metric-grade fast config (VERDICT r4 item 4).  Tighter
    bound than the bf16 test: 1% relative (0.5 mm at the 46.8 mm operating
    point) or noise, whichever is larger."""
    rng = np.random.default_rng(7)
    train_2d, train_3d = _solvable_data(rng, 4, 600)

    f32_mm, mixed_mm = [], []
    for seed in range(N_SEEDS):
        f32_mm.append(_train_once("float32", seed, train_2d, train_3d))
        mixed_mm.append(_train_once("mixed", seed, train_2d, train_3d))

    f32_mm = np.array(f32_mm)
    mixed_mm = np.array(mixed_mm)
    delta = mixed_mm - f32_mm
    sem = delta.std(ddof=1) / np.sqrt(N_SEEDS)
    print(f"\nf32-vs-mixed final eval MPJPE (mm), dropout {DROPOUT}: "
          f"f32 {f32_mm.round(2)} (mean {f32_mm.mean():.2f}) | "
          f"mixed {mixed_mm.round(2)} (mean {mixed_mm.mean():.2f}) | "
          f"paired delta mean {delta.mean():+.3f} sem {sem:.3f}")

    assert f32_mm.mean() < 500.0, f32_mm
    assert mixed_mm.mean() < 500.0, mixed_mm
    bound = max(2.5 * sem, 0.01 * f32_mm.mean())
    assert abs(delta.mean()) <= bound, (
        f"mixed-vs-f32 mean eval gap {delta.mean():+.3f} mm exceeds "
        f"{bound:.3f} mm (sem {sem:.3f}, f32 mean {f32_mm.mean():.2f})")


@pytest.mark.slow
def test_bf16_training_gap_is_bounded():
    """Full-bf16 activations are NOT free: the paired-seed measurement found
    a small but systematic convergence gap (+3.62 mm +/- 0.28 sem on 196 mm,
    ~+1.8% relative, all 5 paired deltas positive — round 5).  That is just
    under 1 mm at the 46.8 mm operating point, so bf16 remains acceptable
    for throughput sweeps, but ``mixed`` is the recommended fast config for
    metric-grade results (see test_mixed_training_statistical_parity).  This
    test pins the bf16 gap as SMALL AND BOUNDED (<=2.5% relative) so a
    toolchain regression that blows it up gets caught."""
    rng = np.random.default_rng(7)
    train_2d, train_3d = _solvable_data(rng, 4, 600)

    f32_mm, bf16_mm = [], []
    for seed in range(N_SEEDS):
        f32_mm.append(_train_once("float32", seed, train_2d, train_3d))
        bf16_mm.append(_train_once("bfloat16", seed, train_2d, train_3d))

    f32_mm = np.array(f32_mm)
    bf16_mm = np.array(bf16_mm)
    delta = bf16_mm - f32_mm
    sem = delta.std(ddof=1) / np.sqrt(N_SEEDS)
    print(f"\nf32-vs-bf16 final eval MPJPE (mm), dropout {DROPOUT}: "
          f"f32 {f32_mm.round(2)} (mean {f32_mm.mean():.2f} "
          f"sd {f32_mm.std(ddof=1):.2f}) | "
          f"bf16 {bf16_mm.round(2)} (mean {bf16_mm.mean():.2f} "
          f"sd {bf16_mm.std(ddof=1):.2f}) | "
          f"paired delta mean {delta.mean():+.3f} sem {sem:.3f}")

    # Both dtypes actually converge (the task is solvable; dropout slows it).
    untrained = 500.0  # this harness's untrained error is ~600-700 mm
    assert f32_mm.mean() < untrained, f32_mm
    assert bf16_mm.mean() < untrained, bf16_mm

    # The measured systematic gap is ~+1.8% relative; pin it at <= 2.5% so a
    # regression that widens it (new fusion, changed rounding) gets caught.
    bound = max(2.5 * sem, 0.025 * f32_mm.mean())
    assert abs(delta.mean()) <= bound, (
        f"bf16-vs-f32 mean eval gap {delta.mean():+.3f} mm exceeds "
        f"{bound:.3f} mm (sem {sem:.3f}, f32 mean {f32_mm.mean():.2f}) — "
        f"the documented bf16 gap is ~+1.8% relative")
