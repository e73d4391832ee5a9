"""Statistical training parity vs torch with dropout ON.

Deterministic step-parity tests (``test_train_parity_torch.py``) must run
dropout=0 — mask streams can't match across frameworks.  But the production
path has three real dropout deviations from the reference to bound
(``/root/reference/common/model.py`` ``nn.Dropout`` usage, reference default
p=0.25, ``arguments.py:41``):

  1. keep-prob quantized to k/256 (uint8 mask draws, models/temporal.py);
  2. masks drawn in (T, C, B) order and bitcast-transposed;
  3. the ``--rng-impl`` hardware-generator option (rbg) vs torch's Mersenne.

None of these changes the dropout *distribution* (IID Bernoulli(0.75),
exactly — 192/256 == 0.75 — with inverted scaling), so training to
convergence at a matched config must land in the same place statistically.
This test runs N paired seeds (identical torch-initialized weights per seed,
independent mask streams) through both frameworks' full training loops,
dropout 0.25 ON, and requires the final eval-MPJPE distributions to overlap:
|mean_jax - mean_torch| within ~1 pooled sigma, plus both sides actually
converging.  Deviations 1-2 are exercised directly; the rbg impl is covered
by a 2-seed spot check against the test's own threefry runs (same
distributional claim, hardware generator active only on TPU runs).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute; full tier only (--run-slow)
import torch

import jax

from videopose3d_tpu.models.convert import params_from_torch_state_dict
from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                             receptive_field)

N_SEEDS = 5
EPOCHS = 20
LR = 2e-3
LR_DECAY = 0.95
DROPOUT = 0.25
BATCH = 16
CHANNELS = 32
FW = (3, 3)
KPS_LEFT = [4, 5, 6, 11, 12, 13]
KPS_RIGHT = [1, 2, 3, 14, 15, 16]
LENGTHS = [80, 48, 32]         # 160 chunks x2 flip = 20 exact batches/epoch
EVAL_LENGTHS = [16, 11]


def _flip_perm():
    perm = np.arange(17)
    perm[KPS_LEFT] = KPS_RIGHT
    perm[KPS_RIGHT] = KPS_LEFT
    return perm


def _sequences(lengths, seed):
    rng = np.random.default_rng(seed)
    poses_2d, poses_3d = [], []
    for l in lengths:
        x2d = rng.standard_normal((l, 17, 2)).astype(np.float32)
        depth = 0.3 * np.sin(2 * x2d[..., :1]) + 0.2 * x2d[..., 1:]
        poses_2d.append(x2d)
        poses_3d.append(
            np.concatenate([0.5 * x2d, depth], axis=-1).astype(np.float32))
    return poses_2d, poses_3d


def _bn_momentum(epoch):
    return 0.1 * float(np.exp(-epoch / EPOCHS * np.log(0.1 / 0.001)))


def _init_state_dict(seed):
    """Matched initial weights for one paired run (torch init, both sides)."""
    import common.model as ref_model  # via reference_modules fixture path
    torch.manual_seed(seed)
    model = ref_model.TemporalModelOptimized1f(
        17, 2, 17, list(FW), causal=False, dropout=DROPOUT, channels=CHANNELS)
    return {k: v.numpy().copy() for k, v in model.state_dict().items()}


def _train_torch(reference_modules, init_sd, data, eval_data, mask_seed):
    poses_2d, poses_3d = data
    eval_2d, eval_3d = eval_data
    rf = receptive_field(TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=FW, channels=CHANNELS))
    pad = (rf - 1) // 2

    model = reference_modules.model.TemporalModelOptimized1f(
        17, 2, 17, list(FW), causal=False, dropout=DROPOUT, channels=CHANNELS)
    model.load_state_dict({k: torch.from_numpy(v)
                           for k, v in init_sd.items()})
    model_eval = reference_modules.model.TemporalModel(
        17, 2, 17, list(FW), causal=False, dropout=DROPOUT, channels=CHANNELS)
    torch.manual_seed(mask_seed)  # dropout mask stream only

    gen = reference_modules.generators.ChunkedGenerator(
        BATCH, None, [p.copy() for p in poses_3d],
        [p.copy() for p in poses_2d], 1, pad=pad, causal_shift=0,
        shuffle=True, random_seed=1234, augment=True,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT)
    gen_eval = reference_modules.generators.UnchunkedGenerator(
        None, [p.copy() for p in eval_3d], [p.copy() for p in eval_2d],
        pad=pad, causal_shift=0, augment=False)

    opt = torch.optim.Adam(model.parameters(), lr=LR, amsgrad=True)
    lr = LR
    for epoch in range(EPOCHS):
        model.train()
        model.set_bn_momentum(_bn_momentum(epoch))
        for _, batch_3d, batch_2d in gen.next_epoch():
            x3d = torch.from_numpy(batch_3d.astype("float32"))
            x2d = torch.from_numpy(batch_2d.astype("float32"))
            x3d[:, :, 0] = 0
            opt.zero_grad()
            loss = reference_modules.loss.mpjpe(model(x2d), x3d)
            loss.backward()
            opt.step()
        lr *= LR_DECAY
        for g in opt.param_groups:
            g["lr"] = lr

    with torch.no_grad():
        model_eval.load_state_dict(model.state_dict())
        model_eval.eval()
        err, n_total = 0.0, 0
        for _, batch_3d, batch_2d in gen_eval.next_epoch():
            x3d = torch.from_numpy(batch_3d.astype("float32"))
            x2d = torch.from_numpy(batch_2d.astype("float32"))
            x3d[:, :, 0] = 0
            loss = reference_modules.loss.mpjpe(model_eval(x2d), x3d)
            n = x3d.shape[0] * x3d.shape[1]
            err += n * float(loss)
            n_total += n
    return err / n_total * 1000  # mm


def _train_jax(init_sd, data, eval_data, mask_seed, rng_impl="threefry2x32"):
    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset,
                                                 UnchunkedBatcher)
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.ops.losses import mpjpe_np
    from videopose3d_tpu.train import (SupervisedTrainer, TrainLoopConfig,
                                       set_learning_rate)

    jax.config.update("jax_default_prng_impl", rng_impl)
    try:
        poses_2d, poses_3d = data
        eval_2d, eval_3d = eval_data
        cfg = TemporalModelConfig(
            num_joints_in=17, in_features=2, num_joints_out=17,
            filter_widths=FW, causal=False, dropout=DROPOUT,
            channels=CHANNELS)
        pad = (receptive_field(cfg) - 1) // 2
        perm = _flip_perm()

        params, state = params_from_torch_state_dict(cfg, init_sd)
        loop = TrainLoopConfig(batch_size=BATCH, chunk_length=1, pad=pad,
                               causal_shift=0, learning_rate=LR,
                               lr_decay=LR_DECAY, epochs=EPOCHS)
        ds = FlatSequenceDataset(
            poses_2d, poses_3d,
            margins=FlatSequenceDataset.training_margins(pad, 0, 1),
            flip_perms=(perm, perm))
        dev = ds.to_device()
        sampler = ChunkedPairSampler(LENGTHS, BATCH, 1, shuffle=True,
                                     random_seed=1234, augment=True)
        trainer = SupervisedTrainer(cfg, loop, perm, perm)
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(mask_seed)
        lr = LR
        for epoch in range(EPOCHS):
            momentum = _bn_momentum(epoch)
            for meta, n_valid in sampler.next_epoch():
                params, state, opt_state, step_rng, _ = trainer.step(
                    params, state, opt_state, step_rng, dev, meta, n_valid,
                    momentum)
            lr *= LR_DECAY
            opt_state = set_learning_rate(opt_state, lr)

        evaluator = Evaluator(cfg, joints_flip_perm=perm)
        batcher = UnchunkedBatcher(None, eval_3d, eval_2d, pad=pad, bucket=16)
        err, n_total = 0.0, 0
        for _, batch_3d, batch_2d, n in batcher.next_epoch():
            pred = evaluator.predict(params, state, batch_2d,
                                     augment=False)[:, :n]
            target = np.asarray(batch_3d, np.float32).copy()
            target[:, :, 0] = 0.0
            err += n * mpjpe_np(pred, target)
            n_total += n
        return err / n_total * 1000  # mm
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def _eval_initial(init_sd, eval_data):
    """Eval MPJPE (mm) of the untrained weights — the learning baseline."""
    from videopose3d_tpu.data.generators import UnchunkedBatcher
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.ops.losses import mpjpe_np

    eval_2d, eval_3d = eval_data
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=FW, causal=False, dropout=DROPOUT, channels=CHANNELS)
    pad = (receptive_field(cfg) - 1) // 2
    params, state = params_from_torch_state_dict(cfg, init_sd)
    evaluator = Evaluator(cfg, joints_flip_perm=_flip_perm())
    batcher = UnchunkedBatcher(None, eval_3d, eval_2d, pad=pad, bucket=16)
    err, n_total = 0.0, 0
    for _, batch_3d, batch_2d, n in batcher.next_epoch():
        pred = evaluator.predict(params, state, batch_2d, augment=False)[:, :n]
        target = np.asarray(batch_3d, np.float32).copy()
        target[:, :, 0] = 0.0
        err += n * mpjpe_np(pred, target)
        n_total += n
    return err / n_total * 1000


def test_dropout_on_statistical_parity(reference_modules):
    data = _sequences(LENGTHS, seed=3)
    eval_data = _sequences(EVAL_LENGTHS, seed=9)

    torch_mm, jax_mm = [], []
    for seed in range(N_SEEDS):
        init_sd = _init_state_dict(100 + seed)
        torch_mm.append(_train_torch(reference_modules, init_sd, data,
                                     eval_data, mask_seed=200 + seed))
        jax_mm.append(_train_jax(init_sd, data, eval_data,
                                 mask_seed=200 + seed))

    torch_mm = np.array(torch_mm)
    jax_mm = np.array(jax_mm)
    print(f"\ndropout=0.25 final eval MPJPE (mm): "
          f"torch {torch_mm.round(2)} (mean {torch_mm.mean():.2f} "
          f"sd {torch_mm.std(ddof=1):.2f}) | "
          f"jax {jax_mm.round(2)} (mean {jax_mm.mean():.2f} "
          f"sd {jax_mm.std(ddof=1):.2f})")

    # Both sides learned substantially (dropout 0.25 on a 32-channel model
    # converges slowly by design — the claim under test is that the two
    # frameworks' dropout-on dynamics land in the same place, not that this
    # tiny config reaches a production error level).
    untrained = _eval_initial(_init_state_dict(100), eval_data)
    assert torch_mm.mean() < 0.85 * untrained
    assert jax_mm.mean() < 0.85 * untrained

    # Distribution overlap: means within ~1 pooled sigma of each other.
    pooled = np.sqrt((torch_mm.var(ddof=1) + jax_mm.var(ddof=1)) / 2)
    delta = abs(torch_mm.mean() - jax_mm.mean())
    assert delta <= max(1.0 * pooled, 0.02 * torch_mm.mean()), (
        f"jax-vs-torch dropout-on mean gap {delta:.3f} mm exceeds "
        f"1 sigma ({pooled:.3f} mm)")


def test_dropout_rbg_impl_matches_threefry_statistically(reference_modules):
    """The rbg hardware-generator option changes only which IID bits feed the
    masks; converged eval error must agree with the threefry runs at the same
    config (2-seed spot check, compared against the threefry pair)."""
    data = _sequences(LENGTHS, seed=3)
    eval_data = _sequences(EVAL_LENGTHS, seed=9)
    vals = {}
    for impl in ("threefry2x32", "rbg"):
        runs = []
        for seed in range(2):
            init_sd = _init_state_dict(100 + seed)
            runs.append(_train_jax(init_sd, data, eval_data,
                                   mask_seed=300 + seed, rng_impl=impl))
        vals[impl] = np.array(runs)
    # Two seeds can land nearly on top of each other by chance, so a
    # pair-spread bound is meaningless; the 5-seed main test measured a
    # cross-seed sd of ~5-15 mm at this config, so bound the impl gap at
    # 3% of the error level (~17 mm) — an impl bug (wrong keep-prob, reused
    # masks) shifts the mean by far more.
    gap = abs(vals["rbg"].mean() - vals["threefry2x32"].mean())
    assert gap <= 0.03 * vals["threefry2x32"].mean(), (gap, vals)
