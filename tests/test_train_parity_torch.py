"""Training-dynamics parity vs the torch reference: identical weights,
identical batches, dropout off, Adam(amsgrad) on both sides — per-step losses
and the weights after optimization must track each other closely.

This is the strongest no-real-data substitute for reproducing the published
46.8 mm: if the forward, the BatchNorm train-mode semantics, the gradients,
and the optimizer all match step-for-step, the training trajectory is the
reference's trajectory (``/root/reference/run.py:399-420`` supervised loop,
``:252-264`` optimizer)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, forward_strided, receptive_field)
from videopose3d_tpu.models.convert import params_from_torch_state_dict

STEPS = 15
LR = 1e-3


def _batches(rf, n=STEPS, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        x2d = rng.standard_normal((batch, rf, 17, 2)).astype(np.float32)
        # Learnable structure so losses actually move.
        depth = 0.3 * np.sin(2 * x2d[..., :1]) + 0.2 * x2d[..., 1:]
        x3d = np.concatenate([0.5 * x2d, depth], axis=-1)[:, rf // 2:rf // 2 + 1]
        x3d[:, :, 0] = 0.0
        yield x2d, x3d.astype(np.float32)


def test_supervised_training_tracks_torch_reference(reference_modules):
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3), causal=False, dropout=0.0, channels=32)
    rf = receptive_field(cfg)

    torch.manual_seed(7)
    ref = reference_modules.model.TemporalModelOptimized1f(
        17, 2, 17, [3, 3], causal=False, dropout=0.0, channels=32)
    ref.train()
    params, state = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref.state_dict().items()})

    # --- torch side: the reference training loop (run.py:399-420) ---
    opt_t = torch.optim.Adam(ref.parameters(), lr=LR, amsgrad=True)
    losses_t = []
    for x2d, x3d in _batches(rf):
        opt_t.zero_grad()
        pred = ref(torch.from_numpy(x2d))
        loss = reference_modules.loss.mpjpe(pred, torch.from_numpy(x3d))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    # --- jax side: same batches, the torch-exact optimizer ---
    from videopose3d_tpu.train import make_optimizer
    optimizer = make_optimizer(LR)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, state, opt_state, x2d, x3d):
        def loss_fn(p):
            pred, new_state = forward_strided(cfg, p, state, x2d, train=True,
                                              momentum=0.1, rng=None)
            return jnp.mean(jnp.linalg.norm(pred - x3d, axis=-1)), new_state
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    losses_j = []
    for x2d, x3d in _batches(rf):
        params, state, opt_state, loss = step(
            params, state, opt_state, jnp.asarray(x2d), jnp.asarray(x3d))
        losses_j.append(float(loss))

    losses_t, losses_j = np.array(losses_t), np.array(losses_j)
    # Same trajectory: tight at the start, tolerance widening with the
    # accumulated f32/optimizer-implementation drift.
    np.testing.assert_allclose(losses_j[:5], losses_t[:5], rtol=1e-5)
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4)
    # Losses actually decreased (this is a learnable task).
    assert losses_t[-1] < 0.85 * losses_t[0]

    # The optimized weights land in the same place.
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    w_t = sd["layers_conv.0.weight"]  # torch layout (C_out, C_in, k)
    w_j = np.transpose(np.asarray(params["layers_conv"][0]["weight"]),
                       (2, 1, 0))
    np.testing.assert_allclose(w_j, w_t, rtol=2e-3, atol=2e-5)


# ---------------------------------------------------------------------------
# Epoch-scale parity: full training loops, both samplers, flip augmentation,
# lr + BN-momentum schedules, per-epoch eval through both eval paths.
# ---------------------------------------------------------------------------

EPOCHS = 4
LR_DECAY = 0.95
KPS_LEFT = [4, 5, 6, 11, 12, 13]
KPS_RIGHT = [1, 2, 3, 14, 15, 16]


def _epoch_flip_perm():
    perm = np.arange(17)
    perm[KPS_LEFT] = KPS_RIGHT
    perm[KPS_RIGHT] = KPS_LEFT
    return perm


def _sequences(lengths, seed=3):
    """Learnable synthetic videos: 3D targets are a smooth pointwise function
    of the 2D inputs, consistent under horizontal flipping."""
    rng = np.random.default_rng(seed)
    poses_2d, poses_3d = [], []
    for l in lengths:
        x2d = rng.standard_normal((l, 17, 2)).astype(np.float32)
        depth = 0.3 * np.sin(2 * x2d[..., :1]) + 0.2 * x2d[..., 1:]
        x3d = np.concatenate([0.5 * x2d, depth], axis=-1).astype(np.float32)
        poses_2d.append(x2d)
        poses_3d.append(x3d)
    return poses_2d, poses_3d


def _bn_momentum(epoch: int) -> float:
    """The reference's decay evaluated for the epoch about to run
    (run.py:589-591 sets the NEXT epoch's momentum after each epoch; epoch 0
    runs at the initial 0.1)."""
    return 0.1 * float(np.exp(-epoch / EPOCHS * np.log(0.1 / 0.001)))


def test_epoch_scale_training_parity(reference_modules):
    """VERDICT r2 item 2: multi-epoch training-loop parity with everything ON
    that the 15-step test leaves off — the reference ChunkedGenerator vs our
    descriptor sampler + on-device assembly (flip augmentation enabled), the
    lr decay (run.py:583-587), the BN-momentum decay (run.py:589-593), and
    end-of-epoch evaluation through the reference UnchunkedGenerator +
    dilated torch model vs our UnchunkedBatcher + Evaluator.  Dropout off;
    per-epoch train losses and eval MPJPEs must track to ~1e-3 relative."""
    import torch as _torch

    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset,
                                                 UnchunkedBatcher)
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.ops.losses import mpjpe_np
    from videopose3d_tpu.train import (SupervisedTrainer, TrainLoopConfig,
                                       make_optimizer, set_learning_rate)

    fw = [3, 3]
    channels = 32
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=tuple(fw), causal=False, dropout=0.0, channels=channels)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    batch = 16

    # 40 chunks x2 flip = 80 pairs = 5 exact batches: no short final batch, so
    # the documented padded-final-batch BatchNorm difference (train.py:21-24)
    # is out of the picture and the comparison isolates the loop semantics.
    lengths = [20, 12, 8]
    poses_2d, poses_3d = _sequences(lengths)
    eval_lengths = [16, 11]
    eval_2d, eval_3d = _sequences(eval_lengths, seed=9)
    perm = _epoch_flip_perm()

    torch.manual_seed(11)
    ref_train = reference_modules.model.TemporalModelOptimized1f(
        17, 2, 17, fw, causal=False, dropout=0.0, channels=channels)
    ref_eval = reference_modules.model.TemporalModel(
        17, 2, 17, fw, causal=False, dropout=0.0, channels=channels)
    ref_train.train()
    params, state = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref_train.state_dict().items()})

    # --- torch side: the reference loops verbatim in semantics ---
    gen_t = reference_modules.generators.ChunkedGenerator(
        batch, None, [p.copy() for p in poses_3d],
        [p.copy() for p in poses_2d], 1, pad=pad, causal_shift=0,
        shuffle=True, random_seed=1234, augment=True,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT)
    gen_eval_t = reference_modules.generators.UnchunkedGenerator(
        None, [p.copy() for p in eval_3d], [p.copy() for p in eval_2d],
        pad=pad, causal_shift=0, augment=False)
    opt_t = _torch.optim.Adam(ref_train.parameters(), lr=LR, amsgrad=True)
    lr_t = LR
    train_losses_t, eval_losses_t = [], []
    for epoch in range(EPOCHS):
        ref_train.train()
        ref_train.set_bn_momentum(_bn_momentum(epoch))
        epoch_loss, n_frames = 0.0, 0
        for _, batch_3d, batch_2d in gen_t.next_epoch():
            inputs_3d = _torch.from_numpy(batch_3d.astype("float32"))
            inputs_2d = _torch.from_numpy(batch_2d.astype("float32"))
            inputs_3d[:, :, 0] = 0
            opt_t.zero_grad()
            pred = ref_train(inputs_2d)
            loss = reference_modules.loss.mpjpe(pred, inputs_3d)
            epoch_loss += inputs_3d.shape[0] * inputs_3d.shape[1] * float(loss)
            n_frames += inputs_3d.shape[0] * inputs_3d.shape[1]
            loss.backward()
            opt_t.step()
        train_losses_t.append(epoch_loss / n_frames)

        with _torch.no_grad():
            ref_eval.load_state_dict(ref_train.state_dict())
            ref_eval.eval()
            eval_loss, n_frames = 0.0, 0
            for _, batch_3d, batch_2d in gen_eval_t.next_epoch():
                inputs_3d = _torch.from_numpy(batch_3d.astype("float32"))
                inputs_2d = _torch.from_numpy(batch_2d.astype("float32"))
                inputs_3d[:, :, 0] = 0
                pred = ref_eval(inputs_2d)
                loss = reference_modules.loss.mpjpe(pred, inputs_3d)
                eval_loss += (inputs_3d.shape[0] * inputs_3d.shape[1]
                              * float(loss))
                n_frames += inputs_3d.shape[0] * inputs_3d.shape[1]
            eval_losses_t.append(eval_loss / n_frames)

        lr_t *= LR_DECAY
        for g in opt_t.param_groups:
            g["lr"] = lr_t

    # --- jax side: the production path (margin-padded flat dataset with
    # baked flip copies, descriptor sampler, jitted trainer, Evaluator) ---
    loop = TrainLoopConfig(batch_size=batch, chunk_length=1, pad=pad,
                           causal_shift=0, learning_rate=LR,
                           lr_decay=LR_DECAY, epochs=EPOCHS)
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm))
    dev = ds.to_device()
    sampler = ChunkedPairSampler(lengths, batch, 1, shuffle=True,
                                 random_seed=1234, augment=True)
    trainer = SupervisedTrainer(cfg, loop, perm, perm)
    opt_state = trainer.init_optimizer(params)
    evaluator = Evaluator(cfg, joints_flip_perm=perm)
    eval_batcher = UnchunkedBatcher(None, eval_3d, eval_2d, pad=pad,
                                    bucket=16)
    step_rng = jax.random.PRNGKey(0)  # dropout off: never consumed by masks
    lr_j = LR
    train_losses_j, eval_losses_j = [], []
    for epoch in range(EPOCHS):
        momentum = _bn_momentum(epoch)
        epoch_loss, n_frames = 0.0, 0
        for meta, n_valid in sampler.next_epoch():
            params, state, opt_state, step_rng, loss = trainer.step(
                params, state, opt_state, step_rng, dev, meta, n_valid,
                momentum)
            epoch_loss += n_valid * float(loss)
            n_frames += n_valid
        train_losses_j.append(epoch_loss / n_frames)

        eval_loss, n_frames = 0.0, 0
        for _, batch_3d, batch_2d, n in eval_batcher.next_epoch():
            pred = evaluator.predict(params, state, batch_2d,
                                     augment=False)[:, :n]
            target = np.asarray(batch_3d, np.float32).copy()
            target[:, :, 0] = 0.0
            eval_loss += n * mpjpe_np(pred, target)
            n_frames += n
        eval_losses_j.append(eval_loss / n_frames)

        lr_j *= LR_DECAY
        opt_state = set_learning_rate(opt_state, lr_j)

    train_losses_t = np.array(train_losses_t)
    train_losses_j = np.array(train_losses_j)
    eval_losses_t = np.array(eval_losses_t)
    eval_losses_j = np.array(eval_losses_j)

    np.testing.assert_allclose(train_losses_j[0], train_losses_t[0],
                               rtol=1e-4)
    np.testing.assert_allclose(train_losses_j, train_losses_t, rtol=1e-3)
    np.testing.assert_allclose(eval_losses_j, eval_losses_t, rtol=1e-3)
    # The task is learnable and both loops actually learned it.
    assert train_losses_t[-1] < 0.75 * train_losses_t[0]
    assert eval_losses_t[-1] < eval_losses_t[0]
