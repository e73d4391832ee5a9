"""Semi-supervised loss composition golden test: the loss values computed inside
our jitted semi step (supervised MPJPE on the labeled split, inverse-depth
trajectory loss, 2D reconstruction loss through the distortion projection, and
the total including the bone-length penalty) must match a torch reimplementation
of the reference loop (run.py:345-387) on identical inputs and weights."""

import numpy as np
import torch
import jax
import pytest

from videopose3d_tpu.data import FlatSequenceDataset, ChunkedPairSampler
from videopose3d_tpu.data.generators import assemble_chunked_batch
from videopose3d_tpu.models import TemporalModelConfig, receptive_field
from videopose3d_tpu.models.convert import params_from_torch_state_dict
from videopose3d_tpu.train import TrainLoopConfig, SemiSupervisedTrainer

J = 17
KPS_LEFT = [4, 5, 6, 11, 12, 13]
KPS_RIGHT = [1, 2, 3, 14, 15, 16]
PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 9, 8, 11, 12, 8, 14, 15])


def _perm():
    p = np.arange(J)
    p[KPS_LEFT] = KPS_RIGHT
    p[KPS_RIGHT] = KPS_LEFT
    return p


def test_semi_step_losses_match_reference(reference_modules):
    torch.manual_seed(0)
    fw = [3, 3]
    channels = 32
    ref_pos = reference_modules.model.TemporalModelOptimized1f(
        J, 2, J, fw, dropout=0.0, channels=channels).train()
    ref_traj = reference_modules.model.TemporalModelOptimized1f(
        J, 2, 1, fw, dropout=0.0, channels=channels).train()

    cfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=J,
                              filter_widths=tuple(fw), dropout=0.0,
                              channels=channels)
    tcfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=1,
                               filter_widths=tuple(fw), dropout=0.0,
                               channels=channels)
    params_pos, state_pos = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref_pos.state_dict().items()})
    params_traj, state_traj = params_from_torch_state_dict(
        tcfg, {k: v.numpy() for k, v in ref_traj.state_dict().items()})

    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    b = 8
    loop = TrainLoopConfig(batch_size=b, chunk_length=1, pad=pad,
                           causal_shift=0, warmup=0)

    rng = np.random.default_rng(0)
    lengths = [30, 25]
    poses_2d = [rng.standard_normal((l, J, 2)).astype(np.float32) * 0.4
                for l in lengths]
    poses_3d = [(rng.standard_normal((l, J, 3)) * 0.2
                 + np.array([0, 0, 4.0])).astype(np.float32) for l in lengths]
    poses_2d_semi = [rng.standard_normal((l, J, 2)).astype(np.float32) * 0.4
                     for l in lengths]
    cams = [np.array([1.1, 1.15, 0.01, -0.02, -0.2, 0.24, -0.003, -0.001,
                      -0.0014], np.float32) for _ in lengths]

    dev = FlatSequenceDataset(poses_2d, poses_3d, None).to_device()
    dev_semi = FlatSequenceDataset(poses_2d_semi, None, cams).to_device()

    perm = _perm()
    sampler = ChunkedPairSampler(lengths, b, 1, augment=True)
    sampler_semi = ChunkedPairSampler(lengths, b, 1, random_seed=4321,
                                      augment=True, endless=True)
    meta, n_valid = next(sampler.next_epoch())
    meta_semi, n_valid_semi = next(sampler_semi.next_epoch())
    assert n_valid == b and n_valid_semi == b  # full batches: no masking effects

    # Materialize exactly the batches our step will assemble, and feed the same
    # numbers to the torch reference computation.
    permt = tuple(perm.tolist())
    _, batch_3d, batch_2d = assemble_chunked_batch(
        dev.flat_2d, dev.flat_3d, None, dev.seq_bounds, meta,
        pad=pad, causal_shift=0, chunk_length=1, kps_flip_perm=permt,
        joints_flip_perm=permt, with_3d=True, with_cameras=False)
    cam_semi, _, batch_2d_semi = assemble_chunked_batch(
        dev_semi.flat_2d, None, dev_semi.cameras, dev_semi.seq_bounds,
        meta_semi, pad=pad, causal_shift=0, chunk_length=1,
        kps_flip_perm=permt, joints_flip_perm=permt,
        with_3d=False, with_cameras=True)

    # --- reference computation (run.py:328-387) ---
    inputs_3d = torch.from_numpy(np.asarray(batch_3d))
    cam_semi_t = torch.from_numpy(np.asarray(cam_semi))
    inputs_traj = inputs_3d[:, :, :1].clone()
    inputs_3d[:, :, 0] = 0
    inputs_2d = torch.from_numpy(np.asarray(batch_2d))
    inputs_2d_semi = torch.from_numpy(np.asarray(batch_2d_semi))
    inputs_2d_cat = torch.cat((inputs_2d, inputs_2d_semi), dim=0)

    with torch.no_grad():
        predicted_3d_pos_cat = ref_pos(inputs_2d_cat)
        predicted_traj_cat = ref_traj(inputs_2d_cat)
        split_idx = inputs_3d.shape[0]

        loss_pos_want = reference_modules.loss.mpjpe(
            predicted_3d_pos_cat[:split_idx], inputs_3d).item()
        w = 1 / inputs_traj[:, :, :, 2]
        loss_traj_want = reference_modules.loss.weighted_mpjpe(
            predicted_traj_cat[:split_idx], inputs_traj, w).item()

        predicted_semi = predicted_3d_pos_cat[split_idx:]
        target_semi = inputs_2d_semi[:, pad:-pad, :, :2].contiguous()
        reconstruction_semi = reference_modules.camera.project_to_2d(
            predicted_semi + predicted_traj_cat[split_idx:], cam_semi_t)
        loss_recon_want = reference_modules.loss.mpjpe(
            reconstruction_semi, target_semi).item()

        dists = (predicted_3d_pos_cat[:, :, 1:]
                 - predicted_3d_pos_cat[:, :, PARENTS[1:]])
        bone_lengths = torch.mean(torch.norm(dists, dim=3), dim=1)
        penalty = torch.mean(torch.abs(
            torch.mean(bone_lengths[:split_idx], dim=0)
            - torch.mean(bone_lengths[split_idx:], dim=0))).item()
        total_want = (loss_pos_want + loss_traj_want + loss_recon_want
                      + penalty)

    # --- our jitted step (BN in train mode on both sides) ---
    trainer = SemiSupervisedTrainer(cfg, tcfg, loop, perm, perm, PARENTS)
    all_params = {"pos": params_pos, "traj": params_traj}
    all_states = {"pos": state_pos, "traj": state_traj}
    opt_state = trainer.init_optimizer(all_params)
    (_, _, _, _, loss_pos, loss_traj, loss_recon, loss_total) = trainer.step(
        all_params, all_states, opt_state, jax.random.PRNGKey(0), dev, dev_semi,
        meta, n_valid, meta_semi, n_valid_semi, 0.1, False)

    assert abs(float(loss_pos) - loss_pos_want) < 2e-5
    assert abs(float(loss_traj) - loss_traj_want) < 2e-4
    assert abs(float(loss_recon) - loss_recon_want) < 2e-5
    assert abs(float(loss_total) - total_want) < 3e-4


def test_semi_training_trajectory_tracks_reference(reference_modules):
    """Ten full semi-supervised optimization steps (both models, joint
    Adam(amsgrad), identical batches, dropout off) track the torch reference's
    loss trajectory — the multi-step extension of the single-step composition
    test above, covering gradients through the distortion projection and the
    bone-length penalty plus the optimizer."""
    torch.manual_seed(3)
    fw = [3, 3]
    channels = 32
    ref_pos = reference_modules.model.TemporalModelOptimized1f(
        J, 2, J, fw, dropout=0.0, channels=channels).train()
    ref_traj = reference_modules.model.TemporalModelOptimized1f(
        J, 2, 1, fw, dropout=0.0, channels=channels).train()

    cfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=J,
                              filter_widths=tuple(fw), dropout=0.0,
                              channels=channels)
    tcfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=1,
                               filter_widths=tuple(fw), dropout=0.0,
                               channels=channels)
    params_pos, state_pos = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref_pos.state_dict().items()})
    params_traj, state_traj = params_from_torch_state_dict(
        tcfg, {k: v.numpy() for k, v in ref_traj.state_dict().items()})

    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    b = 8
    loop = TrainLoopConfig(batch_size=b, chunk_length=1, pad=pad,
                           causal_shift=0, warmup=0)

    rng = np.random.default_rng(1)
    lengths = [40, 35]
    poses_2d = [rng.standard_normal((l, J, 2)).astype(np.float32) * 0.4
                for l in lengths]
    poses_3d = [(rng.standard_normal((l, J, 3)) * 0.2
                 + np.array([0, 0, 4.0])).astype(np.float32) for l in lengths]
    poses_2d_semi = [rng.standard_normal((l, J, 2)).astype(np.float32) * 0.4
                     for l in lengths]
    cams = [np.array([1.1, 1.15, 0.01, -0.02, -0.2, 0.24, -0.003, -0.001,
                      -0.0014], np.float32) for _ in lengths]
    dev = FlatSequenceDataset(poses_2d, poses_3d, None).to_device()
    dev_semi = FlatSequenceDataset(poses_2d_semi, None, cams).to_device()

    perm = _perm()
    permt = tuple(perm.tolist())
    sampler = ChunkedPairSampler(lengths, b, 1, augment=True, endless=True)
    sampler_semi = ChunkedPairSampler(lengths, b, 1, random_seed=4321,
                                      augment=True, endless=True)
    it, it_semi = sampler.next_epoch(), sampler_semi.next_epoch()

    opt_t = torch.optim.Adam(
        list(ref_pos.parameters()) + list(ref_traj.parameters()),
        lr=1e-3, amsgrad=True)

    trainer = SemiSupervisedTrainer(cfg, tcfg, loop, perm, perm, PARENTS)
    all_params = {"pos": params_pos, "traj": params_traj}
    all_states = {"pos": state_pos, "traj": state_traj}
    opt_state = trainer.init_optimizer(all_params)

    losses_t, losses_j = [], []
    for _ in range(10):
        meta, n_valid = next(it)
        meta_semi, n_valid_semi = next(it_semi)
        assert n_valid == b and n_valid_semi == b

        # --- torch side on the identical assembled batches ---
        _, batch_3d, batch_2d = assemble_chunked_batch(
            dev.flat_2d, dev.flat_3d, None, dev.seq_bounds, meta,
            pad=pad, causal_shift=0, chunk_length=1, kps_flip_perm=permt,
            joints_flip_perm=permt, with_3d=True, with_cameras=False)
        cam_semi, _, batch_2d_semi = assemble_chunked_batch(
            dev_semi.flat_2d, None, dev_semi.cameras, dev_semi.seq_bounds,
            meta_semi, pad=pad, causal_shift=0, chunk_length=1,
            kps_flip_perm=permt, joints_flip_perm=permt,
            with_3d=False, with_cameras=True)

        inputs_3d = torch.from_numpy(np.asarray(batch_3d))
        inputs_traj = inputs_3d[:, :, :1].clone()
        inputs_3d[:, :, 0] = 0
        inputs_2d_cat = torch.cat(
            (torch.from_numpy(np.asarray(batch_2d)),
             torch.from_numpy(np.asarray(batch_2d_semi))), dim=0)

        opt_t.zero_grad()
        pred_pos_cat = ref_pos(inputs_2d_cat)
        pred_traj_cat = ref_traj(inputs_2d_cat)
        split = inputs_3d.shape[0]
        loss_pos = reference_modules.loss.mpjpe(pred_pos_cat[:split], inputs_3d)
        w = 1 / inputs_traj[:, :, :, 2]
        loss_traj = reference_modules.loss.weighted_mpjpe(
            pred_traj_cat[:split], inputs_traj, w)
        target_semi = torch.from_numpy(
            np.asarray(batch_2d_semi))[:, pad:-pad, :, :2].contiguous()
        recon = reference_modules.camera.project_to_2d(
            pred_pos_cat[split:] + pred_traj_cat[split:],
            torch.from_numpy(np.asarray(cam_semi)))
        loss_recon = reference_modules.loss.mpjpe(recon, target_semi)
        dists = (pred_pos_cat[:, :, 1:] - pred_pos_cat[:, :, PARENTS[1:]])
        bl = torch.mean(torch.norm(dists, dim=3), dim=1)
        penalty = torch.mean(torch.abs(
            torch.mean(bl[:split], dim=0) - torch.mean(bl[split:], dim=0)))
        total = loss_pos + loss_traj + loss_recon + penalty
        total.backward()
        opt_t.step()
        losses_t.append(float(total))

        # --- our jitted step on the same descriptors ---
        (all_params, all_states, opt_state, _, _, _, _, loss_total) = \
            trainer.step(all_params, all_states, opt_state,
                         jax.random.PRNGKey(0), dev, dev_semi,
                         meta, n_valid, meta_semi, n_valid_semi, 0.1, False)
        losses_j.append(float(loss_total))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-4)


# ---------------------------------------------------------------------------
# Multi-epoch semi-supervised parity (VERDICT r2 item 9): the full loop with
# the warmup boundary crossing, the endless unlabeled stream continuing
# across epochs, flip augmentation, joint pos+traj optimizer, lr + BN-momentum
# schedules, and per-epoch eval of both models.
# ---------------------------------------------------------------------------

SEMI_EPOCHS = 3
SEMI_WARMUP = 1
SEMI_LR = 1e-3
SEMI_LR_DECAY = 0.95


def _semi_bn_momentum(epoch: int) -> float:
    """run.py:589-591 evaluated for the epoch about to run (epoch 0 -> 0.1)."""
    return 0.1 * float(np.exp(
        -epoch / SEMI_EPOCHS * np.log(0.1 / 0.001)))


def _semi_sequences(lengths, seed, with_traj):
    """Learnable synthetic videos ~4 m in front of the camera, 3D a smooth
    pointwise function of 2D (flip-consistent)."""
    rng = np.random.default_rng(seed)
    poses_2d, poses_3d = [], []
    for l in lengths:
        x2d = (rng.standard_normal((l, J, 2)) * 0.3).astype(np.float32)
        depth = 0.2 * np.sin(2 * x2d[..., :1]) + 0.15 * x2d[..., 1:]
        x3d = np.concatenate([0.4 * x2d, depth], axis=-1).astype(np.float32)
        if with_traj:
            x3d[:, 0, :] = np.array([0.0, 0.0, 4.0]) + 0.1 * x3d[:, 0, :]
        poses_2d.append(x2d)
        poses_3d.append(x3d)
    return poses_2d, poses_3d


def test_semi_multi_epoch_training_parity(reference_modules):
    """Per-epoch pos / traj / reconstruction train losses and pos+traj eval
    MPJPEs must track the reference loop (run.py:319-398, :424-549,
    :583-593) to ~1e-3 relative over 3 epochs with warmup=1."""
    import torch as _torch

    from videopose3d_tpu.data.generators import UnchunkedBatcher
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.ops.losses import mpjpe_np
    from videopose3d_tpu.train import make_optimizer, set_learning_rate

    fw = [3, 3]
    channels = 32
    batch = 16
    cfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=J,
                              filter_widths=tuple(fw), dropout=0.0,
                              channels=channels)
    tcfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=1,
                               filter_widths=tuple(fw), dropout=0.0,
                               channels=channels)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    perm = _perm()

    # Labeled: 40 chunks x2 flip = 80 = 5 full batches/epoch.  Unlabeled:
    # 24 x2 = 48 = 3 full batches/permutation — the endless stream crosses a
    # permutation boundary mid-epoch-2, and every batch everywhere is full
    # (the reference yields short batches at boundaries; full batches keep
    # our padded-row masking out of the comparison).
    lengths = [20, 12, 8]
    lengths_semi = [14, 10]
    poses_2d, poses_3d = _semi_sequences(lengths, seed=5, with_traj=True)
    poses_2d_semi, _ = _semi_sequences(lengths_semi, seed=6, with_traj=False)
    eval_lengths = [16, 11]
    eval_2d, eval_3d = _semi_sequences(eval_lengths, seed=7, with_traj=True)
    cams = [np.array([1.1, 1.15, 0.01, -0.02, -0.2, 0.24, -0.003, -0.001,
                      -0.0014], np.float32) for _ in lengths]
    cams_semi = [np.array([1.05, 1.1, -0.015, 0.01, -0.18, 0.2, -0.002,
                           0.0015, -0.001], np.float32) for _ in lengths_semi]

    _torch.manual_seed(21)
    ref_pos = reference_modules.model.TemporalModelOptimized1f(
        J, 2, J, fw, dropout=0.0, channels=channels)
    ref_traj = reference_modules.model.TemporalModelOptimized1f(
        J, 2, 1, fw, dropout=0.0, channels=channels)
    ref_pos_eval = reference_modules.model.TemporalModel(
        J, 2, J, fw, dropout=0.0, channels=channels)
    ref_traj_eval = reference_modules.model.TemporalModel(
        J, 2, 1, fw, dropout=0.0, channels=channels)
    params_pos, state_pos = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref_pos.state_dict().items()})
    params_traj, state_traj = params_from_torch_state_dict(
        tcfg, {k: v.numpy() for k, v in ref_traj.state_dict().items()})

    kl, kr = list(KPS_LEFT), list(KPS_RIGHT)

    # --- torch side (reference loop semantics, run.py:319-398) ---
    gen_t = reference_modules.generators.ChunkedGenerator(
        batch, None, [p.copy() for p in poses_3d],
        [p.copy() for p in poses_2d], 1, pad=pad, causal_shift=0,
        shuffle=True, random_seed=1234, augment=True,
        kps_left=kl, kps_right=kr, joints_left=kl, joints_right=kr)
    gen_semi_t = reference_modules.generators.ChunkedGenerator(
        batch, [c.copy() for c in cams_semi], None,
        [p.copy() for p in poses_2d_semi], 1, pad=pad, causal_shift=0,
        shuffle=True, random_seed=4321, augment=True,
        kps_left=kl, kps_right=kr, joints_left=kl, joints_right=kr,
        endless=True)
    gen_eval_t = reference_modules.generators.UnchunkedGenerator(
        None, [p.copy() for p in eval_3d], [p.copy() for p in eval_2d],
        pad=pad, causal_shift=0, augment=False)
    opt_t = _torch.optim.Adam(
        list(ref_pos.parameters()) + list(ref_traj.parameters()),
        lr=SEMI_LR, amsgrad=True)
    lr_t = SEMI_LR
    hist_t = {"pos": [], "traj": [], "recon": [], "eval3d": [],
              "evaltraj": []}
    semi_iter_t = gen_semi_t.next_epoch()
    for epoch in range(SEMI_EPOCHS):
        skip = epoch < SEMI_WARMUP
        ref_pos.train()
        ref_traj.train()
        ref_pos.set_bn_momentum(_semi_bn_momentum(epoch))
        ref_traj.set_bn_momentum(_semi_bn_momentum(epoch))
        e_pos = e_traj = e_recon = 0.0
        n = n_semi = 0
        for _, batch_3d, batch_2d in gen_t.next_epoch():
            cam_semi, _, batch_2d_semi = next(semi_iter_t)
            cam_semi = _torch.from_numpy(cam_semi.astype("float32"))
            inputs_3d = _torch.from_numpy(batch_3d.astype("float32"))
            inputs_traj = inputs_3d[:, :, :1].clone()
            inputs_3d[:, :, 0] = 0
            split = inputs_3d.shape[0]
            inputs_2d = _torch.from_numpy(batch_2d.astype("float32"))
            inputs_2d_semi = _torch.from_numpy(
                batch_2d_semi.astype("float32"))
            cat = (inputs_2d if skip
                   else _torch.cat((inputs_2d, inputs_2d_semi), dim=0))

            opt_t.zero_grad()
            pred_pos = ref_pos(cat)
            loss_pos = reference_modules.loss.mpjpe(
                pred_pos[:split], inputs_3d)
            e_pos += split * inputs_3d.shape[1] * float(loss_pos)
            n += split * inputs_3d.shape[1]
            total = loss_pos

            pred_traj = ref_traj(cat)
            w = 1 / inputs_traj[:, :, :, 2]
            loss_traj = reference_modules.loss.weighted_mpjpe(
                pred_traj[:split], inputs_traj, w)
            e_traj += split * inputs_3d.shape[1] * float(loss_traj)
            total = total + loss_traj

            if not skip:
                pred_semi = pred_pos[split:]
                target_semi = inputs_2d_semi[:, pad:-pad, :, :2].contiguous()
                recon = reference_modules.camera.project_to_2d(
                    pred_semi + pred_traj[split:], cam_semi)
                loss_recon = reference_modules.loss.mpjpe(recon, target_semi)
                e_recon += pred_semi.shape[0] * pred_semi.shape[1] * float(
                    loss_recon)
                total = total + loss_recon

                dists = (pred_pos[:, :, 1:]
                         - pred_pos[:, :, list(PARENTS[1:])])
                bones = _torch.mean(_torch.norm(dists, dim=3), dim=1)
                penalty = _torch.mean(_torch.abs(
                    _torch.mean(bones[:split], dim=0)
                    - _torch.mean(bones[split:], dim=0)))
                total = total + penalty
                n_semi += pred_semi.shape[0] * pred_semi.shape[1]
            else:
                n_semi += 1

            total.backward()
            opt_t.step()
        hist_t["pos"].append(e_pos / n)
        hist_t["traj"].append(e_traj / n)
        hist_t["recon"].append(e_recon / n_semi)

        with _torch.no_grad():
            ref_pos_eval.load_state_dict(ref_pos.state_dict())
            ref_traj_eval.load_state_dict(ref_traj.state_dict())
            ref_pos_eval.eval()
            ref_traj_eval.eval()
            e3d = etraj = 0.0
            nf = 0
            for _, batch_3d, batch_2d in gen_eval_t.next_epoch():
                inputs_3d = _torch.from_numpy(batch_3d.astype("float32"))
                inputs_2d = _torch.from_numpy(batch_2d.astype("float32"))
                traj_target = inputs_3d[:, :, :1].clone()
                inputs_3d[:, :, 0] = 0
                pred = ref_pos_eval(inputs_2d)
                e3d += (inputs_3d.shape[0] * inputs_3d.shape[1]
                        * float(reference_modules.loss.mpjpe(pred, inputs_3d)))
                pred_tr = ref_traj_eval(inputs_2d)
                etraj += (inputs_3d.shape[0] * inputs_3d.shape[1]
                          * float(reference_modules.loss.mpjpe(
                              pred_tr, traj_target)))
                nf += inputs_3d.shape[0] * inputs_3d.shape[1]
            hist_t["eval3d"].append(e3d / nf)
            hist_t["evaltraj"].append(etraj / nf)

        lr_t *= SEMI_LR_DECAY
        for g in opt_t.param_groups:
            g["lr"] = lr_t

    # --- jax side: the production path ---
    from videopose3d_tpu.data.generators import FlatSequenceDataset as FSD
    margins = FSD.training_margins(pad, 0, 1)
    dev = FSD(poses_2d, poses_3d, cams, margins=margins,
              flip_perms=(perm, perm)).to_device()
    dev_semi = FSD(poses_2d_semi, None, cams_semi, margins=margins,
                   flip_perms=(perm, perm)).to_device()
    loop = TrainLoopConfig(batch_size=batch, chunk_length=1, pad=pad,
                           causal_shift=0, learning_rate=SEMI_LR,
                           lr_decay=SEMI_LR_DECAY, epochs=SEMI_EPOCHS,
                           warmup=SEMI_WARMUP)
    trainer = SemiSupervisedTrainer(cfg, tcfg, loop, perm, perm, PARENTS)
    all_params = {"pos": params_pos, "traj": params_traj}
    all_states = {"pos": state_pos, "traj": state_traj}
    opt_state = trainer.init_optimizer(all_params)
    sampler = ChunkedPairSampler(lengths, batch, 1, shuffle=True,
                                 random_seed=1234, augment=True)
    sampler_semi = ChunkedPairSampler(lengths_semi, batch, 1, shuffle=True,
                                      random_seed=4321, augment=True,
                                      endless=True)
    semi_iter = sampler_semi.next_epoch()
    evaluator = Evaluator(cfg, joints_flip_perm=perm)
    traj_evaluator = Evaluator(tcfg, joints_flip_perm=None)
    eval_batcher = UnchunkedBatcher(None, eval_3d, eval_2d, pad=pad,
                                    bucket=16)
    step_rng = jax.random.PRNGKey(0)
    lr_j = SEMI_LR
    hist_j = {"pos": [], "traj": [], "recon": [], "eval3d": [],
              "evaltraj": []}
    for epoch in range(SEMI_EPOCHS):
        skip = epoch < SEMI_WARMUP
        momentum = _semi_bn_momentum(epoch)
        e_pos = e_traj = e_recon = 0.0
        n = n_semi = 0
        for meta, n_valid in sampler.next_epoch():
            meta_semi, n_valid_semi = next(semi_iter)
            (all_params, all_states, opt_state, step_rng,
             loss_pos, loss_traj, loss_recon, _lt) = trainer.step(
                all_params, all_states, opt_state, step_rng, dev, dev_semi,
                meta, n_valid, meta_semi, n_valid_semi, momentum, skip)
            e_pos += n_valid * float(loss_pos)
            e_traj += n_valid * float(loss_traj)
            n += n_valid
            if skip:
                n_semi += 1
            else:
                e_recon += n_valid_semi * float(loss_recon)
                n_semi += n_valid_semi
        hist_j["pos"].append(e_pos / n)
        hist_j["traj"].append(e_traj / n)
        hist_j["recon"].append(e_recon / n_semi)

        e3d = etraj = 0.0
        nf = 0
        for _, batch_3d, batch_2d, nfr in eval_batcher.next_epoch():
            pred = evaluator.predict(all_params["pos"], all_states["pos"],
                                     batch_2d, augment=False)[:, :nfr]
            pred_tr = traj_evaluator.predict(
                all_params["traj"], all_states["traj"], batch_2d,
                augment=False)[:, :nfr]
            target = np.asarray(batch_3d, np.float32).copy()
            traj_target = target[:, :, :1].copy()
            target[:, :, 0] = 0.0
            e3d += nfr * mpjpe_np(pred, target)
            etraj += nfr * mpjpe_np(pred_tr, traj_target)
            nf += nfr
        hist_j["eval3d"].append(e3d / nf)
        hist_j["evaltraj"].append(etraj / nf)

        lr_j *= SEMI_LR_DECAY
        opt_state = set_learning_rate(opt_state, lr_j)

    for key in ("pos", "traj", "eval3d", "evaltraj"):
        np.testing.assert_allclose(hist_j[key], hist_t[key], rtol=1.5e-3,
                                   err_msg=key)
    # Reconstruction loss exists only after warmup.
    assert hist_t["recon"][0] == 0.0 and hist_j["recon"][0] == 0.0
    np.testing.assert_allclose(hist_j["recon"][1:], hist_t["recon"][1:],
                               rtol=1.5e-3)
