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
