"""Deterministic supervised-training scenario shared by the 2-process
``jax.distributed`` test and its single-process control run.

Used by ``tests/test_distributed.py`` (in-process, 8 virtual devices) and
``tests/dist_worker.py`` (2 processes x 4 virtual devices under a localhost
coordinator).  Both runs execute exactly this code, so any numeric divergence
isolates the multi-process path: global-array descriptor feeds
(``train._feed``), pod-wide jit, Gloo collectives, and the checkpoint
round trip across the process boundary.

Dropout is off: f32 summation order differs between shardings, so the runs
compare with ``allclose`` (2e-6), like ``tests/test_train.py``'s
single-process mesh-equivalence test.
"""

import numpy as np

import jax
import jax.numpy as jnp

ARC = (3, 3)
CHANNELS = 16
BATCH = 16
# lengths (14, 10) -> 24 chunk pairs, x2 flip augmentation = 48 -> 3 batches.
LENGTHS = (14, 10)
EPOCH_STEPS = 3


def _toy_data():
    rng = np.random.default_rng(7)
    poses_2d = [rng.standard_normal((n, 17, 2)).astype(np.float32)
                for n in LENGTHS]
    poses_3d = [rng.standard_normal((n, 17, 3)).astype(np.float32)
                for n in LENGTHS]
    return poses_2d, poses_3d


def _flip_perm():
    perm = np.arange(17)
    perm[1:9] = np.arange(9, 17)
    perm[9:17] = np.arange(1, 9)
    return perm


def run_scenario(mesh, *, epochs=2, checkpoint_path=None, resume_from=None):
    """Run ``epochs`` epochs (3 steps each) of supervised training over ``mesh``.

    Args:
      checkpoint_path: if set, write a runner-style checkpoint (weights +
        optimizer + sampler RNG + step rng) after the FIRST epoch, exercising
        the device->host fetch of pod-replicated arrays.
      resume_from: restore from this checkpoint file and run only the
        remaining epochs (epoch counter from the payload).

    Returns:
      dict with "losses" (per-step f64 list over the epochs actually run),
      "params" / "state" host pytrees.
    """
    from videopose3d_tpu.checkpoint import (load_checkpoint, restore_into,
                                            save_checkpoint)
    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset)
    from videopose3d_tpu.models.convert import (params_from_torch_state_dict,
                                                params_to_torch_state_dict)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.parallel import replicated_sharding
    from videopose3d_tpu.train import (SupervisedTrainer, TrainLoopConfig,
                                       bn_momentum_for_epoch,
                                       set_learning_rate)

    # Pin the PRNG impl: runner e2e tests set jax_default_prng_impl="rbg"
    # globally in this process, and legacy PRNGKey arrays take their meaning
    # from that flag at USE time — without the pin, a full-suite run computes
    # the in-process control leg with different keys than the workers.
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=ARC, dropout=0.0, channels=CHANNELS)
    pad = (receptive_field(cfg) - 1) // 2
    loop = TrainLoopConfig(batch_size=BATCH, chunk_length=1, pad=pad,
                           causal_shift=0, epochs=epochs, learning_rate=1e-3)

    poses_2d, poses_3d = _toy_data()
    perm = _flip_perm()
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm))
    dev = ds.to_device(replicated_sharding(mesh))
    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], BATCH, 1,
                                 augment=True)
    trainer = SupervisedTrainer(cfg, loop, perm, perm, mesh=mesh)

    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(1)
    lr = loop.learning_rate
    epoch = 0

    if resume_from is not None:
        chk = load_checkpoint(resume_from)
        epoch = int(chk["epoch"])
        lr = float(chk["lr"])
        params, state = params_from_torch_state_dict(cfg, chk["model_pos"])
        opt_state = restore_into(opt_state, chk["optimizer"])
        sampler.set_random_state(chk["random_state"])
        step_rng = jnp.asarray(chk["step_rng"])
        opt_state = set_learning_rate(opt_state, lr)

    losses = []
    while epoch < epochs:
        momentum = bn_momentum_for_epoch(loop, epoch - 1)
        for meta, n_valid in sampler.next_epoch():
            params, state, opt_state, step_rng, loss = trainer.step(
                params, state, opt_state, step_rng, dev, meta, n_valid,
                momentum)
            losses.append(float(loss))
        lr *= loop.lr_decay
        opt_state = set_learning_rate(opt_state, lr)
        epoch += 1

        if checkpoint_path is not None and epoch == 1:
            save_checkpoint(checkpoint_path, {
                "epoch": epoch,
                "lr": lr,
                "random_state": sampler.random_state(),
                "optimizer": jax.tree_util.tree_map(np.asarray, opt_state),
                "model_pos": params_to_torch_state_dict(params, state),
                "step_rng": np.asarray(step_rng),
            })

    return {
        "losses": losses,
        "params": jax.tree_util.tree_map(np.asarray, params),
        "state": jax.tree_util.tree_map(np.asarray, state),
    }


def run_scenario_scan(mesh, *, epochs=2):
    """Epoch-as-one-XLA-scan variant of :func:`run_scenario`: each epoch's 3
    steps execute as ONE ``lax.scan`` program over the stacked descriptors
    (``SupervisedTrainer.run_epoch``) on the pod-wide mesh.  Numerically this
    must match the stepwise path, so its results are compared against the
    single-process *stepwise* control too."""
    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.parallel import replicated_sharding
    from videopose3d_tpu.train import (SupervisedTrainer, TrainLoopConfig,
                                       bn_momentum_for_epoch,
                                       set_learning_rate)

    jax.config.update("jax_default_prng_impl", "threefry2x32")

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=ARC, dropout=0.0, channels=CHANNELS)
    pad = (receptive_field(cfg) - 1) // 2
    loop = TrainLoopConfig(batch_size=BATCH, chunk_length=1, pad=pad,
                           causal_shift=0, epochs=epochs, learning_rate=1e-3)

    poses_2d, poses_3d = _toy_data()
    perm = _flip_perm()
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm))
    dev = ds.to_device(replicated_sharding(mesh))
    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], BATCH, 1,
                                 augment=True)
    trainer = SupervisedTrainer(cfg, loop, perm, perm, mesh=mesh)

    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(1)
    lr = loop.learning_rate

    losses = []
    for epoch in range(epochs):
        momentum = bn_momentum_for_epoch(loop, epoch - 1)
        metas, n_valids = [], []
        for meta, n_valid in sampler.next_epoch():
            metas.append(meta)
            n_valids.append(n_valid)
        params, state, opt_state, step_rng, epoch_losses = trainer.run_epoch(
            params, state, opt_state, step_rng, dev,
            np.stack(metas), np.array(n_valids), momentum)
        losses.extend(float(l) for l in np.asarray(epoch_losses))
        lr *= loop.lr_decay
        opt_state = set_learning_rate(opt_state, lr)

    return {
        "losses": losses,
        "params": jax.tree_util.tree_map(np.asarray, params),
        "state": jax.tree_util.tree_map(np.asarray, state),
    }


def run_scenario_semi(mesh, *, epochs=2, warmup=1):
    """Semi-supervised scenario on the pod mesh: a warmup epoch (unlabeled
    branch skipped) then full joint pos+traj+reprojection epochs, with the
    endless unlabeled sampler crossing its permutation boundary mid-run —
    the ``/root/reference/run.py:319-398`` loop semantics under
    ``process_count > 1``."""
    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.parallel import replicated_sharding
    from videopose3d_tpu.train import (SemiSupervisedTrainer, TrainLoopConfig,
                                       bn_momentum_for_epoch,
                                       set_learning_rate)

    jax.config.update("jax_default_prng_impl", "threefry2x32")

    rng = np.random.default_rng(21)
    poses_2d, poses_3d = _toy_data()
    # Cameras: (cx, cy, fx, fy)-style 9-vector intrinsics per sequence, plus
    # rooted 3D so the trajectory model has a meaningful target.
    cams = [np.asarray([1.145, 1.145, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                       np.float32) for _ in poses_2d]
    poses_3d = [p + np.array([0, 0, 4], np.float32) for p in poses_3d]
    poses_2d_semi = [rng.standard_normal((n, 17, 2)).astype(np.float32) * 0.5
                     for n in LENGTHS]

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=ARC, dropout=0.0, channels=CHANNELS)
    traj_cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=1,
        filter_widths=ARC, dropout=0.0, channels=CHANNELS)
    pad = (receptive_field(cfg) - 1) // 2
    loop = TrainLoopConfig(batch_size=BATCH, chunk_length=1, pad=pad,
                           causal_shift=0, epochs=epochs, learning_rate=1e-3,
                           warmup=warmup)
    perm = _flip_perm()
    parents = np.array([-1] + list(range(16)))

    sharding = replicated_sharding(mesh)
    dev = FlatSequenceDataset(
        poses_2d, poses_3d, cams,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm)).to_device(sharding)
    dev_semi = FlatSequenceDataset(
        poses_2d_semi, None, cams,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm)).to_device(sharding)

    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], BATCH, 1,
                                 augment=True)
    sampler_semi = ChunkedPairSampler(
        [p.shape[0] for p in poses_2d_semi], BATCH, 1, augment=True,
        random_seed=4321, endless=True)
    semi_stream = sampler_semi.next_epoch()

    trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop, perm, perm,
                                    parents, mesh=mesh)
    params = {}
    params["pos"], st_pos = init_temporal_model(cfg, jax.random.PRNGKey(0))
    params["traj"], st_traj = init_temporal_model(
        traj_cfg, jax.random.PRNGKey(3))
    states = {"pos": st_pos, "traj": st_traj}
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(2)
    lr = loop.learning_rate

    losses = []
    for epoch in range(epochs):
        momentum = bn_momentum_for_epoch(loop, epoch - 1)
        skip = epoch < warmup
        for meta, n_valid in sampler.next_epoch():
            meta_semi, n_valid_semi = next(semi_stream)
            (params, states, opt_state, step_rng,
             loss_pos, loss_traj, loss_recon, loss_total) = trainer.step(
                params, states, opt_state, step_rng, dev, dev_semi,
                meta, n_valid, meta_semi, n_valid_semi, momentum, skip)
            losses.append([float(loss_pos), float(loss_traj),
                           float(loss_recon), float(loss_total)])
        lr *= loop.lr_decay
        opt_state = set_learning_rate(opt_state, lr)

    return {
        "losses": losses,
        "params": jax.tree_util.tree_map(np.asarray, params),
        "states": jax.tree_util.tree_map(np.asarray, states),
    }
