"""Unit tests for the Pallas DMA window gather (ops/pallas/gather_rows).

Pure data movement: output must be BITWISE equal to the XLA gather for every
sub-sublane phase, both dtypes, and the boundary windows the aligned-floor
DMA clamp exists for.  Runs in interpret mode on CPU (the real-TPU compile +
A/B lives in tools/exp_pallas_gather.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videopose3d_tpu.ops.pallas.gather_rows import (GATHER_TAIL_MARGIN,
                                                    gather_windows)


def _ref(flat, row0, window):
    return jnp.stack([
        jax.lax.dynamic_slice(flat, (int(r), 0), (window, flat.shape[1]))
        for r in np.asarray(row0)])


@pytest.mark.parametrize("dtype,align", [(jnp.float32, 8), (jnp.bfloat16, 16)])
def test_bitwise_parity_all_phases(dtype, align):
    rng = np.random.default_rng(0)
    R, C, W = 4096, 34, 243
    flat = jnp.asarray(rng.standard_normal((R, C))).astype(dtype)
    r_max = R - W - (align - 1)
    # Every phase p in [0, align) plus random rows plus both extremes.
    row0 = np.concatenate([
        np.arange(align, dtype=np.int32) + 128,
        rng.integers(0, r_max, 16).astype(np.int32),
        np.asarray([0, r_max - 1, r_max - align], np.int32)])
    out = gather_windows(flat, jnp.asarray(row0), window=W, interpret=True)
    assert out.dtype == jnp.dtype(dtype)
    assert bool((out == _ref(flat, row0, W)).all())


def test_out_cols_lane_pad_slice():
    # TPU callers pass a lane-padded (R, 128) stream and slice back to the
    # logical width in-kernel; values must match the narrow gather exactly.
    rng = np.random.default_rng(2)
    R, C, W, out_c = 2048, 128, 121, 34
    flat = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    row0 = jnp.asarray(rng.integers(0, R - W - 7, 32).astype(np.int32))
    out = gather_windows(flat, row0, window=W, out_cols=out_c, interpret=True)
    assert out.shape == (32, W, out_c)
    ref = _ref(flat, row0, W)[:, :, :out_c]
    assert bool((out == ref).all())


def test_window_one_rows():
    # The 3D-target stream gathers window=chunk_length (default 1) rows —
    # the smallest window the DMA form ever issues.
    rng = np.random.default_rng(4)
    flat = jnp.asarray(rng.standard_normal((2048, 128)).astype(np.float32))
    row0 = jnp.asarray(rng.integers(0, 2048 - 1 - 7, 64).astype(np.int32))
    out = gather_windows(flat, row0, window=1, out_cols=51, interpret=True)
    assert out.shape == (64, 1, 51)
    assert bool((out == _ref(flat, row0, 1)[:, :, :51]).all())


def test_small_batch_below_nbuf():
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.standard_normal((1024, 16)).astype(np.float32))
    row0 = jnp.asarray([3, 900], jnp.int32)
    out = gather_windows(flat, row0, window=64, nbuf=8, interpret=True)
    assert bool((out == _ref(flat, row0, 64)).all())


def test_guards():
    flat3 = jnp.zeros((64, 17, 2), jnp.float32)
    with pytest.raises(ValueError, match="rank-2"):
        gather_windows(flat3, jnp.zeros((4,), jnp.int32), window=8,
                       interpret=True)
    with pytest.raises(ValueError, match="unsupported dtype"):
        gather_windows(jnp.zeros((64, 8), jnp.int8),
                       jnp.zeros((4,), jnp.int32), window=8, interpret=True)
    with pytest.raises(ValueError, match="rows"):
        gather_windows(jnp.zeros((16, 8), jnp.float32),
                       jnp.zeros((4,), jnp.int32), window=32, interpret=True)


def test_out_of_contract_rows_clamp_not_crash():
    # Rows past the tail-margin contract degrade to a shifted window (the
    # DMA clamps to the last aligned start); they must never read OOB.
    flat = jnp.asarray(np.arange(512 * 8, dtype=np.float32).reshape(512, 8))
    row0 = jnp.asarray([512 - 16], jnp.int32)  # window end past R
    out = gather_windows(flat, row0, window=32, interpret=True)
    assert out.shape == (1, 32, 8)
    assert bool(jnp.isfinite(out).all())


def test_tail_margin_constant():
    # to_device(flatten_2d=True) relies on this covering both dtypes' sublanes.
    assert GATHER_TAIL_MARGIN >= 16


class TestTrainerGather:
    """gather_impl plumbing: the Pallas gather slots into the supervised
    trainer bitwise-identically, and the guards reject ineligible setups."""

    def _fixture(self):
        from videopose3d_tpu.data import (ChunkedPairSampler,
                                          FlatSequenceDataset)
        from videopose3d_tpu.models import (TemporalModelConfig,
                                            init_temporal_model,
                                            receptive_field)
        from videopose3d_tpu.train import SupervisedTrainer, TrainLoopConfig

        rng = np.random.default_rng(3)
        j = 17
        poses_2d = [rng.standard_normal((n, j, 2)).astype(np.float32)
                    for n in (50, 71)]
        poses_3d = [0.1 * rng.standard_normal((p.shape[0], j, 3))
                    .astype(np.float32) for p in poses_2d]
        cfg = TemporalModelConfig(num_joints_in=j, in_features=2,
                                  num_joints_out=j, filter_widths=(3, 3),
                                  dropout=0.25, channels=16)
        pad = (receptive_field(cfg) - 1) // 2
        perm = tuple(range(j))
        ds = FlatSequenceDataset(
            poses_2d, poses_3d,
            margins=FlatSequenceDataset.training_margins(pad, 0, 1),
            flip_perms=(perm, perm))
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1,
                                     augment=True)
        metas, n_valids = zip(*sampler.next_epoch())
        return (cfg, pad, perm, ds, metas[:3], n_valids[:3],
                TrainLoopConfig, SupervisedTrainer, init_temporal_model)

    def test_trainer_bitwise_equal(self):
        """Five variants, one loss/params trajectory: XLA on the compact
        stream, interpreted Pallas on it, both impls on the lane-padded
        stream (the TPU production form — the pad columns must be invisible),
        and interpreted Pallas with the 3D target stream flattened too.
        """
        (cfg, pad, perm, ds, metas, n_valids, TrainLoopConfig,
         SupervisedTrainer, init_temporal_model) = self._fixture()
        dev = ds.to_device(flatten_2d=True)
        dev_pad = ds.to_device(flatten_2d=True, lane_pad_2d=True)
        dev_3d = ds.to_device(flatten_2d=True, lane_pad_2d=True,
                              flatten_3d=True, lane_pad_3d=True)
        assert dev.gather_margin_2d >= 16
        assert dev_pad.flat_2d_padded.shape[1] == 128
        assert dev_pad.cols_2d == 34
        assert dev_3d.flat_3d_padded.shape[1] == 128
        assert dev_3d.cols_3d == 51 and dev_3d.gather_margin_3d >= 16

        results = []
        for impl, d in (("xla", dev), ("pallas_interpret", dev),
                        ("xla", dev_pad), ("pallas_interpret", dev_pad),
                        ("pallas_interpret", dev_3d)):
            loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                                   causal_shift=0, gather_impl=impl)
            trainer = SupervisedTrainer(cfg, loop, np.asarray(perm),
                                        np.asarray(perm))
            p, s = init_temporal_model(cfg, jax.random.PRNGKey(0))
            o = trainer.init_optimizer(p)
            k = jax.random.PRNGKey(1)
            losses = []
            for meta, n_valid in zip(metas, n_valids):
                p, s, o, k, loss = trainer.step(p, s, o, k, d, meta,
                                                n_valid, 0.1)
                losses.append(float(loss))
            results.append((losses, p))
        for losses, params in results[1:]:
            assert losses == results[0][0]
            for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                            jax.tree_util.tree_leaves(params)):
                assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_forced_pallas_requires_flattened_stream(self):
        (cfg, pad, perm, ds, metas, n_valids, TrainLoopConfig,
         SupervisedTrainer, init_temporal_model) = self._fixture()
        dev = ds.to_device()  # rank-3 stream, no DMA margin
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0,
                               gather_impl="pallas_interpret")
        trainer = SupervisedTrainer(cfg, loop, np.asarray(perm),
                                    np.asarray(perm))
        p, s = init_temporal_model(cfg, jax.random.PRNGKey(0))
        o = trainer.init_optimizer(p)
        with pytest.raises(ValueError, match="flatten"):
            trainer.step(p, s, o, jax.random.PRNGKey(1), dev, metas[0],
                         n_valids[0], 0.1)

    def test_bad_config_name_rejected(self):
        from videopose3d_tpu.train import TrainLoopConfig
        with pytest.raises(ValueError, match="gather_impl"):
            TrainLoopConfig(batch_size=16, chunk_length=1, pad=4,
                            causal_shift=0, gather_impl="dma")


class TestSemiTrainerGather:
    """The semi-supervised trainer gathers flattened streams and restores the
    joint axis in-assembly (its unlabeled keypoints double as the
    reprojection target): three variants must share one bitwise loss/params
    trajectory — the unflattened XLA baseline, the flattened+lane-padded
    XLA form, and the interpreted Pallas DMA form on the same upload."""

    def test_semi_trainer_bitwise_equal(self):
        from videopose3d_tpu.data import (ChunkedPairSampler,
                                          FlatSequenceDataset)
        from videopose3d_tpu.models import (TemporalModelConfig,
                                            init_temporal_model,
                                            receptive_field)
        from videopose3d_tpu.train import (SemiSupervisedTrainer,
                                           TrainLoopConfig)

        rng = np.random.default_rng(7)
        j = 17
        cams, poses_2d, poses_3d = [], [], []
        for n in (60, 81):
            p3 = (0.1 * rng.standard_normal((n, j, 3))
                  + np.array([0, 0, 4.0])).astype(np.float32)
            poses_3d.append(p3)
            poses_2d.append(p3[..., :2].astype(np.float32))
            cams.append(np.array([1.1, 1.1, 0.02, 0.0, 0.0, 0.0, 0.0, 0.0,
                                  0.0], np.float32))
        poses_2d_semi = [p + 0.01 for p in poses_2d]
        cfg = TemporalModelConfig(num_joints_in=j, in_features=2,
                                  num_joints_out=j, filter_widths=(3, 3),
                                  dropout=0.25, channels=16)
        traj_cfg = TemporalModelConfig(num_joints_in=j, in_features=2,
                                       num_joints_out=1, filter_widths=(3, 3),
                                       dropout=0.25, channels=16)
        pad = (receptive_field(cfg) - 1) // 2
        perm = tuple(range(j))
        margins = FlatSequenceDataset.training_margins(pad, 0, 1)

        ds = FlatSequenceDataset(poses_2d, poses_3d, cams, margins=margins,
                                 flip_perms=(perm, perm))
        ds_semi = FlatSequenceDataset(poses_2d_semi, None, cams,
                                      margins=margins,
                                      flip_perms=(perm, perm))
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1,
                                     augment=True)
        sampler_semi = ChunkedPairSampler(
            [p.shape[0] for p in poses_2d_semi], 16, 1, random_seed=4321,
            augment=True, endless=True)
        metas, n_valids = zip(*sampler.next_epoch())
        semi_iter = sampler_semi.next_epoch()
        metas_semi, n_valids_semi = zip(*(next(semi_iter) for _ in metas))

        variants = {
            "xla_rank4": ("xla", ds.to_device(), ds_semi.to_device()),
            "xla_flat": ("xla",
                         ds.to_device(flatten_2d=True, lane_pad_2d=True,
                                      flatten_3d=True, lane_pad_3d=True),
                         ds_semi.to_device(flatten_2d=True,
                                           lane_pad_2d=True)),
            "pallas_flat": ("pallas_interpret",
                            ds.to_device(flatten_2d=True, lane_pad_2d=True,
                                         flatten_3d=True, lane_pad_3d=True),
                            ds_semi.to_device(flatten_2d=True,
                                              lane_pad_2d=True)),
        }
        results = {}
        for name, (impl, dev, dev_semi) in variants.items():
            loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                                   causal_shift=0, warmup=0,
                                   gather_impl=impl)
            trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop,
                                            np.asarray(perm),
                                            np.asarray(perm),
                                            np.array([-1] + list(range(j - 1))))
            params = {}
            params["pos"], s_pos = init_temporal_model(
                cfg, jax.random.PRNGKey(0))
            params["traj"], s_traj = init_temporal_model(
                traj_cfg, jax.random.PRNGKey(1))
            states = {"pos": s_pos, "traj": s_traj}
            opt = trainer.init_optimizer(params)
            key = jax.random.PRNGKey(2)
            losses = []
            for meta, n_valid, meta_semi, n_valid_semi in zip(
                    metas, n_valids, metas_semi, n_valids_semi):
                (params, states, opt, key, loss_pos, loss_traj, loss_recon,
                 loss_total) = trainer.step(
                    params, states, opt, key, dev, dev_semi, meta, n_valid,
                    meta_semi, n_valid_semi, 0.1, False)
                losses.append((float(loss_pos), float(loss_traj),
                               float(loss_recon), float(loss_total)))
            results[name] = (losses, params)

        ref_losses, ref_params = results["xla_rank4"]
        assert ref_losses[0][2] > 0.0  # reconstruction loss active
        for name in ("xla_flat", "pallas_flat"):
            losses, params = results[name]
            assert losses == ref_losses, name
            for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                            jax.tree_util.tree_leaves(params)):
                assert np.array_equal(np.asarray(a), np.asarray(b))
