"""Training-engine smoke tests on synthetic data: supervised + semi-supervised
steps run under jit, losses decrease on a learnable toy problem, schedules follow
the reference formulas, and the data-parallel path works on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videopose3d_tpu.data import FlatSequenceDataset, ChunkedPairSampler
from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, receptive_field, forward_dilated,
)
from videopose3d_tpu.train import (
    TrainLoopConfig, SupervisedTrainer, SemiSupervisedTrainer,
    bn_momentum_for_epoch, set_learning_rate,
)
from videopose3d_tpu.evaluate import Evaluator, evaluate
from videopose3d_tpu.data.generators import UnchunkedBatcher
from videopose3d_tpu.parallel import make_mesh

J = 17


def _toy_data(rng, n_seqs=3, min_len=40, max_len=80):
    """3D poses whose 2D projection is a fixed linear map — learnable signal."""
    lengths = rng.integers(min_len, max_len, n_seqs)
    poses_3d, poses_2d, cams = [], [], []
    for l in lengths:
        p3 = 0.1 * rng.standard_normal((l, J, 3)).astype(np.float32)
        p2 = p3[..., :2] * 2.0 + 0.05
        poses_3d.append(p3)
        poses_2d.append(p2.astype(np.float32))
        cams.append(np.array([1.1, 1.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                             np.float32))
    return poses_2d, poses_3d, cams


def _perm():
    perm = np.arange(J)
    left, right = [1, 3, 5], [2, 4, 6]
    perm[left] = right
    perm[right] = left
    return perm


def _model_cfg(fw=(3, 3), channels=16, dropout=0.25):
    return TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=J,
                               filter_widths=fw, dropout=dropout,
                               channels=channels)


class TestSupervised:
    def test_loss_decreases(self):
        rng = np.random.default_rng(0)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg()
        rf = receptive_field(cfg)
        pad = (rf - 1) // 2
        loop = TrainLoopConfig(batch_size=32, chunk_length=1, pad=pad,
                               causal_shift=0, learning_rate=1e-3)

        ds = FlatSequenceDataset(poses_2d, poses_3d)
        dev = ds.to_device()
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 32, 1,
                                     augment=True)
        perm = _perm()
        trainer = SupervisedTrainer(cfg, loop, perm, perm)

        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(1)

        losses = []
        for epoch in range(3):
            mom = bn_momentum_for_epoch(loop, epoch)
            epoch_losses = []
            for meta, n_valid in sampler.next_epoch():
                params, state, opt_state, step_rng, loss = trainer.step(
                    params, state, opt_state, step_rng, dev, meta, n_valid, mom)
                epoch_losses.append(loss)
            losses.append(float(np.mean([np.asarray(l) for l in epoch_losses])))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_lr_schedule(self):
        cfg = _model_cfg()
        loop = TrainLoopConfig(batch_size=8, chunk_length=1, pad=4,
                               causal_shift=0, learning_rate=1e-3, lr_decay=0.95)
        trainer = SupervisedTrainer(cfg, loop, _perm(), _perm())
        params, _ = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt_state = trainer.init_optimizer(params)
        opt_state = set_learning_rate(opt_state, 1e-3 * 0.95)
        assert abs(float(opt_state.hyperparams["learning_rate"]) - 9.5e-4) < 1e-9

    def test_bn_momentum_schedule(self):
        # Reference formula (run.py:589-591): momentum after last epoch = 0.001.
        loop = TrainLoopConfig(batch_size=8, chunk_length=1, pad=4,
                               causal_shift=0, epochs=60)
        m0 = bn_momentum_for_epoch(loop, 0)
        m_last = bn_momentum_for_epoch(loop, 59)
        assert 0.09 < m0 < 0.1
        assert abs(m_last - 0.001) < 1e-9

    def test_multichip_mesh(self):
        """Data-parallel step over the virtual 8-device CPU mesh."""
        assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh()
        rng = np.random.default_rng(2)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg()
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0)

        from videopose3d_tpu.parallel import replicated_sharding
        ds = FlatSequenceDataset(poses_2d, poses_3d)
        dev = ds.to_device(replicated_sharding(mesh))
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1)
        trainer = SupervisedTrainer(cfg, loop, _perm(), _perm(), mesh=mesh)

        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(1)
        for meta, n_valid in sampler.next_epoch():
            params, state, opt_state, step_rng, loss = trainer.step(
                params, state, opt_state, step_rng, dev, meta, n_valid, 0.1)
        assert np.isfinite(float(loss))

    def test_multichip_mesh_baked_flip(self):
        """DP step over the mesh with the contiguous + flip-as-index dataset
        (the production training configuration)."""
        mesh = make_mesh()
        rng = np.random.default_rng(3)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg()
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0)

        from videopose3d_tpu.parallel import replicated_sharding
        perm = tuple(_perm().tolist())
        ds = FlatSequenceDataset(
            poses_2d, poses_3d,
            margins=FlatSequenceDataset.training_margins(pad, 0, 1),
            flip_perms=(perm, perm))
        dev = ds.to_device(replicated_sharding(mesh))
        assert dev.has_baked_flip
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1,
                                     augment=True)
        trainer = SupervisedTrainer(cfg, loop, _perm(), _perm(), mesh=mesh)

        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(1)
        metas, n_valids = zip(*sampler.next_epoch())
        params, state, opt_state, step_rng, losses = trainer.run_epoch(
            params, state, opt_state, step_rng, dev, np.stack(metas),
            np.array(n_valids), 0.1)
        assert np.isfinite(np.asarray(losses)).all()


class TestFlatten2D:
    def test_bitwise_equal_and_guards(self):
        """to_device(flatten_2d=True) stores the padded 2D stream as
        (rows, J*F); the training trajectory is bitwise identical to the
        (rows, J, 2) layout (values untouched — only the gather output shape
        changes; models/temporal.py::_prep_input accepts both)."""
        rng = np.random.default_rng(11)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg()
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0)
        perm = tuple(_perm().tolist())
        ds = FlatSequenceDataset(
            poses_2d, poses_3d,
            margins=FlatSequenceDataset.training_margins(pad, 0, 1),
            flip_perms=(perm, perm))
        dev_a = ds.to_device()
        dev_b = ds.to_device(flatten_2d=True)
        assert dev_b.flat_2d_padded.ndim == 2
        assert dev_b.flat_2d_padded.shape[1] == J * 2

        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1,
                                     augment=True)
        metas, n_valids = zip(*sampler.next_epoch())
        trainer = SupervisedTrainer(cfg, loop, _perm(), _perm())
        params0, state0 = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt0 = trainer.init_optimizer(params0)

        results = []
        for dev in (dev_a, dev_b):
            p, s, o = jax.tree_util.tree_map(jnp.copy, (params0, state0, opt0))
            k = jax.random.PRNGKey(1)
            losses = []
            for meta, n_valid in zip(metas, n_valids):
                p, s, o, k, loss = trainer.step(p, s, o, k, dev, meta,
                                                n_valid, 0.1)
                losses.append(float(loss))
            results.append((losses, p))
        assert results[0][0] == results[1][0]
        for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                        jax.tree_util.tree_leaves(results[1][1])):
            assert np.array_equal(np.asarray(a), np.asarray(b))

        # Guards: the on-device flip permutation needs the joint axis, so
        # flatten requires baked flip copies and forbids the unpadded path.
        plain = FlatSequenceDataset(poses_2d, poses_3d)
        with pytest.raises(ValueError, match="baked flip"):
            plain.to_device(flatten_2d=True)
        with pytest.raises(ValueError, match="include_unpadded"):
            ds.to_device(flatten_2d=True, include_unpadded=True)


class TestEpochScan:
    def test_scan_epoch_equals_stepwise(self):
        """run_epoch (one fused XLA scan) produces bit-identical params, state,
        and losses to the step-by-step path."""
        rng = np.random.default_rng(7)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg(dropout=0.25)
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0)
        dev = FlatSequenceDataset(poses_2d, poses_3d).to_device()
        perm = _perm()
        trainer = SupervisedTrainer(cfg, loop, perm, perm)

        metas, n_valids = [], []
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1,
                                     augment=True)
        for meta, n_valid in sampler.next_epoch():
            metas.append(meta)
            n_valids.append(n_valid)

        params0, state0 = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt0 = trainer.init_optimizer(params0)

        p_a, s_a, o_a = jax.tree_util.tree_map(jnp.copy, (params0, state0, opt0))
        rng_a = jax.random.PRNGKey(1)
        losses_a = []
        for meta, n_valid in zip(metas, n_valids):
            p_a, s_a, o_a, rng_a, loss = trainer.step(
                p_a, s_a, o_a, rng_a, dev, meta, n_valid, 0.1)
            losses_a.append(float(loss))

        p_b, s_b, o_b, rng_b, losses_b = trainer.run_epoch(
            params0, state0, opt0, jax.random.PRNGKey(1), dev,
            np.stack(metas), np.array(n_valids), 0.1)

        np.testing.assert_allclose(np.asarray(losses_b), losses_a, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_a),
                        jax.tree_util.tree_leaves(p_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_a),
                        jax.tree_util.tree_leaves(s_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_scan_segments_cover_exactly(self):
        from videopose3d_tpu.train import _scan_segments
        assert list(_scan_segments(7, 0)) == [(0, 7)]
        assert list(_scan_segments(7, 7)) == [(0, 7)]
        assert list(_scan_segments(7, 10)) == [(0, 7)]
        assert list(_scan_segments(7, 3)) == [(0, 3), (3, 6), (6, 7)]
        assert list(_scan_segments(6, 3)) == [(0, 3), (3, 6)]

    def test_scan_chunking_is_bit_identical(self):
        """scan_chunk splits the epoch into several bounded device programs;
        the scan is sequential and params/rng thread through segment
        boundaries, so the result must be BITWISE equal to one long scan."""
        rng = np.random.default_rng(11)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg(dropout=0.25)
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0)
        dev = FlatSequenceDataset(poses_2d, poses_3d).to_device()
        perm = _perm()
        trainer = SupervisedTrainer(cfg, loop, perm, perm)

        metas, n_valids = [], []
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1,
                                     augment=True)
        for meta, n_valid in sampler.next_epoch():
            metas.append(meta)
            n_valids.append(n_valid)
        metas = np.stack(metas)
        n_valids = np.array(n_valids)
        # A chunk size that does NOT divide the step count exercises the
        # remainder-length program too.
        assert metas.shape[0] % 3 != 0 or metas.shape[0] > 3

        params0, state0 = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt0 = trainer.init_optimizer(params0)

        def run(chunk):
            p, s, o = jax.tree_util.tree_map(
                jnp.copy, (params0, state0, opt0))
            p, s, o, r, losses = trainer.run_epoch(
                p, s, o, jax.random.PRNGKey(1), dev, metas, n_valids, 0.1,
                scan_chunk=chunk)
            return (jax.tree_util.tree_map(np.asarray, (p, s, o, r)),
                    np.asarray(losses))

        (ref_tree, ref_losses) = run(0)
        for chunk in (3, metas.shape[0] - 1):
            (tree, losses) = run(chunk)
            np.testing.assert_array_equal(losses, ref_losses)
            for a, b in zip(jax.tree_util.tree_leaves(ref_tree),
                            jax.tree_util.tree_leaves(tree)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSemiSupervised:
    def test_warmup_and_full_step(self):
        rng = np.random.default_rng(3)
        poses_2d, poses_3d, cams = _toy_data(rng)
        poses_2d_semi = [p + 0.01 for p in poses_2d[:2]]
        cams_semi = cams[:2]

        cfg = _model_cfg()
        traj_cfg = TemporalModelConfig(
            num_joints_in=J, in_features=2, num_joints_out=1,
            filter_widths=cfg.filter_widths, dropout=cfg.dropout,
            channels=cfg.channels)
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=8, chunk_length=1, pad=pad,
                               causal_shift=0, warmup=1)

        # Make depths positive so 1/z is sane.
        poses_3d = [p + np.array([0, 0, 4], np.float32) for p in poses_3d]

        dev = FlatSequenceDataset(poses_2d, poses_3d, cams).to_device()
        dev_semi = FlatSequenceDataset(poses_2d_semi, None, cams_semi).to_device()
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 8, 1)
        sampler_semi = ChunkedPairSampler([p.shape[0] for p in poses_2d_semi], 8, 1,
                                          random_seed=4321, endless=True)

        parents = np.array([-1] + list(range(J - 1)))
        trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop, _perm(), _perm(),
                                        parents)
        params = {"pos": None, "traj": None}
        states = {}
        params["pos"], states_pos = init_temporal_model(cfg, jax.random.PRNGKey(0))
        params["traj"], states_traj = init_temporal_model(traj_cfg,
                                                          jax.random.PRNGKey(1))
        states = {"pos": states_pos, "traj": states_traj}
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(2)

        semi_iter = sampler_semi.next_epoch()
        for epoch in range(2):
            skip = epoch < loop.warmup
            for meta, n_valid in sampler.next_epoch():
                meta_semi, n_valid_semi = next(semi_iter)
                (params, states, opt_state, step_rng,
                 loss_pos, loss_traj, loss_recon, loss_total) = trainer.step(
                    params, states, opt_state, step_rng, dev, dev_semi,
                    meta, n_valid, meta_semi, n_valid_semi, 0.1, skip)
                assert np.isfinite(float(loss_pos))
                assert np.isfinite(float(loss_traj))
            if not skip:
                assert np.isfinite(float(loss_recon))
                assert float(loss_recon) > 0.0

    @pytest.mark.slow
    def test_semi_scan_chunking_is_bit_identical(self):
        """Chunked semi-supervised epoch scan == one long scan, bitwise
        (params of both models, BN states, all four per-step loss vectors)."""
        rng = np.random.default_rng(9)
        poses_2d, poses_3d, cams = _toy_data(rng)
        poses_2d_semi = [p + 0.01 for p in poses_2d[:2]]
        cams_semi = cams[:2]
        poses_3d = [p + np.array([0, 0, 4], np.float32) for p in poses_3d]

        cfg = _model_cfg()
        traj_cfg = TemporalModelConfig(
            num_joints_in=J, in_features=2, num_joints_out=1,
            filter_widths=cfg.filter_widths, dropout=cfg.dropout,
            channels=cfg.channels)
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=8, chunk_length=1, pad=pad,
                               causal_shift=0, warmup=0)

        dev = FlatSequenceDataset(poses_2d, poses_3d, cams).to_device()
        dev_semi = FlatSequenceDataset(poses_2d_semi, None,
                                       cams_semi).to_device()
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 8, 1)
        sampler_semi = ChunkedPairSampler(
            [p.shape[0] for p in poses_2d_semi], 8, 1, random_seed=4321,
            endless=True)
        semi_iter = sampler_semi.next_epoch()
        metas, n_valids, metas_semi, n_valids_semi = [], [], [], []
        for meta, n_valid in sampler.next_epoch():
            meta_semi, n_valid_semi = next(semi_iter)
            metas.append(meta)
            n_valids.append(n_valid)
            metas_semi.append(meta_semi)
            n_valids_semi.append(n_valid_semi)
        metas, metas_semi = np.stack(metas), np.stack(metas_semi)
        n_valids, n_valids_semi = np.array(n_valids), np.array(n_valids_semi)

        parents = np.array([-1] + list(range(J - 1)))
        trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop, _perm(), _perm(),
                                        parents)
        params0 = {}
        params0["pos"], state_pos = init_temporal_model(cfg,
                                                        jax.random.PRNGKey(0))
        params0["traj"], state_traj = init_temporal_model(
            traj_cfg, jax.random.PRNGKey(1))
        states0 = {"pos": state_pos, "traj": state_traj}
        opt0 = trainer.init_optimizer(params0)

        def run(chunk):
            p, s, o = jax.tree_util.tree_map(
                jnp.copy, (params0, states0, opt0))
            p, s, o, r, losses = trainer.run_epoch(
                p, s, o, jax.random.PRNGKey(2), dev, dev_semi,
                metas, n_valids, metas_semi, n_valids_semi, 0.1,
                skip=False, scan_chunk=chunk)
            return (jax.tree_util.tree_map(np.asarray, (p, s, o, r)),
                    tuple(np.asarray(l) for l in losses))

        ref_tree, ref_losses = run(0)
        tree, losses = run(2)
        for a, b in zip(ref_losses, losses):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(ref_tree),
                        jax.tree_util.tree_leaves(tree)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_semi_multichip_mesh(self):
        """Semi-supervised DP step (pose + trajectory models, in-graph
        projection loss) over the virtual 8-device CPU mesh."""
        assert jax.device_count() == 8
        mesh = make_mesh()
        rng = np.random.default_rng(5)
        poses_2d, poses_3d, cams = _toy_data(rng)
        poses_2d_semi = [p + 0.01 for p in poses_2d[:2]]
        cams_semi = cams[:2]
        poses_3d = [p + np.array([0, 0, 4], np.float32) for p in poses_3d]

        cfg = _model_cfg()
        traj_cfg = TemporalModelConfig(
            num_joints_in=J, in_features=2, num_joints_out=1,
            filter_widths=cfg.filter_widths, dropout=cfg.dropout,
            channels=cfg.channels)
        pad = (receptive_field(cfg) - 1) // 2
        loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                               causal_shift=0, warmup=1)

        from videopose3d_tpu.parallel import replicated_sharding
        rep = replicated_sharding(mesh)
        dev = FlatSequenceDataset(poses_2d, poses_3d, cams).to_device(rep)
        dev_semi = FlatSequenceDataset(
            poses_2d_semi, None, cams_semi).to_device(rep)
        sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1)
        sampler_semi = ChunkedPairSampler(
            [p.shape[0] for p in poses_2d_semi], 16, 1,
            random_seed=4321, endless=True)

        parents = np.array([-1] + list(range(J - 1)))
        trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop, _perm(), _perm(),
                                        parents, mesh=mesh)
        params_pos, states_pos = init_temporal_model(cfg, jax.random.PRNGKey(0))
        params_traj, states_traj = init_temporal_model(
            traj_cfg, jax.random.PRNGKey(1))
        params = {"pos": params_pos, "traj": params_traj}
        states = {"pos": states_pos, "traj": states_traj}
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(2)

        semi_iter = sampler_semi.next_epoch()
        for skip in (True, False):                   # warmup then full
            meta, n_valid = next(sampler.next_epoch())
            meta_semi, n_valid_semi = next(semi_iter)
            (params, states, opt_state, step_rng,
             loss_pos, loss_traj, loss_recon, loss_total) = trainer.step(
                params, states, opt_state, step_rng, dev, dev_semi,
                meta, n_valid, meta_semi, n_valid_semi, 0.1, skip)
            assert np.isfinite(float(loss_pos))
        assert np.isfinite(float(loss_recon)) and float(loss_recon) > 0.0


class TestEvaluator:
    def test_eval_protocols_smoke(self):
        rng = np.random.default_rng(4)
        poses_2d, poses_3d, _ = _toy_data(rng)
        cfg = _model_cfg()
        pad = (receptive_field(cfg) - 1) // 2
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        perm = _perm()

        batcher = UnchunkedBatcher(None, poses_3d, poses_2d, pad=pad,
                                   augment=True, kps_flip_perm=perm,
                                   joints_flip_perm=perm, bucket=32)
        ev = Evaluator(cfg, joints_flip_perm=perm)
        e1, e2, e3, evel = evaluate(ev, params, state, batcher, verbose=False)
        for v in (e1, e2, e3, evel):
            assert np.isfinite(v) and v >= 0

    def test_tta_exact_on_symmetric_model(self):
        """With TTA, predictions = average of normal and unflipped-flip; for an
        input that is its own mirror the two branches agree."""
        cfg = _model_cfg(dropout=0.0)
        pad = (receptive_field(cfg) - 1) // 2
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(5))
        perm = _perm()

        rng = np.random.default_rng(6)
        x = rng.standard_normal((20, J, 2)).astype(np.float32)
        # Build a mirror-symmetric input: x == flip(x).
        x[..., 0] = 0.0
        x[:, [1, 3, 5]] = x[:, [2, 4, 6]]

        batcher = UnchunkedBatcher(None, None, [x], pad=pad, augment=True,
                                   kps_flip_perm=perm, joints_flip_perm=perm,
                                   bucket=16)
        ev = Evaluator(cfg, joints_flip_perm=perm)
        _, _, b2, n = next(batcher.next_epoch())
        np.testing.assert_array_equal(b2[0], b2[1])


def test_mesh_equals_single_device():
    """The README's GSPMD claim, tested: a data-parallel step over the
    8-device mesh produces the same parameters, BatchNorm running statistics,
    and losses as the unsharded step — same init, same chunk descriptors,
    dropout off (mask generation order is batch-position-invariant either
    way, but f32 summation order in the sharded all-reduces differs, hence
    allclose rather than bit-equality)."""
    mesh = make_mesh()
    rng = np.random.default_rng(11)
    poses_2d, poses_3d, _ = _toy_data(rng)
    cfg = _model_cfg(dropout=0.0)
    pad = (receptive_field(cfg) - 1) // 2
    loop = TrainLoopConfig(batch_size=16, chunk_length=1, pad=pad,
                           causal_shift=0)
    perm = tuple(_perm().tolist())
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm))

    metas = list(ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, 1)
                 .next_epoch())[:6]

    results = {}
    for tag, m in (("mesh", mesh), ("single", None)):
        if m is not None:
            from videopose3d_tpu.parallel import replicated_sharding
            dev = ds.to_device(replicated_sharding(m))
        else:
            dev = ds.to_device()
        trainer = SupervisedTrainer(cfg, loop, _perm(), _perm(), mesh=m)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(1)
        losses = []
        for meta, n_valid in metas:
            params, state, opt_state, step_rng, loss = trainer.step(
                params, state, opt_state, step_rng, dev, meta, n_valid, 0.1)
            losses.append(float(loss))
        results[tag] = (jax.tree.map(np.asarray, params),
                        jax.tree.map(np.asarray, state), losses)

    p_mesh, s_mesh, l_mesh = results["mesh"]
    p_one, s_one, l_one = results["single"]
    np.testing.assert_allclose(l_mesh, l_one, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
                 p_mesh, p_one)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6),
                 s_mesh, s_one)


@pytest.mark.slow
def test_semi_mesh_equals_single_device():
    """Mesh-vs-unsharded equivalence for the semi-supervised trainer: both
    models' parameters and all loss components agree to float tolerance
    (dropout off; the labeled + unlabeled concat-batch semantics must
    survive the batch-axis sharding)."""
    mesh = make_mesh()
    rng = np.random.default_rng(12)
    poses_2d, poses_3d, cams = _toy_data(rng)
    poses_2d_semi = [p + 0.01 for p in poses_2d[:2]]
    cams_semi = cams[:2]
    poses_3d = [p + np.array([0, 0, 4], np.float32) for p in poses_3d]

    cfg = _model_cfg(dropout=0.0)
    traj_cfg = TemporalModelConfig(
        num_joints_in=J, in_features=2, num_joints_out=1,
        filter_widths=cfg.filter_widths, dropout=0.0, channels=cfg.channels)
    pad = (receptive_field(cfg) - 1) // 2
    loop = TrainLoopConfig(batch_size=8, chunk_length=1, pad=pad,
                           causal_shift=0, warmup=0)
    parents = np.array([-1] + list(range(J - 1)))

    metas = list(ChunkedPairSampler([p.shape[0] for p in poses_2d], 8, 1)
                 .next_epoch())[:4]
    metas_semi = []
    semi_iter = ChunkedPairSampler([p.shape[0] for p in poses_2d_semi], 8, 1,
                                   random_seed=4321, endless=True).next_epoch()
    for _ in metas:
        metas_semi.append(next(semi_iter))

    results = {}
    for tag, m in (("mesh", mesh), ("single", None)):
        sharding = None
        if m is not None:
            from videopose3d_tpu.parallel import replicated_sharding
            sharding = replicated_sharding(m)
        dev = FlatSequenceDataset(poses_2d, poses_3d, cams).to_device(sharding)
        dev_semi = FlatSequenceDataset(
            poses_2d_semi, None, cams_semi).to_device(sharding)
        trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop, _perm(), _perm(),
                                        parents, mesh=m)
        params = {"pos": None, "traj": None}
        params["pos"], st_pos = init_temporal_model(cfg, jax.random.PRNGKey(0))
        params["traj"], st_traj = init_temporal_model(
            traj_cfg, jax.random.PRNGKey(1))
        states = {"pos": st_pos, "traj": st_traj}
        opt_state = trainer.init_optimizer(params)
        step_rng = jax.random.PRNGKey(2)
        losses = []
        for (meta, n_valid), (meta_s, n_valid_s) in zip(metas, metas_semi):
            (params, states, opt_state, step_rng,
             loss_pos, loss_traj, loss_recon, loss_total) = trainer.step(
                params, states, opt_state, step_rng, dev, dev_semi,
                meta, n_valid, meta_s, n_valid_s, 0.1, False)
            losses.append([float(loss_pos), float(loss_traj),
                           float(loss_recon), float(loss_total)])
        results[tag] = (jax.tree.map(np.asarray, params), losses)

    p_mesh, l_mesh = results["mesh"]
    p_one, l_one = results["single"]
    np.testing.assert_allclose(l_mesh, l_one, rtol=3e-5, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=3e-6),
                 p_mesh, p_one)


def test_fused_optimizer_apply_matches_chained():
    """fused_optimizer_apply (one fused kernel per leaf) is bit-identical to
    optimizer.update + optax.apply_updates over many steps, including the
    full optimizer-state pytree."""
    import optax
    from videopose3d_tpu.train import fused_optimizer_apply, make_optimizer

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.standard_normal((64, 33)), jnp.float32),
              "b": [jnp.asarray(rng.standard_normal(7), jnp.float32)]}
    opt = make_optimizer(1e-3)
    st_a = opt.init(params)
    st_b = opt.init(params)
    p_a = p_b = params
    for i in range(10):
        grads = jax.tree.map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape) * 0.1, jnp.float32), p_a)
        updates, st_a = opt.update(grads, st_a, p_a)
        p_a = optax.apply_updates(p_a, updates)
        p_b, st_b = fused_optimizer_apply(opt, grads, st_b, p_b)

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p_a, p_b)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.tree.map(np.asarray, st_a),
                 jax.tree.map(np.asarray, st_b))
