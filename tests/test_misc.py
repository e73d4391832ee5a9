"""Misc unit tests: checkpoint round-trip, deterministic_random parity,
argument parsing, datasets construction."""

import numpy as np
import pytest

from videopose3d_tpu.arguments import parse_args
from videopose3d_tpu.checkpoint import save_checkpoint, load_checkpoint
from videopose3d_tpu.utils import deterministic_random


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        payload = {
            "epoch": 7,
            "lr": 9.5e-4,
            "random_state": np.random.RandomState(1).get_state(),
            "optimizer": {"mu": {"w": np.ones((3, 3), np.float32)}},
            "model_pos": {"expand_conv.weight": np.zeros((4, 2, 3))},
            "model_traj": None,
            "random_state_semi": None,
        }
        path = str(tmp_path / "epoch_7.bin")
        save_checkpoint(path, payload)
        chk = load_checkpoint(path)
        assert chk["epoch"] == 7 and abs(chk["lr"] - 9.5e-4) < 1e-12
        np.testing.assert_array_equal(
            chk["optimizer"]["mu"]["w"], payload["optimizer"]["mu"]["w"])
        # RNG state restores into a RandomState and reproduces draws.
        rs = np.random.RandomState()
        rs.set_state(chk["random_state"])
        rs2 = np.random.RandomState(1)
        assert rs.randint(0, 1 << 30) == rs2.randint(0, 1 << 30)

    def test_atomic_write_leaves_no_tmp(self, tmp_path):
        path = str(tmp_path / "c.bin")
        save_checkpoint(path, {"epoch": 1})
        assert not any(p.name.endswith(".tmp") for p in tmp_path.iterdir())


class TestDeterministicRandom:
    def test_parity_with_reference(self, reference_modules):
        import sys
        sys.path.insert(0, "/root/reference")
        try:
            from common.utils import deterministic_random as ref_dr
        finally:
            sys.path.pop(0)
        for lo, hi, data in [(0, 100, "hello"), (5, 6, "x"),
                             (0, 1 << 20, "1559752")]:
            assert deterministic_random(lo, hi, data) == ref_dr(lo, hi, data)

    def test_within_bounds(self):
        for data in map(str, range(50)):
            v = deterministic_random(10, 20, data)
            assert 10 <= v < 20


class TestArguments:
    def test_defaults_match_reference(self):
        args = parse_args([])
        assert args.dataset == "h36m"
        assert args.keypoints == "cpn_ft_h36m_dbb"
        assert args.subjects_train == "S1,S5,S6,S7,S8"
        assert args.batch_size == 1024
        assert args.architecture == "3,3,3"
        assert args.learning_rate == 0.001
        assert args.lr_decay == 0.95
        assert args.dropout == 0.25
        assert args.channels == 1024
        assert args.data_augmentation and args.test_time_augmentation
        assert args.bone_length_term

    def test_invalid_combos_exit(self):
        with pytest.raises(SystemExit):
            parse_args(["-r", "a.bin", "--evaluate", "b.bin"])
        with pytest.raises(SystemExit):
            parse_args(["--export-training-curves", "--no-eval"])

    def test_short_flags(self):
        args = parse_args(["-arc", "3,3,3,3,3", "-ch", "512", "-no-tta",
                           "-sun", "S5", "--causal"])
        assert args.architecture == "3,3,3,3,3"
        assert args.channels == 512
        assert not args.test_time_augmentation
        assert args.subjects_unlabeled == "S5"
        assert args.causal


class TestDatasets:
    def test_h36m_dataset(self, tmp_path):
        rng = np.random.default_rng(0)
        positions = {"S1": {"Walking 1": rng.standard_normal(
            (10, 32, 3)).astype(np.float32)}}
        np.savez_compressed(tmp_path / "d.npz", positions_3d=positions)
        from videopose3d_tpu.datasets.h36m import Human36mDataset
        ds = Human36mDataset(str(tmp_path / "d.npz"))
        assert ds.skeleton().num_joints() == 17
        assert ds.fps() == 50
        assert ds.supports_semi_supervised()
        # Positions trimmed to 17 joints; cameras carry normalized intrinsics.
        assert ds["S1"]["Walking 1"]["positions"].shape == (10, 17, 3)
        cam = ds.cameras()["S1"][0]
        assert cam["intrinsic"].shape == (9,)
        assert abs(float(cam["intrinsic"][0]) - 2.29) < 0.01  # fx ~ 2*1145/1000
        # Shoulders re-parented to thorax.
        assert ds.skeleton().parents()[11] == 8
        assert ds.skeleton().parents()[14] == 8

    def test_h36m_camera_parity(self, reference_modules, tmp_path):
        rng = np.random.default_rng(0)
        positions = {"S1": {"A": rng.standard_normal((4, 32, 3))
                            .astype(np.float32)}}
        np.savez_compressed(tmp_path / "d.npz", positions_3d=positions)
        from videopose3d_tpu.datasets.h36m import Human36mDataset
        from tests.conftest import fresh_reference_h36m_dataset
        ours = Human36mDataset(str(tmp_path / "d.npz"))
        theirs = fresh_reference_h36m_dataset(str(tmp_path / "d.npz"))
        for subject in ["S1", "S5", "S9", "S11"]:
            for i in range(4):
                co = ours.cameras()[subject][i]
                ct = theirs.cameras()[subject][i]
                np.testing.assert_allclose(co["intrinsic"], ct["intrinsic"],
                                           atol=1e-7)
                np.testing.assert_allclose(co["orientation"], ct["orientation"])
                np.testing.assert_allclose(co["translation"], ct["translation"])
        np.testing.assert_array_equal(ours.skeleton().parents(),
                                      theirs.skeleton().parents())
        assert ours.skeleton().joints_left() == theirs.skeleton().joints_left()

    def test_humaneva_dataset(self, tmp_path):
        rng = np.random.default_rng(0)
        positions = {"Train/S1": {"Walking 1 chunk0": rng.standard_normal(
            (10, 15, 3)).astype(np.float32)}}
        np.savez_compressed(tmp_path / "d.npz", positions_3d=positions)
        from videopose3d_tpu.datasets.humaneva import HumanEvaDataset
        ds = HumanEvaDataset(str(tmp_path / "d.npz"))
        assert ds.skeleton().num_joints() == 15
        assert ds.fps() == 60
        assert not ds.supports_semi_supervised()
        # Camera tables replicated under all split prefixes.
        for prefix in ["Train/", "Validate/", "Unlabeled/", "Unlabeled/Train/"]:
            assert prefix + "S1" in ds.cameras()


class TestAsyncCheckpointer:
    def test_roundtrip_and_callable_payload(self, tmp_path):
        from videopose3d_tpu.checkpoint import AsyncCheckpointer, load_checkpoint
        cp = AsyncCheckpointer()
        path = str(tmp_path / "ck.bin")
        cp.save(path, lambda: {"epoch": 3, "w": np.arange(5.0)})
        cp.wait()
        loaded = load_checkpoint(path)
        assert loaded["epoch"] == 3
        np.testing.assert_array_equal(loaded["w"], np.arange(5.0))

    def test_background_error_surfaces_on_wait(self, tmp_path):
        from videopose3d_tpu.checkpoint import AsyncCheckpointer
        cp = AsyncCheckpointer()

        def boom():
            raise RuntimeError("payload failure")

        cp.save(str(tmp_path / "x.bin"), boom)
        with pytest.raises(RuntimeError, match="payload failure"):
            cp.wait()
        # The error is consumed; the checkpointer remains usable.
        cp.save(str(tmp_path / "y.bin"), {"ok": 1})
        cp.wait()

    def test_save_serializes_with_previous(self, tmp_path):
        from videopose3d_tpu.checkpoint import AsyncCheckpointer, load_checkpoint
        cp = AsyncCheckpointer()
        for i in range(4):
            cp.save(str(tmp_path / "same.bin"), {"i": i})
        cp.wait()
        assert load_checkpoint(str(tmp_path / "same.bin"))["i"] == 3
