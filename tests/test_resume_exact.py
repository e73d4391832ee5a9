"""Bit-exact resume: training N epochs straight equals training k epochs,
checkpointing, and resuming for the remaining N-k — identical loss trajectory
(sampler RNG, dropout PRNG, optimizer state, BN state all restored)."""

import re

import numpy as np
import pytest

from videopose3d_tpu import runner


def _loss_lines(out):
    return {int(m.group(1)): (float(m.group(2)), float(m.group(3)),
                              float(m.group(4)))
            for m in re.finditer(
                r"\[(\d+)\] time \S+ lr \S+ 3d_train (\S+) 3d_eval (\S+) "
                r"3d_valid (\S+)", out)}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data_resume")
    subjects = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
    positions_3d = {s: {"Walking 1": rng.standard_normal(
        (40, 32, 3)).astype(np.float32) * 0.2} for s in subjects}
    np.savez_compressed(root / "data_3d_h36m.npz", positions_3d=positions_3d)
    positions_2d = {s: {"Walking 1": [
        rng.uniform(100, 900, (40, 17, 2)).astype(np.float32)
        for _ in range(4)]} for s in subjects}
    metadata = {"layout_name": "h36m", "num_joints": 17,
                "keypoints_symmetry": [[4, 5, 6, 11, 12, 13],
                                       [1, 2, 3, 14, 15, 16]]}
    np.savez_compressed(root / "data_2d_h36m_gt.npz",
                        positions_2d=positions_2d, metadata=metadata)
    return str(root)


def _run(data_dir, ckpt, epochs, resume=None):
    args = ["-d", "h36m", "-k", "gt", "--data-dir", data_dir, "-c", ckpt,
            "-arc", "3,3", "-ch", "16", "-b", "32", "--eval-bucket", "16",
            "-e", str(epochs), "--checkpoint-frequency", "1"]
    if resume:
        args += ["-r", resume]
    runner.main(args)


def test_resume_is_bit_exact(data_dir, tmp_path, capsys):
    """Simulate an interruption: train 4 epochs straight, then resume from that
    run's own epoch-2 checkpoint (same --epochs, as a crashed job would) and
    verify epochs 3-4 replay with identical train AND eval losses (sampler RNG,
    dropout PRNG, optimizer, and BN running stats all restored).

    Note the BN momentum schedule depends on the *total* --epochs (reference
    semantics, run.py:589-591), so resuming with a different -e intentionally
    changes running-statistics evolution — resume with the original -e.
    """
    ckpt = str(tmp_path / "a")
    _run(data_dir, ckpt, 4)
    straight = _loss_lines(capsys.readouterr().out)
    assert set(straight) == {1, 2, 3, 4}

    _run(data_dir, ckpt, 4, resume="epoch_2.bin")
    resumed = _loss_lines(capsys.readouterr().out)

    assert set(resumed) == {3, 4}
    for epoch in (3, 4):
        s_train, s_eval, s_valid = straight[epoch]
        r_train, r_eval, r_valid = resumed[epoch]
        assert s_train == pytest.approx(r_train, abs=1e-6), epoch
        assert s_eval == pytest.approx(r_eval, abs=1e-6), epoch
        assert s_valid == pytest.approx(r_valid, abs=1e-6), epoch


@pytest.mark.slow
def test_semi_supervised_resume_is_continuation_exact(data_dir, tmp_path,
                                                      capsys):
    """Semi-supervised resume replays the interrupted run exactly — including
    the endless unlabeled stream's mid-permutation position, which the
    checkpoint carries as (pre-draw RNG snapshot, batch index).  The
    reference cannot do this: it restores only the stream's RNG
    (run.py:607), restarting a fresh permutation."""
    def run(ckpt, epochs, resume=None):
        args = ["-d", "h36m", "-k", "gt", "--data-dir", data_dir, "-c", ckpt,
                "-arc", "3,3", "-ch", "16", "-b", "32", "--eval-bucket", "16",
                "-e", str(epochs), "--checkpoint-frequency", "1",
                "-str", "S1,S5", "-sun", "S6,S7", "--warmup", "0"]
        if resume:
            args += ["-r", resume]
        runner.main(args)

    def semi_lines(out):
        return {int(m.group(1)): [float(g) for g in m.groups()[1:]]
                for m in re.finditer(
                    r"\[(\d+)\] time \S+ lr \S+ 3d_train (\S+) "
                    r"3d_eval (\S+) traj_eval (\S+) "
                    r"3d_valid (\S+) traj_valid (\S+) "
                    r"2d_train_sup (\S+) 2d_train_unsup (\S+) "
                    r"2d_valid (\S+)", out)}

    ckpt = str(tmp_path / "semi")
    run(ckpt, 4)
    straight = semi_lines(capsys.readouterr().out)
    assert set(straight) == {1, 2, 3, 4}

    run(ckpt, 4, resume="epoch_2.bin")
    resumed = semi_lines(capsys.readouterr().out)
    assert set(resumed) == {3, 4}
    for epoch in (3, 4):
        assert straight[epoch] == pytest.approx(resumed[epoch], abs=1e-6), epoch
