"""Orbax checkpoint backend: payload round-trip parity with the pickle format
(including numpy RNG-state retupling) and runner-level save/resume."""

import re

import numpy as np
import pytest

from videopose3d_tpu import runner
from videopose3d_tpu.checkpoint import (
    save_checkpoint, load_checkpoint, save_checkpoint_orbax,
    load_checkpoint_orbax, AsyncCheckpointer)


def _payload():
    rs = np.random.RandomState(1234)
    rs.uniform(size=100)
    return {
        "epoch": 7,
        "lr": 0.00095,
        "random_state": rs.get_state(),
        "optimizer": {"m": np.arange(6, dtype=np.float32).reshape(2, 3),
                      "v": np.ones((2, 3), np.float32)},
        "model_pos": {"expand_conv.weight": np.random.default_rng(0)
                      .standard_normal((8, 34, 3)).astype(np.float32)},
        "model_traj": None,
        "random_state_semi": None,
        "step_rng": np.array([1, 2], np.uint32),
    }


def _tree_equal(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _tree_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _tree_equal(x, y)
    elif isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b)
    else:
        assert a == b, (a, b)


def test_orbax_roundtrip_matches_pickle(tmp_path):
    payload = _payload()
    save_checkpoint(str(tmp_path / "ck.bin"), payload)
    save_checkpoint_orbax(str(tmp_path / "ck_orbax"), payload)
    via_pickle = load_checkpoint(str(tmp_path / "ck.bin"))
    via_orbax = load_checkpoint_orbax(str(tmp_path / "ck_orbax"))
    _tree_equal(via_pickle, via_orbax)

    # The restored RNG state must drive a RandomState identically.
    rs = np.random.RandomState()
    rs.set_state(via_orbax["random_state"])
    rs2 = np.random.RandomState()
    rs2.set_state(payload["random_state"])
    assert rs.uniform() == rs2.uniform()


def test_orbax_overwrite_is_crash_safe(tmp_path):
    """Overwriting an existing checkpoint writes beside and swaps: the old
    directory survives until the new one is complete, and an interrupted swap
    (only ``path.old`` left on disk) still loads."""
    path = str(tmp_path / "ck")
    save_checkpoint_orbax(path, {"epoch": 1, "w": np.arange(3.0)})
    save_checkpoint_orbax(path, {"epoch": 2, "w": np.arange(3.0) * 2})
    assert load_checkpoint_orbax(path)["epoch"] == 2
    assert not (tmp_path / "ck.old").exists()
    assert not (tmp_path / "ck.new").exists()

    # Simulate a crash between the two renames: path gone, path.old intact.
    import shutil
    shutil.move(path, path + ".old")
    restored = load_checkpoint_orbax(path)
    assert restored["epoch"] == 2


def test_async_checkpointer_orbax_backend(tmp_path):
    cp = AsyncCheckpointer()
    path = str(tmp_path / "ck_dir")
    cp.save(path, lambda: {"epoch": 3, "w": np.arange(5.0)},
            save_fn=save_checkpoint_orbax)
    cp.wait()
    loaded = load_checkpoint_orbax(path)
    assert loaded["epoch"] == 3
    np.testing.assert_array_equal(loaded["w"], np.arange(5.0))


@pytest.fixture()
def tiny_data(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data_orbax")
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


def test_runner_orbax_resume_bit_exact(tiny_data, tmp_path, capsys):
    """Train 3 epochs straight vs 2 + orbax-resume of the third: identical
    loss lines (the orbax payload restores sampler RNG, dropout PRNG,
    optimizer, and BN state exactly, like the pickle format)."""
    def lines(out):
        return {int(m.group(1)): (float(m.group(2)), float(m.group(3)))
                for m in re.finditer(
                    r"\[(\d+)\] time \S+ lr \S+ 3d_train (\S+) 3d_eval \S+ "
                    r"3d_valid (\S+)", out)}

    # Same -e on both legs: the BN momentum schedule depends on the *total*
    # --epochs (reference run.py:589-591), so resuming with a different -e
    # intentionally diverges the running statistics.
    base = ["-d", "h36m", "-k", "gt", "--data-dir", tiny_data,
            "-arc", "3,3", "-ch", "16", "-b", "32", "--eval-bucket", "16",
            "--checkpoint-frequency", "1", "--checkpoint-format", "orbax",
            "-c", str(tmp_path / "a"), "-e", "3"]
    runner.main(base)
    straight = lines(capsys.readouterr().out)

    assert (tmp_path / "a" / "epoch_2").is_dir()
    runner.main(base + ["-r", "epoch_2"])
    resumed = lines(capsys.readouterr().out)

    assert straight[3] == resumed[3]


def test_interrupted_swap_prefers_finalized_new(tmp_path):
    """A crash between the two renames of the atomic overwrite leaves the
    NEWEST finalized state at ``path + ".new"``; load must prefer it over the
    previous epoch at ``path + ".old"`` (an .old-only fallback would silently
    lose one checkpoint interval)."""
    import os

    path = str(tmp_path / "ck")
    save_checkpoint_orbax(path, _payload())                    # epoch 7
    save_checkpoint_orbax(path + ".new", dict(_payload(), epoch=8))
    os.rename(path, path + ".old")  # crash window: swap half-done

    restored = load_checkpoint_orbax(path)
    assert restored["epoch"] == 8


def test_partial_new_falls_back(tmp_path):
    """A junk (non-finalized) ``.new`` directory must not mask the intact
    checkpoint at ``path``."""
    path = str(tmp_path / "ck")
    save_checkpoint_orbax(path, _payload())                    # epoch 7
    (tmp_path / "ck.new").mkdir()
    (tmp_path / "ck.new" / "garbage").write_text("not a checkpoint")

    restored = load_checkpoint_orbax(path)
    assert restored["epoch"] == 7


def test_fresh_save_after_interrupted_swap_not_shadowed(tmp_path):
    """Review r3: after a crash mid-swap, a later save that finds ``path``
    absent must not leave the stale ``.new`` shadowing it (load prefers
    .new)."""
    import os

    path = str(tmp_path / "ck")
    save_checkpoint_orbax(path, _payload())                      # epoch 7
    save_checkpoint_orbax(path + ".new", dict(_payload(), epoch=8))
    os.rename(path, path + ".old")                               # crash window

    save_checkpoint_orbax(path, dict(_payload(), epoch=9))       # next epoch
    assert load_checkpoint_orbax(path)["epoch"] == 9
    assert not os.path.exists(path + ".new")


def test_crashed_write_after_interrupted_swap_keeps_newest(
        tmp_path, monkeypatch):
    """Review r5: a crash AFTER ``ckptr.save(new)`` finalizes but BEFORE
    ``rename(path, old)`` leaves BOTH ``path`` (older) and ``.new`` (newest,
    the state load restores).  The next save used to reap ``.new`` as stale
    before its own multi-second tensorstore write — crashing inside that
    write then regressed durable state a generation behind what the crashed
    run had resumed from.  The swap is now completed first."""
    import os

    from videopose3d_tpu import checkpoint as ckpt

    path = str(tmp_path / "ck")
    save_checkpoint_orbax(path, _payload())                      # epoch 7
    save_checkpoint_orbax(path + ".new", dict(_payload(), epoch=8))
    # Crash window: both path (7) and .new (8) on disk; load restores 8.
    assert load_checkpoint_orbax(path)["epoch"] == 8

    class ExplodingCheckpointer:
        def save(self, *a, **k):
            raise RuntimeError("simulated crash mid-tensorstore-write")

    monkeypatch.setattr(ckpt, "_local_pytree_checkpointer",
                        lambda: ExplodingCheckpointer())
    with pytest.raises(RuntimeError, match="simulated crash"):
        save_checkpoint_orbax(path, dict(_payload(), epoch=9))
    monkeypatch.undo()

    # The newest pre-crash state must still be the one restored.
    assert load_checkpoint_orbax(path)["epoch"] == 8
    assert not os.path.exists(path + ".new")
