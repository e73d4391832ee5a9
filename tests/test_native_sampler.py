"""Native (C++) sampler core: bit-parity with numpy's legacy RandomState —
raw MT19937 draws, row permutations, post-call RNG state, and the sampler
integration across epochs and resume."""

import numpy as np
import pytest

from videopose3d_tpu import native
from videopose3d_tpu.data import ChunkedPairSampler

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native sampler could not be built")


def test_raw_mt19937_draws_match_numpy():
    rs_np = np.random.RandomState(1234)
    rs_nat = np.random.RandomState(1234)
    want = rs_np.randint(0, 2**32, size=1000, dtype=np.uint32)
    got = native.raw_draws(rs_nat, 1000)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,n", [(1234, 1), (1234, 2), (1234, 97),
                                    (4321, 1000), (0, 8)])
def test_permutation_matches_numpy(seed, n):
    pairs = np.arange(n * 4, dtype=np.int64).reshape(n, 4)
    rs_np = np.random.RandomState(seed)
    rs_nat = np.random.RandomState(seed)

    for _ in range(3):  # repeated epochs: state must track exactly
        want = rs_np.permutation(pairs)
        got = native.permute_rows(rs_nat, pairs)
        np.testing.assert_array_equal(got, want)

    # Post-call RNG states identical -> downstream draws identical.
    np.testing.assert_array_equal(rs_np.get_state()[1], rs_nat.get_state()[1])
    assert rs_np.get_state()[2] == rs_nat.get_state()[2]


def test_sampler_native_equals_numpy_path():
    lengths = [37, 60, 11]
    a = ChunkedPairSampler(lengths, 8, 1, augment=True, use_native=False)
    b = ChunkedPairSampler(lengths, 8, 1, augment=True, use_native=True)
    for _ in range(2):
        for (ma, va), (mb, vb) in zip(a.next_epoch(), b.next_epoch()):
            np.testing.assert_array_equal(ma, mb)
            assert va == vb


def test_sampler_native_resume_parity():
    """RNG state saved from a native-path sampler restores into a numpy-path
    sampler (and vice versa) with identical continuation."""
    lengths = [29, 43]
    a = ChunkedPairSampler(lengths, 4, 1, use_native=True)
    _ = [m for m, _ in a.next_epoch()]
    saved = a.random_state()

    c = ChunkedPairSampler(lengths, 4, 1, use_native=False)
    c.set_random_state(saved)
    d = ChunkedPairSampler(lengths, 4, 1, use_native=True)
    d.set_random_state(saved)
    for (mc, _), (md, _) in zip(c.next_epoch(), d.next_epoch()):
        np.testing.assert_array_equal(mc, md)


def test_reaper_spares_other_users_live_tmp(tmp_path, monkeypatch):
    """Review r5: ``os.kill(pid, 0)`` raises PermissionError for a LIVE
    process owned by another user; the orphan reaper used to catch it under
    the bare ``except OSError`` and delete that builder's in-progress tmp
    mid-g++.  Only ProcessLookupError means the pid is gone."""
    import os

    build = tmp_path / "build"
    build.mkdir()
    monkeypatch.setattr(native, "_BUILD_DIR", str(build))
    monkeypatch.setattr(native, "_LIB_PATH", str(build / "libsampler.so"))
    live = build / "libsampler.so.424242.tmp"
    dead = build / "libsampler.so.424243.tmp"
    live.write_text("in-progress g++ output of another user's builder")
    dead.write_text("orphan from a killed builder")

    real_kill = os.kill

    def fake_kill(pid, sig):
        if pid == 424242:
            raise PermissionError("alive, owned by another user")
        if pid == 424243:
            raise ProcessLookupError("no such process")
        return real_kill(pid, sig)

    monkeypatch.setattr(os, "kill", fake_kill)
    assert native._build() == str(build / "libsampler.so")
    assert live.exists(), "live builder's tmp must survive the reaper"
    assert not dead.exists(), "dead builder's orphan must be reaped"
