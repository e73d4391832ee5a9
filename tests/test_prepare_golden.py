"""Golden end-to-end tests for the dataset-preparation CLIs.

Each test synthesizes the raw input tree a reference prep script expects, runs
the *actual reference script* (``/root/reference/data/prepare_data_*.py``) in a
subprocess on it, runs our converter on the same inputs, and compares the
produced ``.npz`` archives entry-for-entry with zero tolerance.  This upgrades
the C19/C21/C22 parity evidence from structural to behavioral: chunk splitting
at NaNs, sync-offset alignment, Unlabeled/ marking, canonical renaming, and
corrupted-video discards all come out identical.

The reference scripts are run through a small shim that restores two historical
APIs they rely on (``h5py.Dataset.value``, removed in h5py 3.0, and
``np.load`` defaulting to ``allow_pickle=True``) — environment repair only, no
behavioral change.
"""

import os
import subprocess
import sys
import textwrap
import zipfile

import numpy as np
import pytest

from tests.conftest import reference_available
from videopose3d_tpu.data.prepare import (
    h36m_2d_generic, h36m_2d_sh, h36m_3d, humaneva)

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference implementation not available")


def _run_reference_script(script, argv, cwd):
    """Run a reference prep script under the legacy-API shim.

    ``cwd`` must be a directory literally named ``data`` (the scripts check).
    Returns the completed process; raises on nonzero exit.
    """
    shim = os.path.join(cwd, "_run_ref.py")
    with open(shim, "w") as f:
        f.write(textwrap.dedent("""\
            import sys, runpy
            import numpy as np
            try:
                import h5py
                if not hasattr(h5py.Dataset, "value"):
                    h5py.Dataset.value = property(lambda self: self[()])
            except ImportError:
                pass
            _np_load = np.load
            def _load(*a, **k):
                k.setdefault("allow_pickle", True)
                return _np_load(*a, **k)
            np.load = _load
            script = sys.argv[1]
            sys.argv = [script] + sys.argv[2:]
            sys.path.insert(0, "%s")
            runpy.run_path(script, run_name="__main__")
            """ % REF_DATA))
    env = dict(os.environ)
    env["PYTHONPATH"] = REF_DATA + ":/root/reference"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, shim, os.path.join(REF_DATA, script)] + argv,
        cwd=cwd, env=env, capture_output=True, text=True, check=True)


def _load_archive(path):
    with np.load(path, allow_pickle=True) as data:
        return {k: data[k].item() if data[k].dtype == object else data[k]
                for k in data.files}


def _assert_same(a, b, where=""):
    if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
        assert int(a) == int(b), f"{where}: {a!r} vs {b!r}"
        return
    assert type(a) is type(b) or (
        isinstance(a, np.ndarray) and isinstance(b, np.ndarray)), \
        f"{where}: {type(a)} vs {type(b)}"
    if isinstance(a, dict):
        assert sorted(a.keys()) == sorted(b.keys()), (
            f"{where}: keys {sorted(a.keys())} vs {sorted(b.keys())}")
        for k in a:
            _assert_same(a[k], b[k], f"{where}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), f"{where}: len {len(a)} vs {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_same(x, y, f"{where}[{i}]")
    elif isinstance(a, np.ndarray):
        assert a.shape == b.shape and a.dtype == b.dtype, (
            f"{where}: {a.shape}/{a.dtype} vs {b.shape}/{b.dtype}")
        assert np.array_equal(a, b), f"{where}: values differ"
    else:
        assert a == b, f"{where}: {a!r} vs {b!r}"


def _compare_archives(ref_path, our_path):
    ref, ours = _load_archive(ref_path), _load_archive(our_path)
    assert sorted(ref.keys()) == sorted(ours.keys())
    for k in ref:
        _assert_same(ref[k], ours[k], k)


# ---------------------------------------------------------------------------
# HumanEva: chunk splitting at NaNs, Unlabeled marking, sync offsets
# ---------------------------------------------------------------------------

HE_ACTIONS = ["Walking 1", "Box 1"]


def _build_humaneva_inputs(root, rng):
    """MATLAB-export tree (poses_3d/poses_2d .mat per stream, lengths matching
    the published train/validate index) + a CPN-style detections tree."""
    from scipy.io import savemat

    src = os.path.join(root, "source")
    for subject in humaneva.SUBJECTS:
        os.makedirs(os.path.join(src, subject), exist_ok=True)
        for action in HE_ACTIONS:
            start, end = humaneva.INDEX[subject][action]
            t = end - start
            p3 = (rng.standard_normal((t, 15, 3)) * 300).astype(np.float64)
            p2 = (rng.uniform(0, 640, (3, t, 15, 2))).astype(np.float64)
            # Corrupt a few frame ranges (in both 3D and GT-2D, as the real
            # exporter produces) to exercise chunk splitting.
            if subject == "Train/S1" and action == "Walking 1":
                for lo, hi in [(100, 130), (200, 210)]:
                    p3[lo:hi] = np.nan
                    p2[:, lo:hi] = np.nan
            if subject == "Validate/S2" and action == "Box 1":
                p3[0:40] = np.nan
                p2[:, 0:40] = np.nan
            savemat(os.path.join(src, subject, action.replace(" ", "_") + ".mat"),
                    {"poses_3d": p3, "poses_2d": p2})

    dets = os.path.join(root, "dets")
    for subject in ["S1", "S2", "S3", "S4"]:
        os.makedirs(os.path.join(dets, subject), exist_ok=True)
        for action in HE_ACTIONS:
            for cam in ["C1", "C2", "C3"]:
                kps = rng.uniform(0, 640, (1400, 15, 2)).astype(np.float64)
                np.savez(os.path.join(
                    dets, subject,
                    f"{action.replace(' ', '_')}_({cam}).avi.npz"),
                    keypoints=kps)
    return src, dets


def test_humaneva_prep_golden(tmp_path):
    rng = np.random.default_rng(7)
    src, dets = _build_humaneva_inputs(str(tmp_path), rng)

    ref_dir = tmp_path / "ref" / "data"
    ref_dir.mkdir(parents=True)
    _run_reference_script(
        "prepare_data_humaneva.py",
        ["-p", src, "--convert-3d", "--convert-2d", dets,
         "-o", "cpn_humaneva15"],
        str(ref_dir))

    our_dir = tmp_path / "ours"
    humaneva.main(["-p", src, "--convert-3d", "--convert-2d", dets,
                   "-o", "cpn_humaneva15", "--data-dir", str(our_dir)])

    for name in ["data_3d_humaneva15.npz", "data_2d_humaneva15_gt.npz",
                 "data_2d_humaneva15_cpn_humaneva15.npz"]:
        _compare_archives(str(ref_dir / name), str(our_dir / name))

    # The corruption actually split streams and produced Unlabeled entries.
    ours = _load_archive(str(our_dir / "data_3d_humaneva15.npz"))
    assert "Walking 1 chunk2" in ours["positions_3d"]["Train/S1"]
    dets_arch = _load_archive(
        str(our_dir / "data_2d_humaneva15_cpn_humaneva15.npz"))
    assert any(s.startswith("Unlabeled/") for s in dets_arch["positions_2d"])


# ---------------------------------------------------------------------------
# Stacked Hourglass: zip unpack, per-camera slotting, S11 discards
# ---------------------------------------------------------------------------

def test_sh_prep_golden(tmp_path):
    import h5py
    rng = np.random.default_rng(11)
    actions = [f"Act{i}_1" for i in range(29)] + ["Directions"]
    cams = list(h36m_2d_sh.CAM_MAP)

    zip_path = tmp_path / "sh.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        scratch = tmp_path / "scratch.h5"
        for subject in h36m_2d_sh.SUBJECTS:
            files = [(a, c) for a in actions for c in cams]
            if subject == "S11":
                files.remove(("Act0_1", cams[0]))  # released set has 119
            for action, cam in files:
                with h5py.File(scratch, "w") as hf:
                    hf["poses"] = rng.uniform(0, 1000, (4, 16, 2))
                zf.write(scratch,
                         f"h36m/{subject}/StackedHourglass/{action}.{cam}.h5")
        scratch.unlink()

    ref_dir = tmp_path / "ref" / "data"
    ref_dir.mkdir(parents=True)
    _run_reference_script("prepare_data_2d_h36m_sh.py",
                          ["-pt", str(zip_path)], str(ref_dir))

    our_dir = tmp_path / "ours"
    h36m_2d_sh.main(["-pt", str(zip_path), "--data-dir", str(our_dir)])

    ref = _load_archive(str(ref_dir / "data_2d_h36m_sh_pt_mpii.npz"))
    ours = _load_archive(str(our_dir / "data_2d_h36m_sh_pt_mpii.npz"))
    _assert_same(ref["positions_2d"], ours["positions_2d"], "positions_2d")
    # The reference SH script inlines its metadata and (unlike its other prep
    # scripts) omits 'layout_name'; we emit the full mpii layout record.
    for key in ref["metadata"]:
        _assert_same(ref["metadata"][key], ours["metadata"][key],
                     f"metadata/{key}")
    assert ours["metadata"]["layout_name"] == "mpii"
    assert "Directions" not in ours["positions_2d"]["S11"]  # corrupted video
    assert "Directions" in ours["positions_2d"]["S1"]


# ---------------------------------------------------------------------------
# Generic per-video H36M detections: renames, _ALL skip, S11/Directions
# ---------------------------------------------------------------------------

def test_generic_2d_prep_golden(tmp_path):
    rng = np.random.default_rng(13)
    dets = tmp_path / "dets"
    cams = list(h36m_2d_generic.CAM_MAP)
    for subject in ["S1", "S9", "S11"]:
        (dets / subject).mkdir(parents=True)
        for action in ["Directions", "TakingPhoto 1", "WalkingDog"]:
            for cam in cams:
                np.savez(dets / subject / f"{action}.{cam}.mp4.npz",
                         keypoints=rng.uniform(0, 1000, (6, 17, 2)))
        np.savez(dets / subject / f"Everything_ALL.{cams[0]}.mp4.npz",
                 keypoints=rng.uniform(0, 1000, (6, 17, 2)))

    ref_dir = tmp_path / "ref" / "data"
    ref_dir.mkdir(parents=True)
    _run_reference_script("prepare_data_2d_h36m_generic.py",
                          ["-i", str(dets), "-o", "cpn_ft_h36m_dbb"],
                          str(ref_dir))

    our_dir = tmp_path / "ours"
    h36m_2d_generic.main(["-i", str(dets), "-o", "cpn_ft_h36m_dbb",
                          "--data-dir", str(our_dir)])

    _compare_archives(str(ref_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz"),
                      str(our_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz"))
    ours = _load_archive(str(our_dir / "data_2d_h36m_cpn_ft_h36m_dbb.npz"))
    assert "Photo 1" in ours["positions_2d"]["S1"]      # TakingPhoto rename
    assert "WalkDog" in ours["positions_2d"]["S1"]      # WalkingDog rename
    assert "Directions" not in ours["positions_2d"]["S11"]
    assert not any("ALL" in a for s in ours["positions_2d"]
                   for a in ours["positions_2d"][s])


# ---------------------------------------------------------------------------
# H36M 3D prep: archive/.cdf.mat ingest + full GT-2D projection archives
# ---------------------------------------------------------------------------

def _compare_h36m_outputs(ref_dir, our_dir):
    # The 3D archive (mm->m, S11/Directions discard) must be bit-equal.
    _compare_archives(str(ref_dir / "data_3d_h36m.npz"),
                      str(our_dir / "data_3d_h36m.npz"))
    # GT 2D: the reference projects in torch float32, we project in float64
    # on host before the float32 cast, so allow sub-0.05-pixel slack.
    ref = _load_archive(str(ref_dir / "data_2d_h36m_gt.npz"))
    ours = _load_archive(str(our_dir / "data_2d_h36m_gt.npz"))
    assert sorted(ref["positions_2d"]) == sorted(ours["positions_2d"])
    for s in ref["positions_2d"]:
        assert sorted(ref["positions_2d"][s]) == sorted(ours["positions_2d"][s])
        for a in ref["positions_2d"][s]:
            for cam, (pr, po) in enumerate(zip(ref["positions_2d"][s][a],
                                               ours["positions_2d"][s][a])):
                assert pr.shape == po.shape
                np.testing.assert_allclose(
                    pr, po, atol=0.05, err_msg=f"{s}/{a}/cam{cam}")
    for key in ref["metadata"]:  # reference omits layout_name here too
        _assert_same(ref["metadata"][key], ours["metadata"][key],
                     f"metadata/{key}")
    assert ours["metadata"]["layout_name"] == "h36m"


def test_h36m_3d_prep_archive_golden(tmp_path):
    import h5py
    rng = np.random.default_rng(17)
    actions = [f"Act{i} 1" for i in range(29)] + ["Directions"]

    zip_path = tmp_path / "h36m.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        scratch = tmp_path / "scratch.h5"
        for subject in h36m_3d.SUBJECTS:
            for action in actions:
                with h5py.File(scratch, "w") as hf:
                    # (96, T) millimetre world coordinates, person-ish scale
                    hf["3D_positions"] = rng.standard_normal((96, 6)) * 500
                zf.write(scratch,
                         f"h36m/{subject}/MyPoses/3D_positions/{action}.h5")
        scratch.unlink()

    ref_dir = tmp_path / "ref" / "data"
    ref_dir.mkdir(parents=True)
    _run_reference_script("prepare_data_h36m.py",
                          ["--from-archive", str(zip_path)], str(ref_dir))

    our_dir = tmp_path / "ours"
    h36m_3d.main(["--from-archive", str(zip_path), "--data-dir", str(our_dir)])
    _compare_h36m_outputs(ref_dir, our_dir)
    ours = _load_archive(str(our_dir / "data_3d_h36m.npz"))
    assert "Directions" not in ours["positions_3d"]["S11"]


def test_h36m_3d_prep_mat_golden(tmp_path):
    from scipy.io import savemat
    rng = np.random.default_rng(19)
    actions = ([f"Act{i} 1" for i in range(27)]
               + ["Directions", "TakingPhoto 1", "WalkingDog"])

    src = tmp_path / "source"
    for subject in h36m_3d.SUBJECTS:
        d = src / subject / "MyPoseFeatures" / "D3_Positions"
        d.mkdir(parents=True)
        for action in actions:
            cell = np.empty((1, 1), dtype=object)
            cell[0, 0] = rng.standard_normal((6, 96)) * 500
            savemat(d / f"{action}.cdf.mat", {"data": cell})

    ref_dir = tmp_path / "ref" / "data"
    ref_dir.mkdir(parents=True)
    _run_reference_script("prepare_data_h36m.py",
                          ["--from-source", str(src)], str(ref_dir))

    our_dir = tmp_path / "ours"
    h36m_3d.main(["--from-source", str(src), "--data-dir", str(our_dir)])
    _compare_h36m_outputs(ref_dir, our_dir)
    ours = _load_archive(str(our_dir / "data_3d_h36m.npz"))
    assert "Photo 1" in ours["positions_3d"]["S1"]
    assert "WalkDog" in ours["positions_3d"]["S1"]
