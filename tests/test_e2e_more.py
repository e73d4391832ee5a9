"""Additional end-to-end coverage: HumanEva dataset path, stride>1 (dilated
training form), --dense, --disable-optimizations, --subset/--downsample, and the
render mode (gif output)."""

import os

import numpy as np
import pytest

from videopose3d_tpu import runner

HE_SUBJECTS = ["Train/S1", "Train/S2", "Validate/S1", "Validate/S2"]
HE_ACTIONS = ["Walking 1 chunk0", "Jog 1 chunk0"]
N_FRAMES = 40
N_CAMS = 3

HE_KPS_LEFT = [2, 3, 4, 8, 9, 10]
HE_KPS_RIGHT = [5, 6, 7, 11, 12, 13]


@pytest.fixture(scope="module")
def humaneva_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data_he")

    positions_3d = {}
    for s in HE_SUBJECTS:
        positions_3d[s] = {}
        for a in HE_ACTIONS:
            positions_3d[s][a] = (rng.standard_normal(
                (N_FRAMES, 15, 3)).astype(np.float32) * 0.2)
    np.savez_compressed(root / "data_3d_humaneva15.npz",
                        positions_3d=positions_3d)

    positions_2d = {}
    for s in HE_SUBJECTS:
        positions_2d[s] = {}
        for a in HE_ACTIONS:
            positions_2d[s][a] = [
                rng.uniform(50, 600, (N_FRAMES, 15, 2)).astype(np.float32)
                for _ in range(N_CAMS)]
    metadata = {"layout_name": "humaneva15", "num_joints": 15,
                "keypoints_symmetry": [HE_KPS_LEFT, HE_KPS_RIGHT]}
    np.savez_compressed(root / "data_2d_humaneva15_gt.npz",
                        positions_2d=positions_2d, metadata=metadata)
    return str(root)


def test_humaneva_train_eval(humaneva_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt_he")
    runner.main([
        "-d", "humaneva15", "-k", "gt", "--data-dir", humaneva_dir,
        "-c", ckpt, "-arc", "3,3", "-ch", "16", "-b", "32",
        "-str", "Train/S1,Train/S2", "-ste", "Validate/S1,Validate/S2",
        "-a", "Walk,Jog", "-e", "1", "--eval-bucket", "16", "--by-subject",
        "--checkpoint-frequency", "1",
    ])
    out = capsys.readouterr().out
    assert "[1] time" in out
    assert "Evaluating on subject Validate/S1" in out
    assert "----Walking----" in out
    assert os.path.exists(os.path.join(ckpt, "epoch_1.bin"))


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    # Reuse the builder from test_e2e.
    from tests.test_e2e import data_dir as _fixture  # noqa: F401
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data_h36m2")
    subjects = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
    actions = ["Walking 1"]
    positions_3d = {s: {a: rng.standard_normal((40, 32, 3)).astype(np.float32) * 0.2
                        for a in actions} for s in subjects}
    np.savez_compressed(root / "data_3d_h36m.npz", positions_3d=positions_3d)
    positions_2d = {s: {a: [rng.uniform(100, 900, (40, 17, 2)).astype(np.float32)
                            for _ in range(4)] for a in actions}
                    for s in subjects}
    metadata = {"layout_name": "h36m", "num_joints": 17,
                "keypoints_symmetry": [[4, 5, 6, 11, 12, 13],
                                       [1, 2, 3, 14, 15, 16]]}
    np.savez_compressed(root / "data_2d_h36m_gt.npz",
                        positions_2d=positions_2d, metadata=metadata)
    return str(root)


def _args(data_dir, ckpt, extra):
    return ["-d", "h36m", "-k", "gt", "--data-dir", data_dir, "-c", ckpt,
            "-arc", "3,3", "-ch", "16", "-b", "32", "--eval-bucket", "16",
            "--no-eval", "--checkpoint-frequency", "100", "-e", "1"] + extra


def test_stride_gt_1_uses_dilated_form(h36m_dir, tmp_path, capsys):
    runner.main(_args(h36m_dir, str(tmp_path / "c1"), ["-s", "2"]))
    out = capsys.readouterr().out
    assert "[1] time" in out


def test_dense_ablation(h36m_dir, tmp_path, capsys):
    runner.main(_args(h36m_dir, str(tmp_path / "c2"), ["--dense"]))
    out = capsys.readouterr().out
    assert "[1] time" in out


def test_disable_optimizations(h36m_dir, tmp_path, capsys):
    runner.main(_args(h36m_dir, str(tmp_path / "c3"),
                      ["--disable-optimizations"]))
    out = capsys.readouterr().out
    assert "[1] time" in out


def test_semi_projection_ablations(h36m_dir, tmp_path, capsys):
    """Semi-supervised ablation flags (run.py:366-379 projection choices):
    --linear-projection swaps the distortion model for the linear one inside
    the reconstruction loss; --no-proj drops the 2D term entirely."""
    for i, flag in enumerate(("--linear-projection", "--no-proj")):
        runner.main(_args(h36m_dir, str(tmp_path / f"sp{i}"),
                          ["-str", "S1", "-sun", "S5,S6", "--warmup", "0",
                           flag]))
        out = capsys.readouterr().out
        assert "Semi-supervision" in out and "[1] time" in out


def test_subset_and_downsample(h36m_dir, tmp_path, capsys):
    runner.main(_args(h36m_dir, str(tmp_path / "c4"),
                      ["--subset", "0.5", "--downsample", "2"]))
    out = capsys.readouterr().out
    assert "[1] time" in out


def test_render_gif(h36m_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "c5")
    runner.main(_args(h36m_dir, ckpt, ["--checkpoint-frequency", "1"]))
    capsys.readouterr()
    gif = str(tmp_path / "out.gif")
    export = str(tmp_path / "pred.npy")
    runner.main([
        "-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt,
        "-arc", "3,3", "-ch", "16", "--eval-bucket", "16",
        "--evaluate", "epoch_1.bin", "--render",
        "--viz-subject", "S9", "--viz-action", "Walking 1",
        "--viz-camera", "0", "--viz-output", gif, "--viz-export", export,
        "--viz-limit", "6", "--viz-size", "2",
    ])
    out = capsys.readouterr().out
    assert "Rendering..." in out
    assert os.path.exists(gif) and os.path.getsize(gif) > 0
    pred = np.load(export)
    assert pred.shape[1:] == (17, 3)


def test_evaluate_with_int8_serving_engine(h36m_dir, tmp_path, capsys):
    """--serving-engine int8 drives the full evaluate pipeline through the
    w8a8 kernels (interpret mode on CPU)."""
    ckpt = str(tmp_path / "c_int8")
    runner.main(_args(h36m_dir, ckpt,
                      ["-arc", "3,3,3", "--checkpoint-frequency", "1"]))
    capsys.readouterr()
    runner.main([
        "-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt,
        "-arc", "3,3,3", "-ch", "16", "--eval-bucket", "32",
        "--evaluate", "epoch_1.bin", "--serving-engine", "int8",
    ])
    out = capsys.readouterr().out
    assert "Protocol #1   (MPJPE) action-wise average:" in out


def test_hyperparameter_and_runtime_flags(h36m_dir, tmp_path, capsys):
    """The remaining flag surface end-to-end: hyperparameter overrides
    (-drop/-lr/-lrd), -no-da (no flip augmentation), --no-mesh (unsharded),
    --remat, --rng-impl threefry2x32, --seed, and --profile-dir trace capture
    (reference flags: /root/reference/common/arguments.py:37-47)."""
    ckpt = str(tmp_path / "c_flags")
    profile_dir = str(tmp_path / "trace")
    runner.main(_args(h36m_dir, ckpt, [
        "-drop", "0.1", "-lr", "0.003", "-lrd", "0.9", "-no-da",
        "--no-mesh", "--remat", "--rng-impl", "threefry2x32",
        "--seed", "7", "--checkpoint-frequency", "1",
        "--profile-dir", profile_dir,
    ]))
    out = capsys.readouterr().out
    assert "[1] time" in out
    assert os.path.exists(os.path.join(ckpt, "epoch_1.bin"))
    # A jax.profiler trace directory was written for the first epoch.
    assert any(f.endswith(".xplane.pb")
               for _, _, files in os.walk(profile_dir) for f in files)


def test_render_variant_flags(h36m_dir, tmp_path, capsys):
    """Render with --viz-no-ground-truth / --viz-downsample / --viz-bitrate:
    fewer viewports, temporally pooled frames (reference:
    /root/reference/common/visualization.py:58-60, run.py:751-782)."""
    ckpt = str(tmp_path / "c_viz2")
    runner.main(_args(h36m_dir, ckpt, ["--checkpoint-frequency", "1"]))
    capsys.readouterr()
    gif = str(tmp_path / "out2.gif")
    runner.main([
        "-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt,
        "-arc", "3,3", "-ch", "16", "--eval-bucket", "16",
        "--evaluate", "epoch_1.bin", "--render",
        "--viz-subject", "S9", "--viz-action", "Walking 1",
        "--viz-camera", "0", "--viz-output", gif,
        "--viz-limit", "8", "--viz-size", "2",
        "--viz-no-ground-truth", "--viz-downsample", "2", "--viz-bitrate", "500",
    ])
    out = capsys.readouterr().out
    assert "Rendering..." in out
    assert os.path.exists(gif) and os.path.getsize(gif) > 0
    from PIL import Image
    with Image.open(gif) as im:
        # --viz-limit counts *rendered* frames and applies after the temporal
        # pooling (reference: limit indexes the downsampled stream,
        # visualization.py:124-130 + FuncAnimation frames=limit), so the
        # 40-frame sequence pools to 20 and the limit renders 8 of them.
        assert im.n_frames == 8


def test_render_with_video_overlay_and_skip(h36m_dir, tmp_path, capsys):
    """--viz-video + --viz-skip: overlay frames behind the 2D viewport,
    trimming the pose streams by the skip (reference run.py:771-782 /
    visualization.py:109-121).  Uses a GIF input so the PIL fallback decoder
    covers machines without ffmpeg."""
    from PIL import Image
    video = str(tmp_path / "input.gif")
    frames = [Image.fromarray(
        np.full((64, 64, 3), (i * 6) % 255, np.uint8)) for i in range(40)]
    frames[0].save(video, save_all=True, append_images=frames[1:],
                   duration=20, loop=0)

    ckpt = str(tmp_path / "c_viz3")
    runner.main(_args(h36m_dir, ckpt, ["--checkpoint-frequency", "1"]))
    capsys.readouterr()
    gif = str(tmp_path / "out3.gif")
    runner.main([
        "-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt,
        "-arc", "3,3", "-ch", "16", "--eval-bucket", "16",
        "--evaluate", "epoch_1.bin", "--render",
        "--viz-subject", "S9", "--viz-action", "Walking 1",
        "--viz-camera", "0", "--viz-output", gif,
        "--viz-video", video, "--viz-skip", "2",
        "--viz-limit", "8", "--viz-size", "2",
    ])
    out = capsys.readouterr().out
    assert "Rendering..." in out
    # limit=8 caps decoded frame *indices*; skip=2 drops the first two, so
    # 6 background frames remain and bound the rendered animation.
    with Image.open(gif) as im:
        assert im.n_frames == 6


def test_remaining_cli_flag_wiring(h36m_dir, tmp_path, capsys):
    """argparse→runner wiring for the flags whose behavior is tested at the
    API level but whose CLI spelling was never driven: --no-scan-epoch
    (stepwise trainer branch), --scan-chunk (bounded scan programs),
    --eval-bucket-pow2, --train-engine pallas (interpret on CPU), and
    --no-bone-length in semi mode (reference -no-bone-length,
    /root/reference/run.py:366-379)."""
    ckpt = str(tmp_path / "c_wire1")
    runner.main(_args(h36m_dir, ckpt, ["--no-scan-epoch",
                                       "--train-engine", "pallas"]))
    out = capsys.readouterr().out
    assert "[1] time" in out

    # --gather-impl: 'xla' forced must run (and skip the lane-padded
    # upload); 'auto' on CPU resolves to the XLA gather.
    ckpt = str(tmp_path / "c_wire_gx")
    runner.main(_args(h36m_dir, ckpt, ["--gather-impl", "xla"]))
    out = capsys.readouterr().out
    assert "[1] time" in out

    ckpt = str(tmp_path / "c_wire2")
    runner.main(["-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt,
                 "-arc", "3,3", "-ch", "16", "-b", "32",
                 "--eval-bucket", "16", "--eval-bucket-pow2",
                 "--checkpoint-frequency", "100", "-e", "1",
                 "--scan-chunk", "2",
                 "-str", "S1", "-sun", "S5,S6", "--warmup", "0",
                 "--no-bone-length"])
    out = capsys.readouterr().out
    assert "Semi-supervision" in out and "[1] time" in out


def test_export_training_curves(h36m_dir, tmp_path, capsys):
    """--export-training-curves writes loss-curve PNGs from epoch 4 on
    (reference run.py:608-649: the export is gated on `epoch > 3` and plots
    the series from index 3).  Supervised writes loss_3d.png only; the
    semi-supervised branch adds loss_traj.png and loss_2d.png."""
    ckpt = str(tmp_path / "c_curves")
    runner.main(["-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt,
                 "-arc", "3,3", "-ch", "16", "-b", "32", "--eval-bucket", "16",
                 "--checkpoint-frequency", "100", "-e", "4",
                 "--export-training-curves"])
    out = capsys.readouterr().out
    assert "[4] time" in out
    assert os.path.getsize(os.path.join(ckpt, "loss_3d.png")) > 0
    assert not os.path.exists(os.path.join(ckpt, "loss_traj.png"))

    ckpt2 = str(tmp_path / "c_curves_semi")
    runner.main(["-d", "h36m", "-k", "gt", "--data-dir", h36m_dir, "-c", ckpt2,
                 "-arc", "3,3", "-ch", "16", "-b", "32", "--eval-bucket", "16",
                 "--checkpoint-frequency", "100", "-e", "4",
                 "-str", "S1", "-sun", "S5,S6", "--warmup", "0",
                 "--export-training-curves"])
    out = capsys.readouterr().out
    assert "[4] time" in out
    for name in ("loss_3d.png", "loss_traj.png", "loss_2d.png"):
        assert os.path.getsize(os.path.join(ckpt2, name)) > 0


def test_resumed_metrics_log(h36m_dir, tmp_path, capsys):
    """Resuming from a pickle checkpoint with --metrics-log serializes
    cleanly: the checkpoint payload stores epoch/lr as 0-d numpy arrays,
    which the runner now coerces to Python scalars at resume."""
    import json
    ckpt = str(tmp_path / "c_resume_log")
    runner.main(_args(h36m_dir, ckpt, ["--checkpoint-frequency", "1"]))
    capsys.readouterr()

    metrics = str(tmp_path / "metrics.jsonl")
    runner.main(_args(h36m_dir, ckpt, [
        "-e", "2", "-r", "epoch_1.bin", "--checkpoint-frequency", "1",
        "--metrics-log", metrics]))
    out = capsys.readouterr().out
    assert "[2] time" in out
    records = [json.loads(l) for l in open(metrics)]
    assert records and records[-1]["epoch"] == 2


class TestPilVideoFallback:
    """probe_video / read_video without ffmpeg: genuine animations (including
    our renderer's own 1-frame GIFs) decode via PIL; still images raise the
    clear tool-missing error instead of becoming a 1-frame 50 fps video."""

    @staticmethod
    def _no_ffmpeg(monkeypatch):
        import shutil as _shutil
        from videopose3d_tpu import visualization as vz
        monkeypatch.setattr(vz.shutil, "which", lambda tool: None)
        return vz

    def test_single_frame_gif_roundtrips(self, tmp_path, monkeypatch):
        from PIL import Image
        import numpy as np
        gif = str(tmp_path / "one.gif")
        Image.fromarray(np.zeros((8, 6, 3), np.uint8)).save(gif)
        vz = self._no_ffmpeg(monkeypatch)
        w, h, fps = vz.probe_video(gif)
        assert (w, h) == (6, 8) and fps > 0
        frames = list(vz.read_video(gif))
        assert len(frames) == 1 and frames[0].shape == (8, 6, 3)

    def test_multi_frame_gif(self, tmp_path, monkeypatch):
        from PIL import Image
        import numpy as np
        gif = str(tmp_path / "anim.gif")
        ims = [Image.fromarray(np.full((8, 6, 3), v, np.uint8))
               for v in (0, 80, 160)]
        ims[0].save(gif, save_all=True, append_images=ims[1:], duration=40)
        vz = self._no_ffmpeg(monkeypatch)
        assert vz.probe_video(gif)[2] == pytest.approx(25.0)
        assert len(list(vz.read_video(gif))) == 3

    def test_still_png_rejected(self, tmp_path, monkeypatch):
        from PIL import Image
        import numpy as np
        png = str(tmp_path / "still.png")
        Image.fromarray(np.zeros((8, 6, 3), np.uint8)).save(png)
        vz = self._no_ffmpeg(monkeypatch)
        with pytest.raises(RuntimeError, match="ffprobe"):
            vz.probe_video(png)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            list(vz.read_video(png))
