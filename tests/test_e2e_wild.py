"""In-the-wild pipeline e2e (BASELINE config #5, minus the external Detectron
step): synthetic Detectron-format detections -> prepare.custom_2d -> custom
dataset -> run.py -d custom --evaluate <checkpoint> --render -> GIF + export."""

import os

import numpy as np
import pytest

from videopose3d_tpu import runner
from videopose3d_tpu.data.prepare import custom_2d


def _make_detectron_npz(path, n_frames=30, w=640, h=480):
    rng = np.random.default_rng(0)
    boxes, keypoints = [], []
    for i in range(n_frames):
        n_det = 2
        bbs = rng.uniform(0, 100, (n_det, 5)).astype(np.float32)
        bbs[:, 4] = [0.9, 0.4]
        kps = rng.uniform(0, min(w, h), (n_det, 4, 17)).astype(np.float32)
        boxes.append([[], bbs])
        keypoints.append([[], kps])
    np.savez(path, boxes=np.array(boxes, dtype=object),
             keypoints=np.array(keypoints, dtype=object),
             segments=np.array([None] * n_frames, dtype=object),
             metadata={"w": w, "h": h})


def test_wild_pipeline(tmp_path, capsys):
    # Step 1-2: detections -> custom 2D archive.
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    _make_detectron_npz(str(det_dir / "clip.mp4.npz"))
    data_dir = str(tmp_path / "data")
    custom_2d.main(["-i", str(det_dir), "-o", "myvideos",
                    "--data-dir", data_dir])
    capsys.readouterr()

    # Step 3: a checkpoint for a COCO-input (17 kps) -> H36M-output model.
    import jax
    from videopose3d_tpu.models import TemporalModelConfig, init_temporal_model
    from videopose3d_tpu.models.convert import params_to_torch_state_dict
    from videopose3d_tpu.checkpoint import save_checkpoint
    cfg = TemporalModelConfig(num_joints_in=17, in_features=2,
                              num_joints_out=17, filter_widths=(3, 3),
                              dropout=0.25, channels=16)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_checkpoint(str(ckpt_dir / "model.bin"), {
        "epoch": 80, "lr": None,
        "model_pos": params_to_torch_state_dict(params, state),
        "model_traj": None, "random_state": None, "optimizer": None,
        "random_state_semi": None})

    # Step 4: evaluate + render on the custom dataset.
    gif = str(tmp_path / "wild.gif")
    export = str(tmp_path / "wild.npy")
    runner.main([
        "-d", "custom", "-k", "myvideos", "--data-dir", data_dir,
        "-c", str(ckpt_dir), "-arc", "3,3", "-ch", "16", "--eval-bucket", "16",
        "--evaluate", "model.bin", "--render",
        "--viz-subject", "clip.mp4", "--viz-action", "custom",
        "--viz-camera", "0", "--viz-output", gif, "--viz-export", export,
        "--viz-limit", "5", "--viz-size", "2",
    ])
    out = capsys.readouterr().out
    assert "this action is unlabeled" in out  # no GT for wild videos
    assert os.path.exists(gif) and os.path.getsize(gif) > 0
    pred = np.load(export)
    assert pred.shape == (30, 17, 3)


def test_wild_pipeline_causal(tmp_path, capsys):
    """Causal (real-time) variant, as used for streaming applications."""
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    _make_detectron_npz(str(det_dir / "clip.mp4.npz"))
    data_dir = str(tmp_path / "data")
    custom_2d.main(["-i", str(det_dir), "-o", "vids", "--data-dir", data_dir])
    capsys.readouterr()

    import jax
    from videopose3d_tpu.models import TemporalModelConfig, init_temporal_model
    from videopose3d_tpu.models.convert import params_to_torch_state_dict
    from videopose3d_tpu.checkpoint import save_checkpoint
    cfg = TemporalModelConfig(num_joints_in=17, in_features=2,
                              num_joints_out=17, filter_widths=(3, 3),
                              causal=True, dropout=0.25, channels=16)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(1))
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_checkpoint(str(ckpt_dir / "model.bin"), {
        "epoch": 1, "lr": None,
        "model_pos": params_to_torch_state_dict(params, state),
        "model_traj": None, "random_state": None, "optimizer": None,
        "random_state_semi": None})

    export = str(tmp_path / "wild.npy")
    runner.main([
        "-d", "custom", "-k", "vids", "--data-dir", data_dir,
        "-c", str(ckpt_dir), "-arc", "3,3", "-ch", "16", "--causal",
        "-no-tta",  # streaming serves un-augmented frames
        "--eval-bucket", "16", "--evaluate", "model.bin", "--render",
        "--viz-subject", "clip.mp4", "--viz-action", "custom",
        "--viz-camera", "0", "--viz-export", export,
    ])
    out = capsys.readouterr().out
    assert "Using causal convolutions" in out
    pred = np.load(export)
    assert pred.shape == (30, 17, 3)

    # The offline causal render path agrees with the streaming engine.
    from videopose3d_tpu.streaming import StreamingCausalLifter
    archive = np.load(os.path.join(data_dir, "data_2d_custom_vids.npz"),
                      allow_pickle=True)
    kps = archive["positions_2d"].item()["clip.mp4"]["custom"][0]
    from videopose3d_tpu.ops.camera import normalize_screen_coordinates
    kps = np.asarray(normalize_screen_coordinates(
        kps[..., :2], w=640, h=480)).astype(np.float32)
    lifter = StreamingCausalLifter(cfg, params, state)
    lifter.reset(kps[:1].reshape(1, 17, 2))
    streamed = np.concatenate(
        [np.asarray(lifter.step(kps[t].reshape(1, 17, 2))) for t in range(30)],
        axis=0)
    np.testing.assert_allclose(streamed, pred, atol=5e-5)
