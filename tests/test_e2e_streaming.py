"""Streaming serving e2e (BASELINE config #5's terminal step): synthetic
Detectron detections -> custom 2D archive -> ``python -m
videopose3d_tpu.streaming`` with a causal checkpoint -> per-frame poses that
match the OFFLINE causal evaluator frame-for-frame."""

import numpy as np
import pytest

import jax

from videopose3d_tpu import streaming
from videopose3d_tpu.data.prepare import custom_2d


def _make_detectron_npz(path, n_frames, w=640, h=480, seed=0):
    rng = np.random.default_rng(seed)
    boxes, keypoints = [], []
    for _ in range(n_frames):
        bbs = rng.uniform(0, 100, (2, 5)).astype(np.float32)
        bbs[:, 4] = [0.9, 0.4]
        kps = rng.uniform(0, min(w, h), (2, 4, 17)).astype(np.float32)
        boxes.append([[], bbs])
        keypoints.append([[], kps])
    np.savez(path, boxes=np.array(boxes, dtype=object),
             keypoints=np.array(keypoints, dtype=object),
             segments=np.array([None] * n_frames, dtype=object),
             metadata={"w": w, "h": h})


@pytest.fixture
def wild_setup(tmp_path):
    """Two wild clips of different lengths + a causal checkpoint."""
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    _make_detectron_npz(str(det_dir / "clip_a.mp4.npz"), 40, seed=0)
    _make_detectron_npz(str(det_dir / "clip_b.mp4.npz"), 25, seed=1)
    data_dir = str(tmp_path / "data")
    custom_2d.main(["-i", str(det_dir), "-o", "myvideos",
                    "--data-dir", data_dir])

    from videopose3d_tpu.checkpoint import save_checkpoint
    from videopose3d_tpu.models import TemporalModelConfig, init_temporal_model
    from videopose3d_tpu.models.convert import params_to_torch_state_dict
    # (3, 3, 3): the int8 engine wants >= 2 residual blocks.
    cfg = TemporalModelConfig(num_joints_in=17, in_features=2,
                              num_joints_out=17, filter_widths=(3, 3, 3),
                              causal=True, dropout=0.25, channels=16)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "causal.bin")
    save_checkpoint(ckpt, {
        "epoch": 80, "lr": None,
        "model_pos": params_to_torch_state_dict(params, state),
        "model_traj": None, "random_state": None, "optimizer": None,
        "random_state_semi": None})
    return data_dir, ckpt, cfg, params, state


def _offline_causal_predictions(cfg, params, state, data_dir):
    """The offline path: whole-sequence dilated causal evaluation of every
    archive video (what ``run.py -d custom --evaluate`` computes)."""
    from videopose3d_tpu.data.generators import UnchunkedBatcher
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.models.temporal import receptive_field

    videos, streams = streaming._load_wild_streams(data_dir, "myvideos")
    pad = (receptive_field(cfg) - 1) // 2
    evaluator = Evaluator(cfg, joints_flip_perm=None)
    preds = {}
    for video, kps in zip(videos, streams):
        batcher = UnchunkedBatcher(None, None, [kps], pad=pad,
                                   causal_shift=pad, bucket=16)
        _, _, b2, n = next(batcher.next_epoch())
        preds[video] = evaluator.predict(params, state, b2,
                                         augment=False)[0, :n]
    return preds


def test_streaming_cli_matches_offline_causal(wild_setup, tmp_path, capsys):
    data_dir, ckpt, cfg, params, state = wild_setup
    out = str(tmp_path / "streamed.npz")
    streaming.main(["-k", "myvideos", "--data-dir", data_dir,
                    "--checkpoint", ckpt, "-arc", "3,3,3", "-ch", "16",
                    "--output", out])
    printed = capsys.readouterr().out
    assert "streaming 2 video(s)" in printed

    streamed = np.load(out)
    offline = _offline_causal_predictions(cfg, params, state, data_dir)
    assert set(streamed.files) == set(offline)
    for video in offline:
        got, want = streamed[video], offline[video]
        assert got.shape == want.shape == (want.shape[0], 17, 3)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_streaming_cli_int8_engine(wild_setup, tmp_path):
    """The int8 serving engine through the same CLI: mm-scale agreement with
    the bf16 stream (clips here are shorter than the receptive field, also
    exercising the calibration edge-replication)."""
    data_dir, ckpt, *_ = wild_setup
    out_bf16 = str(tmp_path / "s_bf16.npz")
    out_int8 = str(tmp_path / "s_int8.npz")
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16"]
    streaming.main(base + ["--output", out_bf16])
    streaming.main(base + ["--engine", "int8", "--output", out_int8])
    a, b = np.load(out_bf16), np.load(out_int8)
    for video in a.files:
        scale = np.sqrt((a[video] ** 2).mean())
        err = np.linalg.norm(a[video] - b[video], axis=-1).mean()
        assert err < 0.1 * scale, (video, err, scale)


def test_streaming_cli_int8_fused_engine(wild_setup, tmp_path):
    """The single-kernel fused int8 engine through the CLI is bit-identical
    to the per-layer int8 engine (same quantized pytree, same step math —
    see tests/test_streaming_fused.py for the kernel-level parity)."""
    data_dir, ckpt, *_ = wild_setup
    out_int8 = str(tmp_path / "s_int8.npz")
    out_fused = str(tmp_path / "s_fused.npz")
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16"]
    streaming.main(base + ["--engine", "int8", "--output", out_int8])
    streaming.main(base + ["--engine", "int8_fused", "--output", out_fused])
    a, b = np.load(out_int8), np.load(out_fused)
    for video in a.files:
        np.testing.assert_array_equal(a[video], b[video])


def test_streaming_cli_bf16_fused_engine(wild_setup, tmp_path):
    """The single-kernel fused bf16 engine through the CLI is bit-identical
    to the per-layer bf16 engine at the same compute dtype."""
    data_dir, ckpt, *_ = wild_setup
    out_ref = str(tmp_path / "s_bf16.npz")
    out_fused = str(tmp_path / "s_bf16_fused.npz")
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16", "--compute-dtype", "bfloat16"]
    streaming.main(base + ["--output", out_ref])
    streaming.main(base + ["--engine", "bf16_fused", "--output", out_fused])
    a, b = np.load(out_ref), np.load(out_fused)
    for video in a.files:
        np.testing.assert_array_equal(a[video], b[video])

    with pytest.raises(SystemExit):
        streaming.main(base[:-2] + ["--compute-dtype", "float32",
                                    "--engine", "bf16_fused",
                                    "--output", out_fused])


def test_streaming_cli_video_subset(wild_setup, tmp_path):
    data_dir, ckpt, *_ = wild_setup
    out = str(tmp_path / "one.npz")
    streaming.main(["-k", "myvideos", "--data-dir", data_dir,
                    "--checkpoint", ckpt, "-arc", "3,3,3", "-ch", "16",
                    "--videos", "clip_b.mp4", "--output", out])
    data = np.load(out)
    assert data.files == ["clip_b.mp4"]
    assert data["clip_b.mp4"].shape == (25, 17, 3)

    with pytest.raises(KeyError):
        streaming.main(["-k", "myvideos", "--data-dir", data_dir,
                        "--checkpoint", ckpt, "-arc", "3,3,3", "-ch", "16",
                        "--videos", "nope.mp4", "--output", out])


def test_streaming_cli_frames_per_step(wild_setup, tmp_path):
    """Micro-batched dispatches through the CLI produce the same poses as
    per-frame streaming (k does not divide the clip lengths: exercises the
    padded final chunk and per-video trimming)."""
    data_dir, ckpt, *_ = wild_setup
    out1 = str(tmp_path / "k1.npz")
    out4 = str(tmp_path / "k4.npz")
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16"]
    streaming.main(base + ["--output", out1])
    streaming.main(base + ["--frames-per-step", "4", "--output", out4])
    a, b = np.load(out1), np.load(out4)
    for video in a.files:
        np.testing.assert_allclose(a[video], b[video], atol=2e-5)


def test_streaming_cli_bf16_fused_multi(wild_setup, tmp_path):
    """--engine bf16_fused + --frames-per-step k>1 routes through the bf16
    k-frame single-kernel path (stream_step_bf16_multi_fused): bit-identical
    to the XLA k-frame bf16 engine at the same compute dtype."""
    data_dir, ckpt, *_ = wild_setup
    out_xla = str(tmp_path / "m_bf16.npz")
    out_fused = str(tmp_path / "m_bf16_fused.npz")
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16", "--compute-dtype", "bfloat16",
            "--frames-per-step", "4"]
    streaming.main(base + ["--engine", "bf16", "--output", out_xla])
    streaming.main(base + ["--engine", "bf16_fused", "--output", out_fused])
    a, b = np.load(out_xla), np.load(out_fused)
    for video in a.files:
        np.testing.assert_array_equal(a[video], b[video])


def test_streaming_cli_int8_fused_multi(wild_setup, tmp_path):
    """--engine int8_fused + --frames-per-step k>1 routes through the
    single-kernel k-frame slab path (stream_step_int8_multi_fused, the
    skew-pipelined kernel): bit-identical to the XLA k-frame int8 engine,
    including the padded final chunk and per-video trimming."""
    data_dir, ckpt, *_ = wild_setup
    out_xla = str(tmp_path / "m_int8.npz")
    out_fused = str(tmp_path / "m_fused.npz")
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16", "--frames-per-step", "4"]
    streaming.main(base + ["--engine", "int8", "--output", out_xla])
    streaming.main(base + ["--engine", "int8_fused", "--output", out_fused])
    a, b = np.load(out_xla), np.load(out_fused)
    for video in a.files:
        np.testing.assert_array_equal(a[video], b[video])


def test_streaming_cli_shard_devices(wild_setup, tmp_path):
    """--shard-devices splits the stream batch over local devices (with
    repeated-stream padding when the count does not divide): outputs must
    match the single-device run to f32 noise for both a plain and a fused
    engine."""
    data_dir, ckpt, *_ = wild_setup
    base = ["-k", "myvideos", "--data-dir", data_dir, "--checkpoint", ckpt,
            "-arc", "3,3,3", "-ch", "16"]
    for engine in ("bf16", "int8_fused"):
        out_one = str(tmp_path / f"one_{engine}.npz")
        out_sharded = str(tmp_path / f"sh_{engine}.npz")
        streaming.main(base + ["--engine", engine, "--output", out_one])
        # 3 devices over 2 videos exercises the padding path too.
        streaming.main(base + ["--engine", engine, "--shard-devices", "3",
                               "--output", out_sharded])
        a, b = np.load(out_one), np.load(out_sharded)
        assert sorted(a.files) == sorted(b.files)
        for video in a.files:
            np.testing.assert_allclose(a[video], b[video], atol=2e-5)
