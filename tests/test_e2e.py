"""End-to-end CLI tests on a tiny synthetic Human3.6M-shaped dataset:
train -> checkpoint -> resume -> evaluate -> semi-supervised, exercising the full
driver (runner.main) in-process on the CPU mesh."""

import os

import numpy as np
import pytest

from videopose3d_tpu import runner

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
ACTIONS = ["Walking 1", "Eating 1"]
N_FRAMES = 50
N_CAMS = 4

H36M_KPS_LEFT = [4, 5, 6, 11, 12, 13]
H36M_KPS_RIGHT = [1, 2, 3, 14, 15, 16]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Build synthetic data_3d_h36m.npz / data_2d_h36m_gt.npz archives in the
    reference's .npz format."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data")

    positions_3d = {}
    for s in SUBJECTS:
        positions_3d[s] = {}
        for a in ACTIONS:
            # World-space positions, meters, 32 joints; rooted near the origin
            # with ~4m camera distances baked into the extrinsics.
            base = rng.standard_normal((N_FRAMES, 1, 3)).astype(np.float32) * 0.1
            joints = rng.standard_normal((N_FRAMES, 32, 3)).astype(np.float32) * 0.2
            positions_3d[s][a] = (base + joints).astype(np.float32)
    np.savez_compressed(root / "data_3d_h36m.npz", positions_3d=positions_3d)

    positions_2d = {}
    for s in SUBJECTS:
        positions_2d[s] = {}
        for a in ACTIONS:
            # 17-joint 2D detections in pixel space, one per camera.
            positions_2d[s][a] = [
                rng.uniform(100, 900, (N_FRAMES, 17, 2)).astype(np.float32)
                for _ in range(N_CAMS)
            ]
    metadata = {
        "layout_name": "h36m",
        "num_joints": 17,
        "keypoints_symmetry": [H36M_KPS_LEFT, H36M_KPS_RIGHT],
    }
    np.savez_compressed(root / "data_2d_h36m_gt.npz",
                        positions_2d=positions_2d, metadata=metadata)
    return str(root)


def _base_args(data_dir, checkpoint_dir, extra=()):
    return [
        "-d", "h36m", "-k", "gt", "--data-dir", data_dir,
        "-c", checkpoint_dir, "-arc", "3,3", "-ch", "16", "-b", "64",
        "--eval-bucket", "16",
    ] + list(extra)


def test_train_checkpoint_resume_evaluate(data_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")

    # Train 2 epochs, checkpointing every epoch.
    runner.main(_base_args(data_dir, ckpt,
                           ["-e", "2", "--checkpoint-frequency", "1"]))
    out = capsys.readouterr().out
    assert "Receptive field: 9 frames" in out
    assert "[1] time" in out and "[2] time" in out
    assert "Protocol #1   (MPJPE) action-wise average:" in out
    assert os.path.exists(os.path.join(ckpt, "epoch_1.bin"))
    assert os.path.exists(os.path.join(ckpt, "epoch_2.bin"))

    # Resume from epoch 1 and train to epoch 3.
    runner.main(_base_args(data_dir, ckpt,
                           ["-e", "3", "--checkpoint-frequency", "1",
                            "-r", "epoch_1.bin"]))
    out = capsys.readouterr().out
    assert "This model was trained for 1 epochs" in out
    assert "[3] time" in out
    assert os.path.exists(os.path.join(ckpt, "epoch_3.bin"))

    # Evaluate the final checkpoint (TTA on).
    runner.main(_base_args(data_dir, ckpt, ["--evaluate", "epoch_3.bin"]))
    out = capsys.readouterr().out
    assert "Test time augmentation: True" in out
    assert "Protocol #2 (P-MPJPE) action-wise average:" in out

    # By-subject breakdown.
    runner.main(_base_args(data_dir, ckpt,
                           ["--evaluate", "epoch_3.bin", "--by-subject"]))
    out = capsys.readouterr().out
    assert "Evaluating on subject S9" in out
    assert "Evaluating on subject S11" in out


def test_semi_supervised_train(data_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt_semi")
    runner.main(_base_args(data_dir, ckpt, [
        "-e", "2", "--warmup", "1", "--checkpoint-frequency", "2",
        "-str", "S1", "-sun", "S5,S6",
    ]))
    out = capsys.readouterr().out
    assert "Semi-supervision on" in out
    assert "2d_train_unsup" in out
    assert os.path.exists(os.path.join(ckpt, "epoch_2.bin"))

    # Semi checkpoint contains the trajectory model; evaluate loads it.
    from videopose3d_tpu.checkpoint import load_checkpoint
    chk = load_checkpoint(os.path.join(ckpt, "epoch_2.bin"))
    assert chk["model_traj"] is not None
    assert chk["random_state_semi"] is not None


def test_eval_torch_reference_checkpoint_format(data_dir, tmp_path, capsys,
                                                reference_modules):
    """A reference-format torch .bin checkpoint loads and evaluates directly."""
    import torch
    ckpt = str(tmp_path / "ckpt_torch")
    os.makedirs(ckpt)
    model = reference_modules.model.TemporalModel(17, 2, 17, [3, 3], channels=16)
    torch.save({"epoch": 7, "model_pos": model.state_dict()},
               os.path.join(ckpt, "ref.bin"))

    runner.main(_base_args(data_dir, ckpt, ["--evaluate", "ref.bin"]))
    out = capsys.readouterr().out
    assert "This model was trained for 7 epochs" in out
    assert "Protocol #1   (MPJPE) action-wise average:" in out


def test_architectures_and_causal(data_dir, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt_causal")
    runner.main(_base_args(data_dir, ckpt,
                           ["-e", "1", "--causal", "--no-eval",
                            "--checkpoint-frequency", "100"]))
    out = capsys.readouterr().out
    assert "Using causal convolutions" in out
    assert "[1] time" in out
