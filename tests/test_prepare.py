"""Data-preparation pipeline tests: layout metadata parity, importers, the custom
(in-the-wild) NaN-interpolation decoder, and the H36M GT-2D projection path."""

import os

import numpy as np
import pytest

from videopose3d_tpu.data.prepare.layouts import (
    LAYOUTS, suggest_metadata, suggest_pose_importer,
    import_cpn_poses, import_detectron_poses)
from videopose3d_tpu.data.prepare import custom_2d


def test_layout_metadata_parity(reference_modules):
    import sys
    sys.path.insert(0, "/root/reference/data")
    try:
        import data_utils as ref
    finally:
        sys.path.pop(0)
    for name, ref_meta in [("mpii", ref.mpii_metadata), ("coco", ref.coco_metadata),
                           ("h36m", ref.h36m_metadata),
                           ("humaneva15", ref.humaneva15_metadata),
                           ("humaneva20", ref.humaneva20_metadata)]:
        ours = LAYOUTS[name]
        assert ours["num_joints"] == ref_meta["num_joints"]
        assert ours["keypoints_symmetry"] == ref_meta["keypoints_symmetry"]
        assert ours["layout_name"] == ref_meta["layout_name"]


def test_suggest_metadata_and_importer():
    assert suggest_metadata("detectron_pt_coco")["layout_name"] == "coco"
    assert suggest_metadata("sh_pt_mpii")["layout_name"] == "mpii"
    assert suggest_metadata("cpn_ft_h36m_dbb")["layout_name"] == "h36m"
    assert suggest_pose_importer("cpn_ft_h36m_dbb") is import_cpn_poses
    assert suggest_pose_importer("detectron_x") is import_detectron_poses
    with pytest.raises(KeyError):
        suggest_metadata("unknown_layout")
    with pytest.raises(KeyError):
        suggest_pose_importer("unknown_importer")


def test_cpn_importer(tmp_path):
    kp = np.random.rand(7, 17, 3).astype(np.float32)
    path = tmp_path / "cpn.npz"
    np.savez(path, keypoints=kp)
    out = import_cpn_poses(str(path))
    np.testing.assert_array_equal(out, kp[:, :, :2])


def _make_detectron_npz(path, n_frames=6, miss_frames=(2, 3)):
    """Synth Detectron1-format per-video detections with some missing frames."""
    rng = np.random.default_rng(0)
    boxes, keypoints = [], []
    for i in range(n_frames):
        if i in miss_frames:
            boxes.append([[], np.zeros((0, 5), np.float32)])
            keypoints.append([[], []])
        else:
            n_det = 2
            bbs = rng.uniform(0, 100, (n_det, 5)).astype(np.float32)
            bbs[0, 4] = 0.9  # best
            bbs[1, 4] = 0.3
            kps = rng.uniform(0, 100, (n_det, 4, 17)).astype(np.float32)
            boxes.append([[], bbs])
            keypoints.append([[], kps])
    np.savez(path, boxes=np.array(boxes, dtype=object),
             keypoints=np.array(keypoints, dtype=object),
             segments=np.array([None] * n_frames, dtype=object),
             metadata={"w": 640, "h": 480})


def test_custom_decode_interpolation(tmp_path):
    path = str(tmp_path / "video.mp4.npz")
    _make_detectron_npz(path)
    data, metadata = custom_2d.decode(path)
    kp = data[0]["keypoints"]
    bb = data[0]["bounding_boxes"]
    assert kp.shape == (6, 17, 2)
    assert np.isfinite(kp).all() and np.isfinite(bb).all()
    # Interpolated frames lie between their neighbours.
    for j in range(17):
        for c in range(2):
            lo, hi = sorted((kp[1, j, c], kp[4, j, c]))
            assert lo - 1e-4 <= kp[2, j, c] <= hi + 1e-4
    assert metadata == {"w": 640, "h": 480}


def test_custom_2d_main(tmp_path):
    det_dir = tmp_path / "dets"
    det_dir.mkdir()
    _make_detectron_npz(str(det_dir / "myvideo.mp4.npz"))
    out_dir = tmp_path / "data"
    custom_2d.main(["-i", str(det_dir), "-o", "test", "--data-dir", str(out_dir)])

    archive = np.load(out_dir / "data_2d_custom_test.npz", allow_pickle=True)
    positions = archive["positions_2d"].item()
    metadata = archive["metadata"].item()
    assert "myvideo.mp4" in positions
    assert positions["myvideo.mp4"]["custom"][0].shape == (6, 17, 2)
    assert metadata["video_metadata"]["myvideo.mp4"] == {"w": 640, "h": 480}
    assert metadata["layout_name"] == "coco"

    # The archive round-trips through CustomDataset.
    from videopose3d_tpu.datasets.custom import CustomDataset
    ds = CustomDataset(str(out_dir / "data_2d_custom_test.npz"))
    assert "myvideo.mp4" in ds.subjects()
    assert ds.cameras()["myvideo.mp4"][0]["res_w"] == 640
    assert ds.skeleton().num_joints() == 17


def test_h36m_gt_2d_projection_roundtrip(tmp_path, reference_modules):
    """GT-2D generation: project synthetic mocap and verify the pixel-space
    output matches the reference's camera pipeline."""
    rng = np.random.default_rng(1)
    positions = {"S1": {"Walking 1": rng.standard_normal((12, 32, 3))
                        .astype(np.float32) * 0.3}}
    np.savez_compressed(tmp_path / "data_3d_h36m.npz", positions_3d=positions)

    from videopose3d_tpu.data.prepare.h36m_3d import generate_gt_2d
    generate_gt_2d(str(tmp_path / "data_3d_h36m.npz"),
                   str(tmp_path / "data_2d_h36m_gt.npz"))

    ours = np.load(tmp_path / "data_2d_h36m_gt.npz", allow_pickle=True)
    pos2d = ours["positions_2d"].item()["S1"]["Walking 1"]
    assert len(pos2d) == 4
    assert pos2d[0].shape == (12, 17, 2)

    # Reference pipeline on the same data for camera 0.
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from common.camera import (world_to_camera as ref_w2c,
                               project_to_2d as ref_proj,
                               image_coordinates as ref_img)
    from common.utils import wrap as ref_wrap
    from tests.conftest import fresh_reference_h36m_dataset
    ref_ds = fresh_reference_h36m_dataset(str(tmp_path / "data_3d_h36m.npz"))
    anim = ref_ds["S1"]["Walking 1"]
    cam = anim["cameras"][0]
    pos_3d = ref_w2c(anim["positions"], R=cam["orientation"],
                     t=cam["translation"])
    pos_2d = ref_wrap(ref_proj, pos_3d, cam["intrinsic"], unsqueeze=True)
    want = ref_img(pos_2d, w=cam["res_w"], h=cam["res_h"])
    np.testing.assert_allclose(pos2d[0], want, atol=2e-4)
