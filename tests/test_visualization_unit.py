"""Direct render_animation unit tests for edge cases the CLI e2e renders
don't reach (tests/test_e2e_more.py covers the runner-driven paths)."""

import os

import numpy as np

from videopose3d_tpu.skeleton import Skeleton
from videopose3d_tpu.visualization import render_animation


def _tiny_scene(n=6):
    # 3-joint chain: root -> mid -> end.
    skel = Skeleton(parents=[-1, 0, 1], joints_left=[1], joints_right=[2])
    rng = np.random.default_rng(0)
    kps = rng.uniform(10, 90, (n, 3, 2)).astype(np.float32)
    poses = {"Reconstruction":
             rng.standard_normal((n, 3, 3)).astype(np.float32) * 0.1}
    meta = {"layout_name": "h36m", "num_joints": 3,
            "keypoints_symmetry": [[1], [2]]}
    return kps, meta, poses, skel


def test_gif_survives_sub_1fps_downsample(tmp_path):
    """Review r5: heavy --viz-downsample can push the effective rate under
    0.5 fps; ``int(round(fps))`` handed PillowWriter fps=0 and its
    1000/fps duration math raised ZeroDivisionError AFTER rendering every
    frame.  The fps is now clamped to >= 1."""
    # 220 frames / downsample 101 -> 2 rendered frames at 50/101 ~ 0.495 fps.
    kps, meta, poses, skel = _tiny_scene(n=220)
    out = str(tmp_path / "slow.gif")
    render_animation(kps, meta, poses, skel, fps=50, bitrate=500, azim=70.0,
                     output=out, viewport=(100, 100), downsample=101, size=2)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    from PIL import Image
    with Image.open(out) as im:
        assert im.n_frames == 2
