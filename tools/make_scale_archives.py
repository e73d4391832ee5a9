#!/usr/bin/env python
"""Generate full-size SYNTHETIC dataset archives for at-scale CLI runs.

The real H36M / HumanEva archives cannot exist in this zero-egress
environment (/root/reference/DATASETS.md documents the download flow), so
throughput / end-to-end workflow measurements run the production CLI on
synthetic archives of the SAME shape and scale: same subjects, same
action/camera structure, same .npz schema as the prep scripts' outputs
(reference data/prepare_data_h36m.py:148-173 schema; see DATASETS.md).
Accuracy numbers from these archives are meaningless — only wall time,
throughput, and exit status are.

Scales:
  h36m       7 subjects x 30 actions x 4 cams x 2600 frames
             (1.56M train + 624k test frames — matches the real dataset's
             ~3.6M total 2D poses order; the round-4 sweep's recipe)
  humaneva15 Train/S1-3 + Validate/S1-3 x {Walking,Jog,Box} 1 chunk0 x
             3 cams x 2000 frames (~54k train frames — the real
             HumanEva-I order of magnitude, README.md:89 trains it in
             ~50 min / 1000 epochs on a Pascal GPU)

Usage: python tools/make_scale_archives.py --out /tmp/h36m_scale
       python tools/make_scale_archives.py --dataset humaneva15 --out /tmp/he_scale
"""

import argparse
import os
import time

import numpy as np

H36M_SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
H36M_ACTIONS = [f"{a} {i}" for a in [
    "Walking", "Eating", "Smoking", "Discussion", "Directions", "Greeting",
    "Phoning", "Posing", "Purchases", "Sitting", "SittingDown", "Photo",
    "Waiting", "WalkDog", "WalkTogether"] for i in (1, 2)]

HE_SUBJECTS = ["Train/S1", "Train/S2", "Train/S3",
               "Validate/S1", "Validate/S2", "Validate/S3"]
HE_ACTIONS = ["Walking 1 chunk0", "Jog 1 chunk0", "Box 1 chunk0"]


def make_h36m(out, n_frames):
    rng = np.random.default_rng(0)
    p3, p2 = {}, {}
    for s in H36M_SUBJECTS:
        p3[s] = {a: (rng.standard_normal((n_frames, 32, 3)) * 0.2)
                 .astype(np.float32) for a in H36M_ACTIONS}
        p2[s] = {a: [rng.uniform(100, 900, (n_frames, 17, 2))
                     .astype(np.float32) for _ in range(4)]
                 for a in H36M_ACTIONS}
    np.savez(os.path.join(out, "data_3d_h36m.npz"), positions_3d=p3)
    meta = {"layout_name": "h36m", "num_joints": 17,
            "keypoints_symmetry": [[4, 5, 6, 11, 12, 13],
                                   [1, 2, 3, 14, 15, 16]]}
    np.savez(os.path.join(out, "data_2d_h36m_gt.npz"),
             positions_2d=p2, metadata=meta)
    train = 5 * len(H36M_ACTIONS) * 4 * n_frames
    test = 2 * len(H36M_ACTIONS) * 4 * n_frames
    print(f"h36m archives: train 2D frames {train}, test {test}")


def make_humaneva(out, n_frames):
    rng = np.random.default_rng(0)
    p3, p2 = {}, {}
    for s in HE_SUBJECTS:
        p3[s] = {a: (rng.standard_normal((n_frames, 15, 3)) * 0.2)
                 .astype(np.float32) for a in HE_ACTIONS}
        p2[s] = {a: [rng.uniform(50, 600, (n_frames, 15, 2))
                     .astype(np.float32) for _ in range(3)]
                 for a in HE_ACTIONS}
    np.savez(os.path.join(out, "data_3d_humaneva15.npz"), positions_3d=p3)
    meta = {"layout_name": "humaneva15", "num_joints": 15,
            "keypoints_symmetry": [[2, 3, 4, 8, 9, 10], [5, 6, 7, 11, 12, 13]]}
    np.savez(os.path.join(out, "data_2d_humaneva15_gt.npz"),
             positions_2d=p2, metadata=meta)
    half = 3 * len(HE_ACTIONS) * 3 * n_frames
    print(f"humaneva15 archives: train 2D frames {half}, validate {half}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="h36m",
                    choices=["h36m", "humaneva15"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=None,
                    help="frames per (subject, action, camera) sequence "
                         "(default: 2600 h36m / 2000 humaneva)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    if args.dataset == "h36m":
        make_h36m(args.out, args.frames or 2600)
    else:
        make_humaneva(args.out, args.frames or 2000)
    print(f"built in {time.time() - t0:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
