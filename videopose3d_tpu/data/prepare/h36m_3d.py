"""Human3.6M 3D archive builder + ground-truth 2D projection.

Capability parity target: ``/root/reference/data/prepare_data_h36m.py`` — three
ingest paths (Martinez-preprocessed .h5 zip, MATLAB-converted ``.cdf.mat``, raw
``.cdf`` via cdflib), mm->m conversion, the corrupted ``S11/Directions`` video
dropped, TakingPhoto->Photo / WalkingDog->WalkDog canonicalization, and GT 2D
generation by projecting the mocap through every camera.

Usage::

    python -m videopose3d_tpu.data.prepare.h36m_3d --from-archive h36m.zip \
        [--data-dir data]
"""

from __future__ import annotations

import argparse
import os
import zipfile
from glob import glob
from shutil import rmtree

import numpy as np

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]


def _canonical(action: str) -> str:
    return action.replace("TakingPhoto", "Photo").replace("WalkingDog", "WalkDog")


def convert_from_archive(archive_path: str, workdir: str) -> dict:
    """Martinez et al. preprocessed zip of per-action .h5 files."""
    import h5py
    print("Extracting Human3.6M dataset from", archive_path)
    with zipfile.ZipFile(archive_path, "r") as archive:
        archive.extractall(workdir)

    print("Converting...")
    output = {}
    for subject in SUBJECTS:
        output[subject] = {}
        file_list = glob(os.path.join(workdir, "h36m", subject,
                                      "MyPoses/3D_positions/*.h5"))
        assert len(file_list) == 30, (
            f"Expected 30 files for subject {subject}, got {len(file_list)}")
        for f in file_list:
            action = os.path.splitext(os.path.basename(f))[0]
            if subject == "S11" and action == "Directions":
                continue  # corrupted video
            with h5py.File(f, "r") as hf:
                positions = hf["3D_positions"][()].reshape(32, 3, -1)
                positions = positions.transpose(2, 0, 1) / 1000.0
                output[subject][action] = positions.astype("float32")
    rmtree(os.path.join(workdir, "h36m"))
    return output


def convert_from_source_mat(source_path: str) -> dict:
    """Original dataset pre-converted to .cdf.mat by data/convert_cdf_to_mat.m."""
    from scipy.io import loadmat
    output = {}
    for subject in SUBJECTS:
        output[subject] = {}
        file_list = glob(os.path.join(
            source_path, subject, "MyPoseFeatures/D3_Positions/*.cdf.mat"))
        assert len(file_list) == 30, (
            f"Expected 30 files for subject {subject}, got {len(file_list)}")
        for f in file_list:
            action = os.path.splitext(os.path.splitext(os.path.basename(f))[0])[0]
            if subject == "S11" and action == "Directions":
                continue
            hf = loadmat(f)
            positions = hf["data"][0, 0].reshape(-1, 32, 3) / 1000.0
            output[subject][_canonical(action)] = positions.astype("float32")
    return output


def convert_from_source_cdf(source_path: str) -> dict:
    """Original dataset via raw .cdf files (requires cdflib)."""
    import cdflib
    output = {}
    for subject in SUBJECTS:
        output[subject] = {}
        file_list = glob(os.path.join(
            source_path, subject, "MyPoseFeatures/D3_Positions/*.cdf"))
        assert len(file_list) == 30, (
            f"Expected 30 files for subject {subject}, got {len(file_list)}")
        for f in file_list:
            action = os.path.splitext(os.path.basename(f))[0]
            if subject == "S11" and action == "Directions":
                continue
            hf = cdflib.CDF(f)
            positions = hf["Pose"].reshape(-1, 32, 3) / 1000.0
            output[subject][_canonical(action)] = positions.astype("float32")
    return output


def generate_gt_2d(dataset_path: str, output_path_2d: str):
    """Project mocap through every camera to produce GT 2D keypoints in pixel
    space (parity: prepare_data_h36m.py:148-173)."""
    from videopose3d_tpu.datasets.h36m import Human36mDataset
    from videopose3d_tpu.ops.camera import (
        world_to_camera, project_to_2d, image_coordinates)

    print("Computing ground-truth 2D poses...")
    dataset = Human36mDataset(dataset_path)
    output_2d_poses = {}
    for subject in dataset.subjects():
        output_2d_poses[subject] = {}
        for action in dataset[subject].keys():
            anim = dataset[subject][action]
            positions_2d = []
            for cam in anim["cameras"]:
                pos_3d = world_to_camera(
                    anim["positions"], R=cam["orientation"], t=cam["translation"])
                # numpy inputs keep the projection on host (camera.py
                # backend dispatch) — archive prep must not run eager ops
                # through a (possibly tunneled) accelerator backend.
                pos_2d = project_to_2d(
                    np.asarray(pos_3d)[None], cam["intrinsic"][None])[0]
                pos_2d_pixel = np.asarray(image_coordinates(
                    pos_2d, w=cam["res_w"], h=cam["res_h"]))
                positions_2d.append(pos_2d_pixel.astype("float32"))
            output_2d_poses[subject][action] = positions_2d

    metadata = {
        "layout_name": "h36m",
        "num_joints": dataset.skeleton().num_joints(),
        "keypoints_symmetry": [dataset.skeleton().joints_left(),
                               dataset.skeleton().joints_right()],
    }
    np.savez_compressed(output_path_2d, positions_2d=output_2d_poses,
                        metadata=metadata)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Human3.6M dataset downloader/converter")
    parser.add_argument("--from-archive", default="", type=str, metavar="PATH",
                        help="convert preprocessed dataset (Martinez et al. zip)")
    parser.add_argument("--from-source", default="", type=str, metavar="PATH",
                        help="convert original dataset (.cdf.mat, needs MATLAB)")
    parser.add_argument("--from-source-cdf", default="", type=str, metavar="PATH",
                        help="convert original dataset (.cdf, needs cdflib)")
    parser.add_argument("--data-dir", default="data", type=str, metavar="PATH",
                        help="output directory for the archives")
    args = parser.parse_args(argv)

    if sum(bool(x) for x in
           (args.from_archive, args.from_source, args.from_source_cdf)) != 1:
        parser.error("specify exactly one dataset source")

    os.makedirs(args.data_dir, exist_ok=True)
    out_3d = os.path.join(args.data_dir, "data_3d_h36m.npz")
    out_2d = os.path.join(args.data_dir, "data_2d_h36m_gt.npz")
    if os.path.exists(out_3d):
        print("The dataset already exists at", out_3d)
        raise SystemExit(0)

    if args.from_archive:
        output = convert_from_archive(args.from_archive, args.data_dir)
    elif args.from_source:
        output = convert_from_source_mat(args.from_source)
    else:
        output = convert_from_source_cdf(args.from_source_cdf)

    print("Saving...")
    np.savez_compressed(out_3d, positions_3d=output)
    generate_gt_2d(out_3d, out_2d)
    print("Done.")


if __name__ == "__main__":
    main()
