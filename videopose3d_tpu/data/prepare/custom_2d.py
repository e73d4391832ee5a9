"""Custom (in-the-wild) 2D detection converter.

Capability parity target: ``/root/reference/data/prepare_data_2d_custom.py`` —
decodes per-video Detectron .npz outputs (best bbox by score per frame), repairs
missing detections by linear interpolation over time (bbox and all 17 COCO
keypoints), and emits one custom "subject" per video with ``video_metadata``
resolutions for the viz path.

Usage::

    python -m videopose3d_tpu.data.prepare.custom_2d -i /path/to/detections \
        -o myvideos [--data-dir data]
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

from videopose3d_tpu.data.prepare.layouts import suggest_metadata


def decode(filename):
    """Per-frame best-bbox selection + NaN linear interpolation repair."""
    print("Processing {}".format(filename))
    data = np.load(filename, encoding="latin1", allow_pickle=True)
    bb = data["boxes"]
    kp = data["keypoints"]
    metadata = data["metadata"].item()
    results_bb = []
    results_kp = []
    for i in range(len(bb)):
        if len(bb[i][1]) == 0 or len(kp[i][1]) == 0:
            # No detection this frame: fill with NaN, repaired below.
            results_bb.append(np.full(4, np.nan, dtype=np.float32))
            results_kp.append(np.full((17, 4), np.nan, dtype=np.float32))
            continue
        best_match = np.argmax(bb[i][1][:, 4])
        results_bb.append(bb[i][1][best_match, :4])
        results_kp.append(kp[i][1][best_match].T.copy())

    bb = np.array(results_bb, dtype=np.float32)
    kp = np.array(results_kp, dtype=np.float32)[:, :, :2]

    # Linear interpolation over time across missing frames.
    mask = ~np.isnan(bb[:, 0])
    indices = np.arange(len(bb))
    for i in range(4):
        bb[:, i] = np.interp(indices, indices[mask], bb[mask, i])
    for i in range(17):
        for j in range(2):
            kp[:, i, j] = np.interp(indices, indices[mask], kp[mask, i, j])

    print("{} total frames processed".format(len(bb)))
    print("{} frames were interpolated".format(np.sum(~mask)))
    print("----------")
    return [{
        "start_frame": 0,
        "end_frame": len(kp),
        "bounding_boxes": bb,
        "keypoints": kp,
    }], metadata


def main(argv=None):
    parser = argparse.ArgumentParser(description="Custom dataset creator")
    parser.add_argument("-i", "--input", type=str, default="", metavar="PATH",
                        help="detections directory")
    parser.add_argument("-o", "--output", type=str, default="", metavar="PATH",
                        help="output suffix for 2D detections")
    parser.add_argument("--data-dir", default="data", type=str, metavar="PATH")
    args = parser.parse_args(argv)

    if not args.input:
        parser.error("Please specify the input directory")
    if not args.output:
        parser.error("Please specify an output suffix (e.g. detectron_pt_coco)")

    print("Parsing 2D detections from", args.input)
    metadata = suggest_metadata("coco")
    metadata["video_metadata"] = {}

    output = {}
    file_list = glob(args.input + "/*.npz")
    for f in file_list:
        canonical_name = os.path.splitext(os.path.basename(f))[0]
        data, video_metadata = decode(f)
        output[canonical_name] = {
            "custom": [data[0]["keypoints"].astype("float32")]}
        metadata["video_metadata"][canonical_name] = video_metadata

    print("Saving...")
    os.makedirs(args.data_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.data_dir, "data_2d_custom_" + args.output + ".npz"),
        positions_2d=output, metadata=metadata)
    print("Done.")


if __name__ == "__main__":
    main()
