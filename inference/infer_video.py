#!/usr/bin/env python
"""In-the-wild 2D keypoint extraction with Detectron1 (Caffe2) — legacy adapter.

Capability parity target: ``/root/reference/inference/infer_video.py`` (same
per-video ``.npz`` output contract, consumed by
``videopose3d_tpu.data.prepare.custom_2d``).  Redesigned as a standalone
adapter: it imports the ``detectron`` package directly instead of relying on
being copied into Detectron's ``tools/`` directory for ``infer_simple``'s
star-imports, and carries its own minimal CLI.

Detectron1/Caffe2 is deprecated upstream — prefer ``infer_video_d2.py``.

Usage::

    python inference/infer_video.py --cfg e2e_keypoint_rcnn_R-101-FPN.yaml \
        --wts model_final.pkl --output-dir out/ video_or_dir [--ext mp4]
"""

import argparse
import glob
import os
import subprocess
import sys
import time

import numpy as np

try:
    from caffe2.python import workspace
    import detectron.core.test_engine as infer_engine
    import detectron.utils.c2 as c2_utils
    from detectron.core.config import (assert_and_infer_cfg, cfg,
                                       merge_cfg_from_file)
    from detectron.utils.io import cache_url
    from detectron.utils.logging import setup_logging
    HAVE_DETECTRON1 = True
except ImportError:
    HAVE_DETECTRON1 = False


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="2D keypoint detection over whole videos (Detectron1)")
    parser.add_argument("--cfg", required=True, help="model config yaml")
    parser.add_argument("--wts", required=True,
                        help="model weights .pkl (path or URL)")
    parser.add_argument("--output-dir", required=True,
                        help="directory for the per-video .npz outputs")
    parser.add_argument("--ext", default="mp4",
                        help="video extension when the input is a directory")
    parser.add_argument("input", help="a video file or a directory of videos")
    return parser.parse_args(argv)


def iter_bgr_frames(path):
    """Decode a video into BGR24 frames through an ffmpeg raw pipe (Caffe2
    models expect OpenCV-style BGR channel order)."""
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0", "-show_entries",
         "stream=width,height", "-of", "csv=p=0", path],
        check=True, capture_output=True, text=True).stdout
    width, height = (int(v) for v in probe.strip().split("\n")[0].split(","))
    nbytes = width * height * 3
    proc = subprocess.Popen(
        ["ffmpeg", "-nostdin", "-i", path, "-f", "rawvideo", "-pix_fmt",
         "bgr24", "-vsync", "0", "-"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, bufsize=nbytes)
    try:
        while True:
            chunk = proc.stdout.read(nbytes)
            if len(chunk) < nbytes:
                break
            yield np.frombuffer(chunk, np.uint8).reshape(height, width, 3)
    finally:
        proc.stdout.close()
        proc.terminate()
        proc.wait()


def detect_video(model, path):
    """Run the keypoint R-CNN on every frame; returns (boxes, segments,
    keypoints, metadata) lists in the Detectron per-class format that
    ``prepare.custom_2d`` decodes."""
    boxes, segments, keypoints = [], [], []
    resolution = None
    for i, frame in enumerate(iter_bgr_frames(path)):
        started = time.time()
        with c2_utils.NamedCudaScope(0):
            cls_boxes, cls_segms, cls_keyps = infer_engine.im_detect_all(
                model, frame, None)
        print(f"  frame {i}: {time.time() - started:.3f}s", file=sys.stderr)
        boxes.append(cls_boxes)
        segments.append(cls_segms)
        keypoints.append(cls_keyps)
        resolution = {"w": frame.shape[1], "h": frame.shape[0]}
    if resolution is None:
        raise RuntimeError(f"{path}: decoded zero frames")
    return boxes, segments, keypoints, resolution


def main(args):
    merge_cfg_from_file(args.cfg)
    cfg.NUM_GPUS = 1
    weights = cache_url(args.wts, cfg.DOWNLOAD_CACHE)
    assert_and_infer_cfg(cache_urls=False)
    model = infer_engine.initialize_model_from_cfg(weights)

    if os.path.isdir(args.input):
        videos = sorted(glob.glob(os.path.join(args.input, f"*.{args.ext}")))
    else:
        videos = [args.input]

    os.makedirs(args.output_dir, exist_ok=True)
    for video in videos:
        print(f"Processing {video}")
        boxes, segments, keypoints, metadata = detect_video(model, video)
        out = os.path.join(args.output_dir, os.path.basename(video))
        # Ragged per-frame/per-class lists need explicit object arrays on
        # numpy >= 1.24 (implicit conversion raises, losing the whole run).
        np.savez_compressed(out,
                            boxes=np.array(boxes, dtype=object),
                            segments=np.array(segments, dtype=object),
                            keypoints=np.array(keypoints, dtype=object),
                            metadata=metadata)


if __name__ == "__main__":
    if not HAVE_DETECTRON1:
        raise SystemExit(
            "ERROR: the 'detectron' (Caffe2) package is not importable. "
            "Prefer infer_video_d2.py with Detectron2.")
    workspace.GlobalInit(["caffe2", "--caffe2_log_level=0"])
    setup_logging(__name__)
    main(parse_args())
