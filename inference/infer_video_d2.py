#!/usr/bin/env python
"""In-the-wild 2D keypoint extraction with Detectron2 keypoint R-CNN.

Capability parity target: ``/root/reference/inference/infer_video_d2.py`` — runs
a Detectron2 ``DefaultPredictor`` over every frame of one video (or every
``--image-ext`` video in a folder) and writes per-video ``.npz`` files of
boxes/segments/keypoints (Detectron1-compatible packing) plus the video
resolution.  The output feeds ``videopose3d_tpu.data.prepare.custom_2d``.

Requires detectron2 + ffmpeg/ffprobe (external tools; this script is an adapter
— the TPU framework itself has no torch/detectron dependency).

Usage::

    python inference/infer_video_d2.py \
        --cfg COCO-Keypoints/keypoint_rcnn_R_101_FPN_3x.yaml \
        --output-dir /path/to/out --image-ext mp4 /path/to/videos
"""

import argparse
import glob
import os
import subprocess
import sys
import time

import numpy as np

try:
    from detectron2.config import get_cfg
    from detectron2 import model_zoo
    from detectron2.engine import DefaultPredictor
    from detectron2.utils.logger import setup_logger
    HAVE_DETECTRON2 = True
except ImportError:
    HAVE_DETECTRON2 = False

SCORE_THRESHOLD = 0.7


def parse_args():
    p = argparse.ArgumentParser(description="End-to-end 2D keypoint inference")
    p.add_argument("--cfg", default=None, type=str,
                   help="detectron2 model-zoo config yaml")
    p.add_argument("--output-dir", default="/tmp/infer_simple", type=str,
                   help="output directory for the .npz files")
    p.add_argument("--image-ext", default="mp4", type=str,
                   help="video file extension")
    p.add_argument("im_or_folder", help="video file or folder of videos")
    if len(sys.argv) == 1:
        p.print_help()
        sys.exit(1)
    return p.parse_args()


def probe_resolution(path):
    out = subprocess.check_output(
        ["ffprobe", "-v", "error", "-select_streams", "v:0", "-show_entries",
         "stream=width,height", "-of", "csv=p=0", path])
    # First line only: some containers emit extra stream/csv rows.
    w, h = out.decode().strip().split("\n")[0].split(",")
    return int(w), int(h)


def decode_frames(path):
    """Yield BGR24 frames through an ffmpeg raw-video pipe."""
    w, h = probe_resolution(path)
    proc = subprocess.Popen(
        ["ffmpeg", "-i", path, "-f", "image2pipe", "-pix_fmt", "bgr24",
         "-vsync", "0", "-vcodec", "rawvideo", "-"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, bufsize=-1)
    frame_bytes = w * h * 3
    try:
        while True:
            buf = proc.stdout.read(frame_bytes)
            if len(buf) < frame_bytes:
                return
            yield np.frombuffer(buf, dtype=np.uint8).reshape((h, w, 3))
    finally:
        proc.stdout.close()
        proc.terminate()
        proc.wait()


def build_predictor(cfg_name):
    cfg = get_cfg()
    cfg.merge_from_file(model_zoo.get_config_file(cfg_name))
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = SCORE_THRESHOLD
    cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(cfg_name)
    return DefaultPredictor(cfg)


def detect_frame(predictor, frame):
    """Run the predictor on one frame and re-pack into the Detectron1 layout
    ([background, person-class tensor]) that prepare.custom_2d consumes."""
    instances = predictor(frame)["instances"].to("cpu")

    if not instances.has("pred_boxes") or len(instances.pred_boxes) == 0:
        return [[], []], [[], []]

    bboxes = instances.pred_boxes.tensor.numpy()
    scores = instances.scores.numpy()[:, None]
    bboxes_with_scores = np.concatenate((bboxes, scores), axis=1)

    kp = instances.pred_keypoints.numpy()          # (N, 17, 3): x, y, prob
    # Columns expected downstream: x, y, logit (unavailable -> 0), prob.
    packed = np.concatenate(
        (kp[:, :, :2], np.zeros_like(kp[:, :, 2:3]), kp[:, :, 2:3]), axis=2)
    packed = packed.transpose(0, 2, 1)             # (N, 4, 17)

    return [[], bboxes_with_scores], [[], packed]


def process_video(predictor, video_path, out_dir):
    print(f"Processing {video_path}")
    boxes, segments, keypoints = [], [], []
    width = height = None

    for i, frame in enumerate(decode_frames(video_path)):
        height, width = frame.shape[:2]
        t0 = time.time()
        cls_boxes, cls_keyps = detect_frame(predictor, frame)
        print(f"Frame {i} processed in {time.time() - t0:.3f}s")
        boxes.append(cls_boxes)
        segments.append(None)
        keypoints.append(cls_keyps)

    if width is None:
        raise RuntimeError(f"decoded zero frames from {video_path}")

    out_path = os.path.join(out_dir, os.path.basename(video_path))
    # Per-frame entries are ragged ([background, (N,5) array] pairs with
    # varying N): numpy >= 1.24 refuses the implicit conversion, so save
    # explicit object arrays (the format prepare.custom_2d reads back).
    np.savez_compressed(out_path,
                        boxes=np.array(boxes, dtype=object),
                        segments=np.array(segments, dtype=object),
                        keypoints=np.array(keypoints, dtype=object),
                        metadata={"w": width, "h": height})


def main():
    args = parse_args()
    predictor = build_predictor(args.cfg)

    if os.path.isdir(args.im_or_folder):
        videos = sorted(glob.glob(
            os.path.join(args.im_or_folder, "*." + args.image_ext)))
    else:
        videos = [args.im_or_folder]

    os.makedirs(args.output_dir, exist_ok=True)
    for video in videos:
        process_video(predictor, video, args.output_dir)


if __name__ == "__main__":
    if not HAVE_DETECTRON2:
        print("ERROR: detectron2 is required for in-the-wild 2D inference.\n"
              "Install it (https://github.com/facebookresearch/detectron2) and "
              "re-run; the rest of the TPU framework does not depend on it.")
        sys.exit(1)
    setup_logger()
    main()
