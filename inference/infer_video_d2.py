#!/usr/bin/env python
"""In-the-wild 2D keypoint extraction with Detectron2 keypoint R-CNN.

Capability parity target: ``/root/reference/inference/infer_video_d2.py`` — runs a
Detectron2 ``DefaultPredictor`` over every frame of one video (or every
``--image-ext`` video in a folder), re-packs outputs into the Detectron1-style
``[[], tensor]`` format, and writes per-video ``.npz`` files with
boxes/segments/keypoints + the video resolution.  The output feeds
``videopose3d_tpu.data.prepare.custom_2d``.

Requires detectron2 + ffmpeg/ffprobe (external tools; this script is an adapter,
the TPU framework itself has no torch/detectron dependency).

Usage::

    python inference/infer_video_d2.py \
        --cfg COCO-Keypoints/keypoint_rcnn_R_101_FPN_3x.yaml \
        --output-dir /path/to/out --image-ext mp4 /path/to/videos
"""

import argparse
import glob
import os
import subprocess as sp
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


def parse_args():
    parser = argparse.ArgumentParser(description="End-to-end inference")
    parser.add_argument("--cfg", dest="cfg", default=None, type=str,
                        help="cfg model file (/path/to/model_config.yaml)")
    parser.add_argument("--output-dir", dest="output_dir",
                        default="/tmp/infer_simple", type=str,
                        help="output directory for the .npz files")
    parser.add_argument("--image-ext", dest="image_ext", default="mp4",
                        type=str, help="video file extension (default: mp4)")
    parser.add_argument("im_or_folder", help="video file or folder of videos")
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def get_resolution(filename):
    command = ["ffprobe", "-v", "error", "-select_streams", "v:0",
               "-show_entries", "stream=width,height", "-of", "csv=p=0", filename]
    pipe = sp.Popen(command, stdout=sp.PIPE, bufsize=-1)
    for line in pipe.stdout:
        w, h = line.decode().strip().split(",")
        return int(w), int(h)


def read_video(filename):
    w, h = get_resolution(filename)
    command = ["ffmpeg", "-i", filename, "-f", "image2pipe", "-pix_fmt", "bgr24",
               "-vsync", "0", "-vcodec", "rawvideo", "-"]
    pipe = sp.Popen(command, stdout=sp.PIPE, bufsize=-1)
    while True:
        data = pipe.stdout.read(w * h * 3)
        if not data:
            break
        yield np.frombuffer(data, dtype="uint8").reshape((h, w, 3))


def main(args):
    cfg = get_cfg()
    cfg.merge_from_file(model_zoo.get_config_file(args.cfg))
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.7
    cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(args.cfg)
    predictor = DefaultPredictor(cfg)

    if os.path.isdir(args.im_or_folder):
        im_list = glob.iglob(args.im_or_folder + "/*." + args.image_ext)
    else:
        im_list = [args.im_or_folder]

    os.makedirs(args.output_dir, exist_ok=True)
    for video_name in im_list:
        out_name = os.path.join(args.output_dir, os.path.basename(video_name))
        print("Processing {}".format(video_name))

        boxes = []
        segments = []
        keypoints = []
        im = None

        for frame_i, im in enumerate(read_video(video_name)):
            t = time.time()
            outputs = predictor(im)["instances"].to("cpu")
            print("Frame {} processed in {:.3f}s".format(frame_i, time.time() - t))

            has_bbox = False
            bbox_tensor = []
            if outputs.has("pred_boxes"):
                bbox_tensor = outputs.pred_boxes.tensor.numpy()
                if len(bbox_tensor) > 0:
                    has_bbox = True
                    scores = outputs.scores.numpy()[:, None]
                    bbox_tensor = np.concatenate((bbox_tensor, scores), axis=1)
            if has_bbox:
                kps = outputs.pred_keypoints.numpy()
                kps_xy = kps[:, :, :2]
                kps_prob = kps[:, :, 2:3]
                kps_logit = np.zeros_like(kps_prob)  # not provided by d2
                kps = np.concatenate((kps_xy, kps_logit, kps_prob), axis=2)
                kps = kps.transpose(0, 2, 1)
            else:
                kps = []
                bbox_tensor = []

            # Detectron1-compatible packing: [background, person-class tensor].
            boxes.append([[], bbox_tensor])
            segments.append(None)
            keypoints.append([[], kps])

        metadata = {"w": im.shape[1], "h": im.shape[0]}
        np.savez_compressed(out_name, boxes=boxes, segments=segments,
                            keypoints=keypoints, metadata=metadata)


if __name__ == "__main__":
    if not HAVE_DETECTRON2:
        print("ERROR: detectron2 is required for in-the-wild 2D inference.\n"
              "Install it (https://github.com/facebookresearch/detectron2) and "
              "re-run; the rest of the TPU framework does not depend on it.")
        sys.exit(1)
    setup_logger()
    main(parse_args())
