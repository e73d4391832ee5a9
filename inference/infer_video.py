#!/usr/bin/env python
"""In-the-wild 2D keypoint extraction with Detectron1 (Caffe2) — legacy adapter.

Capability parity target: ``/root/reference/inference/infer_video.py``.  Like the
reference, this script must be copied into the Detectron repository's ``tools/``
directory so that ``infer_simple``'s imports resolve (see the reference
INFERENCE.md:49); it extends Detectron's ``infer_simple.py`` with an
ffmpeg-frame-pipe video loop and saves per-video .npz detections in the format
``videopose3d_tpu.data.prepare.custom_2d`` consumes.

Detectron1/Caffe2 is deprecated upstream — prefer ``infer_video_d2.py``.
"""

import subprocess as sp

import numpy as np

try:
    from infer_simple import *  # noqa: F401,F403 — Detectron tools/ namespace
    HAVE_DETECTRON1 = True
except ImportError:
    HAVE_DETECTRON1 = False


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
    logger = logging.getLogger(__name__)  # noqa: F821 — from infer_simple
    merge_cfg_from_file(args.cfg)  # noqa: F821
    cfg.NUM_GPUS = 1  # noqa: F821
    args.weights = cache_url(args.weights, cfg.DOWNLOAD_CACHE)  # noqa: F821
    assert_and_infer_cfg(cache_urls=False)  # noqa: F821
    model = infer_engine.initialize_model_from_cfg(args.weights)  # noqa: F821

    if os.path.isdir(args.im_or_folder):  # noqa: F821
        im_list = glob.iglob(args.im_or_folder + "/*." + args.image_ext)  # noqa: F821
    else:
        im_list = [args.im_or_folder]

    for video_name in im_list:
        out_name = os.path.join(args.output_dir, os.path.basename(video_name))  # noqa: F821
        print("Processing {}".format(video_name))

        boxes, segments, keypoints = [], [], []
        im = None
        for frame_i, im in enumerate(read_video(video_name)):
            logger.info("Frame {}".format(frame_i))
            timers = defaultdict(Timer)  # noqa: F821
            t = time.time()  # noqa: F821
            with c2_utils.NamedCudaScope(0):  # noqa: F821
                cls_boxes, cls_segms, cls_keyps = infer_engine.im_detect_all(  # noqa: F821
                    model, im, None, timers=timers)
            logger.info("Inference time: {:.3f}s".format(time.time() - t))  # noqa: F821
            boxes.append(cls_boxes)
            segments.append(cls_segms)
            keypoints.append(cls_keyps)

        metadata = {"w": im.shape[1], "h": im.shape[0]}
        np.savez_compressed(out_name, boxes=boxes, segments=segments,
                            keypoints=keypoints, metadata=metadata)


if __name__ == "__main__":
    if not HAVE_DETECTRON1:
        raise SystemExit(
            "ERROR: this script must be placed in Detectron's tools/ directory "
            "(Caffe2 Detectron1). Prefer infer_video_d2.py with Detectron2.")
    workspace.GlobalInit(["caffe2", "--caffe2_log_level=0"])  # noqa: F821
    setup_logging(__name__)  # noqa: F821
    main(parse_args())  # noqa: F821
