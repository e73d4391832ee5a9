"""Command-line interface.

Flag-surface parity target: ``/root/reference/common/arguments.py:10-89`` — every
reference flag is accepted with the same name, default, and semantics, so
published training commands (reference README) run unchanged.  TPU-specific
additions are grouped at the bottom and default to reference-equivalent behavior.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Training script")

    # General arguments
    parser.add_argument("-d", "--dataset", default="h36m", type=str, metavar="NAME",
                        help="target dataset")
    parser.add_argument("-k", "--keypoints", default="cpn_ft_h36m_dbb", type=str,
                        metavar="NAME", help="2D detections to use")
    parser.add_argument("-str", "--subjects-train", default="S1,S5,S6,S7,S8",
                        type=str, metavar="LIST",
                        help="training subjects separated by comma")
    parser.add_argument("-ste", "--subjects-test", default="S9,S11", type=str,
                        metavar="LIST", help="test subjects separated by comma")
    parser.add_argument("-sun", "--subjects-unlabeled", default="", type=str,
                        metavar="LIST",
                        help="unlabeled subjects separated by comma for self-supervision")
    parser.add_argument("-a", "--actions", default="*", type=str, metavar="LIST",
                        help="actions to train/test on, separated by comma, or * for all")
    parser.add_argument("-c", "--checkpoint", default="checkpoint", type=str,
                        metavar="PATH", help="checkpoint directory")
    parser.add_argument("--checkpoint-frequency", default=10, type=int, metavar="N",
                        help="create a checkpoint every N epochs")
    parser.add_argument("-r", "--resume", default="", type=str, metavar="FILENAME",
                        help="checkpoint to resume (file name)")
    parser.add_argument("--evaluate", default="", type=str, metavar="FILENAME",
                        help="checkpoint to evaluate (file name)")
    parser.add_argument("--render", action="store_true",
                        help="visualize a particular video")
    parser.add_argument("--by-subject", action="store_true",
                        help="break down error by subject (on evaluation)")
    parser.add_argument("--export-training-curves", action="store_true",
                        help="save training curves as .png images")

    # Model arguments
    parser.add_argument("-s", "--stride", default=1, type=int, metavar="N",
                        help="chunk size to use during training")
    parser.add_argument("-e", "--epochs", default=60, type=int, metavar="N",
                        help="number of training epochs")
    parser.add_argument("-b", "--batch-size", default=1024, type=int, metavar="N",
                        help="batch size in terms of predicted frames")
    parser.add_argument("-drop", "--dropout", default=0.25, type=float, metavar="P",
                        help="dropout probability")
    parser.add_argument("-lr", "--learning-rate", default=0.001, type=float,
                        metavar="LR", help="initial learning rate")
    parser.add_argument("-lrd", "--lr-decay", default=0.95, type=float, metavar="LR",
                        help="learning rate decay per epoch")
    parser.add_argument("-no-da", "--no-data-augmentation", dest="data_augmentation",
                        action="store_false", help="disable train-time flipping")
    parser.add_argument("-no-tta", "--no-test-time-augmentation",
                        dest="test_time_augmentation", action="store_false",
                        help="disable test-time flipping")
    parser.add_argument("-arc", "--architecture", default="3,3,3", type=str,
                        metavar="LAYERS", help="filter widths separated by comma")
    parser.add_argument("--causal", action="store_true",
                        help="use causal convolutions for real-time processing")
    parser.add_argument("-ch", "--channels", default=1024, type=int, metavar="N",
                        help="number of channels in convolution layers")

    # Experimental
    parser.add_argument("--subset", default=1, type=float, metavar="FRACTION",
                        help="reduce dataset size by fraction")
    parser.add_argument("--downsample", default=1, type=int, metavar="FACTOR",
                        help="downsample frame rate by factor (semi-supervised)")
    parser.add_argument("--warmup", default=1, type=int, metavar="N",
                        help="warm-up epochs for semi-supervision")
    parser.add_argument("--no-eval", action="store_true",
                        help="disable epoch evaluation while training (small speed-up)")
    parser.add_argument("--dense", action="store_true",
                        help="use dense convolutions instead of dilated convolutions")
    parser.add_argument("--disable-optimizations", action="store_true",
                        help="disable optimized model for single-frame predictions")
    parser.add_argument("--linear-projection", action="store_true",
                        help="use only linear coefficients for semi-supervised projection")
    parser.add_argument("--no-bone-length", action="store_false",
                        dest="bone_length_term",
                        help="disable bone length term in semi-supervised settings")
    parser.add_argument("--no-proj", action="store_true",
                        help="disable projection for semi-supervised setting")

    # Visualization
    parser.add_argument("--viz-subject", type=str, metavar="STR",
                        help="subject to render")
    parser.add_argument("--viz-action", type=str, metavar="STR",
                        help="action to render")
    parser.add_argument("--viz-camera", type=int, default=0, metavar="N",
                        help="camera to render")
    parser.add_argument("--viz-video", type=str, metavar="PATH",
                        help="path to input video")
    parser.add_argument("--viz-skip", type=int, default=0, metavar="N",
                        help="skip first N frames of input video")
    parser.add_argument("--viz-output", type=str, metavar="PATH",
                        help="output file name (.gif or .mp4)")
    parser.add_argument("--viz-export", type=str, metavar="PATH",
                        help="output file name for coordinates")
    parser.add_argument("--viz-bitrate", type=int, default=3000, metavar="N",
                        help="bitrate for mp4 videos")
    parser.add_argument("--viz-no-ground-truth", action="store_true",
                        help="do not show ground-truth poses")
    parser.add_argument("--viz-limit", type=int, default=-1, metavar="N",
                        help="only render first N frames")
    parser.add_argument("--viz-downsample", type=int, default=1, metavar="N",
                        help="downsample FPS by a factor N")
    parser.add_argument("--viz-size", type=int, default=5, metavar="N",
                        help="image size")

    # TPU-specific (no reference equivalent)
    parser.add_argument("--data-dir", default="data", type=str, metavar="PATH",
                        help="directory holding data_3d_*.npz / data_2d_*.npz archives")
    parser.add_argument("--compute-dtype", default="float32", type=str,
                        choices=["float32", "bfloat16", "mixed"],
                        help="MXU compute precision (params/optimizer/BN "
                             "stats/loss stay float32 in every mode); "
                             "'mixed' = bf16 matmul operands with f32 "
                             "activations — f32-grade convergence "
                             "(tests/test_bf16_parity.py) at ~f32 speed on "
                             "TPU (which runs f32 dots with bf16 operands "
                             "anyway); it buys numerics portability, "
                             "'bfloat16' buys the ~1.7x speed")
    parser.add_argument("--eval-bucket", default=128, type=int, metavar="N",
                        help="bucket whole-video eval lengths to multiples of N frames")
    parser.add_argument("--eval-bucket-pow2", action="store_true",
                        help="bucket eval lengths to powers of two (starting at "
                             "--eval-bucket) to bound XLA compilations")
    parser.add_argument("--seed", default=0, type=int, metavar="N",
                        help="model init / dropout PRNG seed")
    parser.add_argument("--no-mesh", action="store_true",
                        help="disable data-parallel sharding over the device mesh")
    parser.add_argument("--rng-impl", default="rbg", type=str,
                        choices=["rbg", "threefry2x32"],
                        help="JAX PRNG implementation for dropout masks. 'rbg' "
                             "uses the TPU hardware generator (~2x faster "
                             "training steps); 'threefry2x32' is the JAX "
                             "default, reproducible across backends")
    parser.add_argument("--serving-engine", default="xla", type=str,
                        choices=["xla", "fused", "int8"],
                        help="pose-model inference engine for evaluation and "
                             "rendering: metric-grade XLA matmuls (default), "
                             "the fused Pallas bf16 kernels, or the w8a8 int8 "
                             "serving kernels (fastest; mm-level accuracy "
                             "delta, calibrated on the first batch)")
    parser.add_argument("--train-engine", default="xla", type=str,
                        choices=["xla", "pallas"],
                        help="strided train-block engine. 'pallas' routes "
                             "each residual block through the fused "
                             "custom-VJP kernels (gradient-parity tested; "
                             "measured slower than 'xla' at B=1024 on v5e "
                             "because pallas_call boundaries force operand "
                             "relayouts — kept as experimental infrastructure)")
    parser.add_argument("--gather-impl", default="auto", type=str,
                        choices=["auto", "xla", "pallas"],
                        help="batch-assembly window-copy engine. 'auto' "
                             "(default) uses the Pallas DMA-ring gather "
                             "(bitwise-equal, measured faster) for "
                             "single-device TPU supervised training and the "
                             "XLA gather everywhere else; 'xla' forces the "
                             "XLA gather (also skips the lane-padded 2D "
                             "stream upload)")
    parser.add_argument("--checkpoint-format", default="pickle", type=str,
                        choices=("pickle", "orbax"), metavar="FMT",
                        help="checkpoint storage backend: single-file pickle "
                             "(default, torch-interop via converter) or an "
                             "orbax/tensorstore directory (multi-host-grade "
                             "atomic writes, partial restore); both formats "
                             "auto-detect on --resume/--evaluate")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize residual blocks in the backward "
                             "pass (saves activation memory for very large "
                             "batches; measured ~1.5x slower steps at b=1024)")
    parser.add_argument("--no-scan-epoch", dest="scan_epoch",
                        action="store_false",
                        help="dispatch train steps one-by-one instead of "
                             "running each epoch as a single fused XLA scan")
    parser.add_argument("--eval-devices", default=0, type=int, metavar="N",
                        help="round-robin evaluation videos over the first N "
                             "local devices (numerically invisible; 0 = auto: "
                             "all local devices on TPU, 1 on CPU)")
    parser.add_argument("--scan-chunk", default=0, type=int, metavar="STEPS",
                        help="split the fused epoch scan into device programs "
                             "of at most this many steps (0 = whole epoch as "
                             "one program).  Bit-identical; bounds compile "
                             "time/memory for very long epochs")
    parser.add_argument("--profile-dir", default=None, type=str, metavar="PATH",
                        help="capture a jax.profiler device trace of the first "
                             "training epoch into this directory")
    parser.add_argument("--metrics-log", default=None, type=str, metavar="PATH",
                        help="append per-epoch structured metrics (JSON lines)")

    parser.set_defaults(bone_length_term=True)
    parser.set_defaults(scan_epoch=True)
    parser.set_defaults(data_augmentation=True)
    parser.set_defaults(test_time_augmentation=True)

    args = parser.parse_args(argv)

    # Invalid-combination checks (parity: arguments.py:80-87).
    if args.resume and args.evaluate:
        print("Invalid flags: --resume and --evaluate cannot be set at the same time")
        raise SystemExit(1)
    if args.export_training_curves and args.no_eval:
        print("Invalid flags: --export-training-curves and --no-eval cannot be set "
              "at the same time")
        raise SystemExit(1)

    return args
