#!/usr/bin/env python
"""Per-epoch evaluation cost at H36M scale (real TPU).

The training sweep runs one whole-video eval epoch per training epoch
(test set ~540k frames over ~240 videos, train-eval ~1.56M frames over ~600
videos — ``/root/reference/run.py:424-549``).  This measures that cost for a
synthetic set with the same shape: wall time, device op time (from a
jax.profiler trace), distinct bucket compilations, dispatch count, and the
device->host prediction traffic.

Through the tunneled dev TPU, wall time is dominated by the ~30 ms/dispatch
relay and the ~10 MB/s device->host fetch; the DEVICE time is the number that
scales to a directly-attached chip, so both are printed.

Usage: python tools/bench_eval.py [--videos 240] [--frames 540000]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=240)
    ap.add_argument("--frames", type=int, default=540_000,
                    help="total eval frames across all videos")
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--arc", default="3,3,3,3,3")
    ap.add_argument("--augment", action="store_true",
                    help="test-time flip augmentation (the final action-wise "
                         "eval uses it; the per-epoch eval does not)")
    ap.add_argument("--profile", action="store_true",
                    help="also capture a device-time trace (one extra epoch)")
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import UnchunkedBatcher
    from videopose3d_tpu.evaluate import Evaluator
    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, receptive_field)
    from videopose3d_tpu.ops.losses import mpjpe_np

    fw = tuple(int(x) for x in args.arc.split(","))
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=fw, causal=False, dropout=0.25, channels=args.channels)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2

    rng = np.random.default_rng(0)
    # Video lengths spread around the mean like H36M clips (0.5x - 1.7x).
    mean_len = args.frames / args.videos
    lengths = np.clip((mean_len * rng.uniform(0.5, 1.7, args.videos)),
                      rf, None).astype(int)
    lengths = (lengths * (args.frames / lengths.sum())).astype(int)
    poses_2d = [rng.standard_normal((l, 17, 2)).astype(np.float32)
                for l in lengths]
    poses_3d = [rng.standard_normal((l, 17, 3)).astype(np.float32)
                for l in lengths]
    perm = np.arange(17)

    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    batcher = UnchunkedBatcher(
        None, poses_3d, poses_2d, pad=pad, augment=args.augment,
        kps_flip_perm=perm, joints_flip_perm=perm, bucket=args.bucket)
    evaluator = Evaluator(cfg, joints_flip_perm=perm)

    n_frames = int(sum(lengths))
    buckets = sorted({(-(-l // args.bucket)) * args.bucket for l in lengths})
    print(f"eval set: {args.videos} videos, {n_frames} frames, "
          f"{len(buckets)} bucket shapes (x{args.bucket})", flush=True)

    def epoch(tag):
        t0 = time.perf_counter()
        loss, n_tot, fetched = 0.0, 0, 0
        for _, b3, b2, n in batcher.next_epoch():
            pred = evaluator.predict(params, state, b2,
                                     augment=args.augment)[:, :n]
            fetched += pred.nbytes
            target = np.asarray(b3[:1], np.float32).copy()
            target[:, :, 0] = 0.0
            loss += n * mpjpe_np(pred, target)
            n_tot += n
        wall = time.perf_counter() - t0
        print(f"{tag}: wall {wall:.2f} s  ({n_tot} frames, "
              f"{n_tot / wall / 1e3:.0f}k frames/s incl. host; fetched "
              f"{fetched / 1e6:.0f} MB, {args.videos} dispatches)", flush=True)
        return wall

    def epoch_async(tag, window=64):
        """Two-phase dispatch (the runner's --eval-devices path): a bounded
        window of videos in flight before the first fetch, so the ~30 ms
        relay dispatch latency overlaps the host metric work + fetches."""
        t0 = time.perf_counter()
        loss, n_tot, fetched = 0.0, 0, 0
        pending = []

        def consume(item):
            nonlocal loss, n_tot, fetched
            b3, n, handle = item
            pred = np.asarray(handle)[:, :n]
            fetched += pred.nbytes
            target = np.asarray(b3[:1], np.float32).copy()
            target[:, :, 0] = 0.0
            loss += n * mpjpe_np(pred, target)
            n_tot += n

        for _, b3, b2, n in batcher.next_epoch():
            pending.append((b3, n, evaluator.predict_async(
                params, state, b2, augment=args.augment)))
            if len(pending) >= window:
                consume(pending.pop(0))
        while pending:
            consume(pending.pop(0))
        wall = time.perf_counter() - t0
        print(f"{tag}: wall {wall:.2f} s  ({n_tot} frames, "
              f"{n_tot / wall / 1e3:.0f}k frames/s incl. host; fetched "
              f"{fetched / 1e6:.0f} MB, {args.videos} dispatches)", flush=True)
        return wall

    epoch("epoch 1 (compiles)")
    wall = epoch("epoch 2 (warm, serial fetch)")
    epoch_async("epoch 2b (warm, two-phase async dispatch)")

    # Device-resident per-epoch eval (the runner's actual path since round
    # 4): batches uploaded once, masked losses on device, one (3,) carry
    # fetch — no 110 MB/epoch prediction traffic.
    from videopose3d_tpu.evaluate import DeviceEvalSet
    if args.augment:
        # DeviceEvalSet computes the per-epoch losses, which the reference
        # runs WITHOUT test-time augmentation (run.py:437-549) — feed it a
        # no-TTA batcher so the device epochs measure the same computation
        # as the TTA epochs above would without the flag (and skip
        # uploading flipped rows DeviceEvalSet would drop anyway).
        print("note: device-losses epochs run augment=False "
              "(per-epoch losses are no-TTA, matching the reference)")
        batcher = UnchunkedBatcher(
            None, poses_3d, poses_2d, pad=pad, augment=False,
            kps_flip_perm=perm, joints_flip_perm=perm, bucket=args.bucket)
    t0 = time.perf_counter()
    ds = DeviceEvalSet(batcher, pad=pad)
    print(f"DeviceEvalSet upload: {time.perf_counter() - t0:.2f} s "
          "(once per run)", flush=True)
    for tag in ("epoch 3 (device losses, compiles)",
                "epoch 4 (device losses, warm)"):
        t0 = time.perf_counter()
        l3d, _, _, n_tot = ds.losses(evaluator, params, state)
        wall_d = time.perf_counter() - t0
        print(f"{tag}: wall {wall_d:.2f} s  ({n_tot} frames, "
              f"{n_tot / wall_d / 1e3:.0f}k frames/s incl. host, "
              f"loss {l3d:.4f})", flush=True)

    if args.profile:
        logdir = tempfile.mkdtemp(prefix="eval_prof_")
        jax.profiler.start_trace(logdir)
        epoch("epoch 3 (traced)")
        jax.profiler.stop_trace()
        files = sorted(glob.glob(logdir + "/**/*.trace.json.gz",
                                 recursive=True))
        ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
        # Only ops on the TPU device tracks count as device time — the trace
        # also carries every host python/runtime thread.
        device_pids = {e["pid"] for e in ev
                       if e.get("ph") == "M" and e.get("name") == "process_name"
                       and "TPU" in str(e.get("args", {}).get("name", ""))
                       and "pjrt" not in str(e["args"]["name"]).lower()}
        tot = defaultdict(float)
        for e in ev:
            if (e.get("ph") == "X" and "dur" in e
                    and e.get("pid") in device_pids):
                base = e.get("name", "").split(".")[0].rstrip("0123456789_")
                tot[base] += e["dur"]
        device_s = sum(tot.values()) / 1e6
        print(f"device op total {device_s:.2f} s/epoch "
              f"({n_frames / max(device_s, 1e-9) / 1e3:.0f}k frames/s "
              f"device-bound; device tracks: {sorted(device_pids)})")
        for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {us / 1e6:7.3f} s  {name[:90]}")


if __name__ == "__main__":
    main()
