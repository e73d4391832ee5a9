#!/usr/bin/env python
"""Interleaved A/B: (rows, 17, 2)- vs (rows, 34)-stored flat 2D stream.

The round-5 step profile showed the assembly gather's output
bf16[1024,243,17,2] carries a minor-dim-2 tiling (T(2,128) — 2 of 8
sublanes used) and XLA inserts a full layout copy (copy.228, ~0.33 ms)
between the gather and the first conv, on top of the gather fusion itself
(~0.56 ms at ~100 GB/s).  Storing the flat array pre-flattened as
(rows, J*F) gives the gather a 34-wide minor dim and hands the model the
(B, T, 34) shape it reshapes to anyway (models/temporal.py::_prep_input) —
the values are identical, so the loss trajectory must be bitwise equal.

This tool measures whether the layout actually removes the copy/speeds the
gather, interleaved in one process, bitwise-checking first.

Usage: python tools/exp_gather_flat.py [--batch 1024] [--reps 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

import _bench_common as bc


def flattened_view(dev):
    """Clone of the device handle with the padded 2D stream reshaped to
    (rows, J*F) — a one-time device-side reshape, not a re-upload."""
    from videopose3d_tpu.data.generators import DeviceArrays
    rows = dev.flat_2d_padded.shape[0]
    flat = dev.flat_2d_padded.reshape(rows, -1)
    return DeviceArrays(
        flat_2d=dev.flat_2d, flat_3d=dev.flat_3d, cameras=dev.cameras,
        seq_bounds=dev.seq_bounds, flat_2d_padded=flat,
        flat_3d_padded=dev.flat_3d_padded, base_2d=dev.base_2d,
        base_3d=dev.base_3d, aug_offset_2d=dev.aug_offset_2d,
        aug_offset_3d=dev.aug_offset_3d, margins=dev.margins)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    cfg = bc.flagship_cfg(compute_dtype=args.dtype)
    fx = bc.train_fixture(cfg, args.batch)
    base = fx.ds.to_device()
    devs = {"joints_2d": base, "flat34": flattened_view(base)}
    jax.block_until_ready(tuple(d.flat_2d_padded for d in devs.values()))

    # ONE graph builder; the (rows, 34) variant retraces on the shape change
    # and feeds forward_strided a pre-flattened (B, T, 34) input.
    run = bc.step_graph(cfg, fx)

    vals = {}
    for name, dev in devs.items():
        vals[name] = bc.run_graph(run, fx, dev, 4)
        print(f"compiled {name}; loss after 4 steps {vals[name]:.9f}",
              flush=True)
    print(f"bitwise loss equality: {vals['joints_2d'] == vals['flat34']}",
          flush=True)

    for name, dev in devs.items():
        bc.warm(run, fx, dev, args.iters)

    results = {name: [] for name in devs}
    for rep in range(args.reps):
        for name, dev in devs.items():
            ms = bc.timed_ms_per_step(run, fx, dev, args.iters)
            results[name].append(ms)
            print(f"rep {rep} {name:10s} {ms:.3f} ms/step", flush=True)

    print()
    means = {}
    for name, ms in results.items():
        means[name] = float(np.mean(ms))
        print(f"{name:10s} mean {np.mean(ms):.3f} min {np.min(ms):.3f} "
              f"ms/step", flush=True)
    print(f"flat34/joints_2d ratio "
          f"{means['flat34'] / means['joints_2d']:.3f}", flush=True)


if __name__ == "__main__":
    main()
