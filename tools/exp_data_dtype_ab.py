#!/usr/bin/env python
"""Interleaved A/B: f32-stored vs bf16-stored 2D training stream (real TPU).

At ``compute_dtype="bfloat16"`` the model's first matmul casts its operand to
bf16 anyway, so storing the padded flat 2D array in bf16
(``FlatSequenceDataset.to_device(dtype_2d=jnp.bfloat16)``) is bit-identical
— and halves both the assembly-gather HBM traffic (the window slices read
~34 MB/step at B=1024/RF=243) and the dataset's device footprint.  This
tool measures the actual step-time win, interleaved in one process, and
checks bitwise equality of the two steps' losses first.

Measured 2026-08-19: bitwise-equal losses; perf NEUTRAL (~12.3 ms/step both
legs) — the 33 KB contiguous window slices are dispatch-bound, not
bytes-bound, so halving their bytes buys nothing.  The knob ships as an
opt-in memory saving only (see PARITY.md).

Usage: python tools/exp_data_dtype_ab.py [--batch 1024] [--reps 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    cfg = bc.flagship_cfg(compute_dtype="bfloat16")
    fx = bc.train_fixture(cfg, args.batch)
    devs = {"f32_data": fx.ds.to_device(),
            "bf16_data": fx.ds.to_device(dtype_2d=jnp.bfloat16)}
    jax.block_until_ready(tuple(d.flat_2d_padded for d in devs.values()))

    # ONE graph builder; the bf16-stored variant retraces automatically on
    # the operand dtype change.
    run = bc.step_graph(cfg, fx)

    # Bitwise check: the two storages produce the SAME loss trajectory.
    vals = {}
    for name, dev in devs.items():
        vals[name] = bc.run_graph(run, fx, dev, 4)
        print(f"compiled {name}; loss after 4 steps {vals[name]:.9f}",
              flush=True)
    bitwise = vals["f32_data"] == vals["bf16_data"]
    print(f"bitwise loss equality: {bitwise}", flush=True)

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
    print(f"bf16_data/f32_data ratio {means['bf16_data'] / means['f32_data']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
