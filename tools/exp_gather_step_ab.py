#!/usr/bin/env python
"""Interleaved full-train-step A/B: XLA batch-assembly gather vs the Pallas
DMA-ring gather (ops/pallas/gather_rows.py) on the lane-padded stream.

Variants (bitwise-identical loss trajectories by construction):
  xla      — (rows, 34) flattened 2D stream, vmap(dynamic_slice) both streams
  pallas   — (rows, 128) lane-padded 2D stream, DMA-ring gather, in-kernel
             slice back to 34 columns; 3D targets still XLA
  pallas3d — pallas 2D + the 3D target stream flattened/lane-padded
             (51 -> 128) and DMA-gathered too (window = chunk_length = 1)

The micro A/B (tools/exp_pallas_gather.py --lane-pad) reads 1.60 vs 0.28 ms
per gather; this tool decides whether the win survives inside the real step
(pallas_call boundaries can force operand/output relayouts that eat kernel
wins — see the train_block and ring-push negative results).

Usage: python tools/exp_gather_step_ab.py [--batch 1024] [--reps 5]
         [--dtype bfloat16] [--stage step]
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import _bench_common as bc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "mixed"])
    ap.add_argument("--stage", default="step",
                    choices=["fwd", "fwdbwd", "step"])
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--n-seqs", type=int, default=4,
                    help="600 with --seq-len 2600 reproduces the H36M-scale "
                         "fixture of tools/bench_step.py")
    ap.add_argument("--seq-len", type=int, default=3000)
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import (
        assemble_chunked_batch_contiguous)

    cfg = bc.flagship_cfg(compute_dtype=args.dtype)
    fx = bc.train_fixture(cfg, args.batch, n_seqs=args.n_seqs,
                          seq_len=args.seq_len)
    base_assemble = fx.assemble
    devs = {
        "xla": (fx.ds.to_device(flatten_2d=True), "xla", "xla"),
        "pallas": (fx.ds.to_device(flatten_2d=True, lane_pad_2d=True),
                   "pallas", "xla"),
        "pallas3d": (fx.ds.to_device(flatten_2d=True, lane_pad_2d=True,
                                     flatten_3d=True, lane_pad_3d=True),
                     "pallas", "pallas"),
    }
    jax.block_until_ready(tuple(d.flat_2d_padded for d, _, _ in devs.values()))

    # step_graph reads fx.assemble at TRACE time (warm() traces the n=1 and
    # n=iters graphs after this loop) — give each variant its own fixture
    # view so late tracing can't pick up the other variant's assembler.
    import copy as _copy
    runs, vals, fxs = {}, {}, {}
    for name, (dev, impl, impl3) in devs.items():
        fxv = _copy.copy(fx)
        fxv.assemble = functools.partial(
            base_assemble, gather_impl=impl, cols_2d=int(dev.cols_2d or 0),
            gather_impl_3d=impl3, cols_3d=int(dev.cols_3d or 0))
        fxs[name] = fxv
        runs[name] = bc.step_graph(cfg, fxv, stage=args.stage)
        vals[name] = bc.run_graph(runs[name], fxv, dev, 4)
        print(f"compiled {name}; loss after 4 steps {vals[name]:.9f}",
              flush=True)
    print(f"bitwise loss equality: "
          f"{len(set(vals.values())) == 1}", flush=True)

    for name, (dev, *_rest) in devs.items():
        bc.warm(runs[name], fxs[name], dev, args.iters)

    results = {name: [] for name in devs}
    for rep in range(args.reps):
        for name, (dev, *_rest) in devs.items():
            ms = bc.timed_ms_per_step(runs[name], fxs[name], dev, args.iters)
            results[name].append(ms)
            print(f"rep {rep} {name:7s} {ms:.3f} ms/step", flush=True)

    print()
    means = {}
    for name, ms in results.items():
        means[name] = float(np.mean(ms))
        print(f"{name:7s} mean {means[name]:.3f} min {np.min(ms):.3f} "
              f"ms/step", flush=True)
    print(f"pallas/xla ratio {means['pallas'] / means['xla']:.3f}  "
          f"pallas3d/xla ratio {means['pallas3d'] / means['xla']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
