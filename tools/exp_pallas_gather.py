#!/usr/bin/env python
"""Interleaved A/B: XLA vmap(dynamic_slice) vs Pallas DMA-ring window gather.

The round-5 step profile puts the batch-assembly gather at ~1.0-1.33 ms/step
(B=1024 windows x 243 rows x 34 f32 lanes ~ 34 MB/step -> ~30-50 GB/s): the
XLA gather moves one 136-byte row per transaction, so it is latency-bound.
``ops/pallas/gather_rows.gather_windows`` issues whole windows as DMAs with
8 in flight.  This tool bitwise-checks the kernel on hardware and measures
both forms with the latency-cancelled two-endpoint methodology.

Usage: python tools/exp_pallas_gather.py [--batch 1024] [--rows 1560000]
         [--reps 5] [--iters 32] [--dtype float32] [--nbuf 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rows", type=int, default=1_560_000)
    ap.add_argument("--window", type=int, default=243)
    ap.add_argument("--cols", type=int, default=34)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--lane-pad", action="store_true",
                    help="production form: XLA gathers the compact (R, cols) "
                    "stream; Pallas gathers a 128-lane zero-padded copy and "
                    "slices back to cols in-kernel (out_cols)")
    args = ap.parse_args()

    from videopose3d_tpu.ops.pallas.gather_rows import gather_windows

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    host = rng.standard_normal((args.rows, args.cols)).astype(dtype)
    flat = jax.device_put(host)
    if args.lane_pad:
        padded = np.concatenate(
            [host, np.zeros((args.rows, -args.cols % 128), dtype)], axis=1)
        flat_p = jax.device_put(padded)
        out_cols = args.cols
    else:
        flat_p, out_cols = flat, None
    row0 = jax.device_put(rng.integers(
        0, args.rows - args.window - 31, args.batch).astype(np.int32))
    jax.block_until_ready((flat, flat_p, row0))
    W = args.window

    def xla_gather(flat, row0):
        def one(r):
            return jax.lax.dynamic_slice(flat, (r, 0), (W, flat.shape[1]))
        return jax.vmap(one)(row0)

    def pallas_gather(flat, row0):
        return gather_windows(flat, row0, window=W, nbuf=args.nbuf,
                              out_cols=out_cols)

    fns = {"xla": (xla_gather, flat), "pallas": (pallas_gather, flat_p)}

    # Bitwise check on hardware first (one fetch of a modest batch).
    small = row0[:16]
    a = np.asarray(jax.jit(xla_gather)(flat, small))
    b = np.asarray(jax.jit(pallas_gather)(flat_p, small))
    print(f"hardware bitwise equal (16 windows): {bool((a == b).all())}",
          flush=True)

    graphs = {}
    for name, (fn, _) in fns.items():
        @jax.jit
        def run(flat, row0, n, fn=fn):
            def body(i, acc):
                r = row0 + (acc * 0).astype(jnp.int32)  # loop-carried dep
                out = fn(flat, r)
                return acc + out[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        graphs[name] = run

    def run_n(name, n):
        return float(graphs[name](fns[name][1], row0, jnp.int32(n)))

    # n is dynamic (fori_loop bound) -> one graph per form; still warm both
    # call shapes to keep compile out of the timed region.
    for name in fns:
        t0 = time.perf_counter()
        v = run_n(name, 1)
        print(f"compiled {name}: n=1 {time.perf_counter()-t0:.1f}s "
              f"acc={v:.4f}", flush=True)
        run_n(name, args.iters)

    results = {name: [] for name in fns}
    for rep in range(args.reps):
        for name in fns:
            t0 = time.perf_counter()
            run_n(name, 1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n(name, args.iters)
            tn = time.perf_counter() - t0
            ms = (tn - t1) / (args.iters - 1) * 1e3
            results[name].append(ms)
            print(f"rep {rep} {name:7s} {ms:.4f} ms/gather", flush=True)

    print()
    means = {}
    bytes_per = args.batch * W * args.cols * dtype.itemsize
    for name, ms in results.items():
        means[name] = float(np.mean(ms))
        gbps = bytes_per / (means[name] * 1e-3) / 1e9
        print(f"{name:7s} mean {means[name]:.4f} ms  min {np.min(ms):.4f}  "
              f"~{gbps:.0f} GB/s (payload)", flush=True)
    print(f"pallas/xla ratio {means['pallas'] / means['xla']:.3f}", flush=True)


if __name__ == "__main__":
    main()
