#!/usr/bin/env python
"""A/B the per-frame bf16 streaming ring-push lowering (real TPU).

The round-4 profile showed XLA's bitcast+dynamic-update-slice fusion costs
~23 us per block ring at B=C=1024 (~34% of the whole step across the four
rings) — ~10x the 2 MB row's HBM write cost.  "dma" replaces each push with
an in-place single-row Pallas copy (bit-identical; CPU-verified).

Interleaved reps, slope between two in-graph iteration counts.

Usage: python tools/exp_ring_push.py [--reps 5]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=1024)
    ap.add_argument("--iters-lo", type=int, default=32)
    ap.add_argument("--iters-hi", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model)
    from videopose3d_tpu import streaming

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=True, dropout=0.0,
        channels=1024, compute_dtype="bfloat16")
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b = args.streams
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)

    runners = {}
    for impl in ("dus", "dma"):

        @functools.partial(jax.jit, static_argnums=1)
        def run_n(ss, n, _impl=impl):
            def body(i, carry):
                ss, acc = carry
                out, ss = streaming.stream_step(cfg, params, state, ss,
                                                first + acc, _ring_impl=_impl)
                return ss, jnp.sum(out[0, 0]) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, n, body, (ss, jnp.float32(0.0)))

        def timed(n, _run=run_n):
            ss = streaming.init_stream_state(cfg, params, state, first)
            t0 = time.perf_counter()
            _, acc = _run(ss, n)
            float(acc)
            return time.perf_counter() - t0

        runners[impl] = timed
        timed(args.iters_lo)
        timed(args.iters_hi)
        print(f"compiled {impl}", flush=True)

    results = {impl: [] for impl in runners}
    for rep in range(args.reps):
        for impl, timed in runners.items():
            lo = timed(args.iters_lo)
            hi = timed(args.iters_hi)
            ms = (hi - lo) / (args.iters_hi - args.iters_lo) * 1e3
            results[impl].append(ms)
            print(f"rep {rep} {impl:4s} {ms:.4f} ms/frame", flush=True)
    print()
    for impl, ms in results.items():
        print(f"{impl:4s} mean {np.mean(ms):.4f} min {np.min(ms):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
