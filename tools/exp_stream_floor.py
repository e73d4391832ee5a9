#!/usr/bin/env python
"""Decompose the k-frame fused int8 streaming kernel's time (real TPU).

Interleaved A/B/C of the shipped kernel against two timing-only variants
(WRONG numerics, same dataflow/DMAs — ``experiment=`` in
``fused_blocks_step_multi``):

  * control          — the shipped engine (dynamic per-row requant);
  * static_requant   — per-row max reduce removed (relu+scale+round kept);
  * dots_only        — all VPU epilogues stripped to casts: dots + DMAs only.

control − dots_only bounds what epilogue work could ever buy; dots_only
itself is the kernel's MXU+DMA floor at this shape.  Methodology as in
exp_stream_ab.py: interleave every rep, slope between two in-graph
iteration counts.

Usage: python tools/exp_stream_floor.py [--reps 5] [--k 8]
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
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters-lo", type=int, default=32)
    ap.add_argument("--iters-hi", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, receptive_field)
    from videopose3d_tpu import streaming
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        quantize_temporal_model)

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=True, dropout=0.0,
        channels=1024, compute_dtype="bfloat16")
    rf = receptive_field(cfg)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, k = args.streams, args.k
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
    first_k = jnp.asarray(rng.standard_normal((b, k, 17, 2)), jnp.float32)
    calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)),
                        jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)

    variants = {"control": None,
                "static_requant": "static_requant",
                "dots_only": "dots_only"}
    runners = {}
    for name, exp in variants.items():

        @functools.partial(jax.jit, static_argnums=1)
        def run_n(ss, n, _exp=exp):
            def body(i, carry):
                ss, acc = carry
                out, ss = streaming.stream_step_int8_multi_fused(
                    cfg, q, ss, first_k + acc, _experiment=_exp)
                return ss, jnp.sum(out[0, 0]) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, n, body, (ss, jnp.float32(0.0)))

        def timed(n, _run=run_n):
            ss = streaming.init_stream_state_int8_multi(cfg, q, first, k)
            t0 = time.perf_counter()
            _, acc = _run(ss, n)
            float(acc)
            return time.perf_counter() - t0

        runners[name] = timed
        timed(args.iters_lo)
        timed(args.iters_hi)
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in variants}
    for rep in range(args.reps):
        for name, timed in runners.items():
            lo = timed(args.iters_lo)
            hi = timed(args.iters_hi)
            ms = ((hi - lo) / (args.iters_hi - args.iters_lo) / k * 1e3)
            results[name].append(ms)
            print(f"rep {rep} {name:16s} {ms:.4f} ms/frame", flush=True)
    print()
    for name, ms in results.items():
        print(f"{name:16s} mean {np.mean(ms):.4f} ms/frame "
              f"min {np.min(ms):.4f}", flush=True)


if __name__ == "__main__":
    main()
