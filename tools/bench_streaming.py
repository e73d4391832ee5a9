#!/usr/bin/env python
"""Benchmark the streaming causal serving engines (bf16 vs w8a8 int8).

ms/frame for a batch of concurrent streams through the flagship causal model
(RF 243, 1024 channels).  Methodology: N stream steps chained inside ONE jit
graph via ``lax.fori_loop`` (state threaded through the loop carries a true
data dependency), latency-cancelled as (t(N) - t(1)) / (N - 1) — same approach
as bench.py; see CLAUDE.md "Environment gotchas".

Usage: python tools/bench_streaming.py [--streams 1024] [--engine int8|bf16]
"""

import argparse
import functools
import json
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
    ap.add_argument("--engine", choices=("bf16", "bf16_fused", "int8",
                                         "int8_fused", "both", "all"),
                    default="both")
    ap.add_argument("--frames-per-step", type=int, default=1,
                    help="micro-batched engine: lift k frames per dispatch "
                         "(amortizes weight reads; adds k frames latency)")
    ap.add_argument("--iters-lo", type=int, default=32)
    ap.add_argument("--iters-hi", type=int, default=256)
    args = ap.parse_args()
    if args.iters_hi <= args.iters_lo:
        raise SystemExit("--iters-hi must exceed --iters-lo (slope measurement)")

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
    b = args.streams
    k = args.frames_per_step
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
    frame = (first if k == 1 else jnp.asarray(
        rng.standard_normal((b, k, 17, 2)), jnp.float32))

    def bench(step_fn, init_state, tag):
        @functools.partial(jax.jit, static_argnums=2)
        def run_n(ss, frame, n):
            def body(i, carry):
                ss, acc = carry
                out, ss = step_fn(ss, frame + acc)
                return ss, jnp.sum(out[0, 0]) * jnp.float32(1e-30)
            ss, acc = jax.lax.fori_loop(0, n, body, (ss, jnp.float32(0.0)))
            return ss, acc

        def timed(n, reps=5):
            best = float("inf")
            for _ in range(reps):
                ss = init_state()
                t0 = time.perf_counter()
                _, acc = run_n(ss, frame, n)
                float(acc)
                best = min(best, time.perf_counter() - t0)
            return best

        # Compile both shapes first.  The slope between two LARGE iteration
        # counts cancels the ~30 ms relay latency; both endpoints must be big
        # enough that per-endpoint jitter (several ms) stays small vs the
        # compute delta (a lone n=1 endpoint under-measures badly here).
        float(run_n(init_state(), frame, args.iters_lo)[1])
        float(run_n(init_state(), frame, args.iters_hi)[1])
        t_lo = timed(args.iters_lo)
        t_hi = timed(args.iters_hi)
        ms = (t_hi - t_lo) / (args.iters_hi - args.iters_lo) * 1e3 / k
        print(json.dumps({
            "engine": tag, "streams": b, "frames_per_step": k,
            "ms_per_frame": round(ms, 4),
            "stream_frames_per_sec": round(b / (ms * 1e-3), 1)}))

    if args.engine in ("bf16_fused", "int8_fused") and k != 1:
        raise SystemExit(f"{args.engine} is a per-frame engine (k == 1)")
    if args.engine in ("bf16", "both", "all"):
        if k == 1:
            bench(lambda ss, f: streaming.stream_step(cfg, params, state, ss,
                                                      f),
                  lambda: streaming.init_stream_state(cfg, params, state,
                                                      first),
                  "bf16")
        else:
            bench(lambda ss, f: streaming.stream_step_multi(
                      cfg, params, state, ss, f),
                  lambda: streaming.init_stream_state_multi(
                      cfg, params, state, first, k),
                  "bf16")
    if args.engine in ("bf16_fused", "all") and k == 1:
        prepared = streaming.prepare_bf16_fused(cfg, params, state)
        bench(lambda ss, f: streaming.stream_step_bf16_fused(
                  cfg, prepared, ss, f),
              lambda: streaming.init_stream_state(cfg, params, state, first),
              "bf16_fused")
    if args.engine in ("int8", "int8_fused", "both", "all"):
        calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)),
                            jnp.float32)
        q = quantize_temporal_model(cfg, params, state, calib)
        if k == 1 and args.engine in ("int8", "both", "all"):
            bench(lambda ss, f: streaming.stream_step_int8(cfg, q, ss, f),
                  lambda: streaming.init_stream_state_int8(cfg, q, first),
                  "int8")
        if k == 1 and args.engine in ("int8_fused", "all"):
            bench(lambda ss, f: streaming.stream_step_int8_fused(cfg, q, ss,
                                                                 f),
                  lambda: streaming.init_stream_state_int8(cfg, q, first),
                  "int8_fused")
        if k != 1:
            bench(lambda ss, f: streaming.stream_step_int8_multi(cfg, q, ss,
                                                                 f),
                  lambda: streaming.init_stream_state_int8_multi(cfg, q,
                                                                 first, k),
                  "int8")


if __name__ == "__main__":
    main()
