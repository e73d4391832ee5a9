#!/usr/bin/env python
"""Interleaved same-process A/B of streaming engines (the realignment-tax
postmortem's lesson: sequential benches confound chip state — alternate the
legs and report every rep).

Usage: python tools/exp_stream_ab.py --engines int8,int8_fused [--reps 4]
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
    ap.add_argument("--engines", default="int8,int8_fused")
    ap.add_argument("--iters-lo", type=int, default=32)
    ap.add_argument("--iters-hi", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--frames-per-step", type=int, default=8,
                    help="k for the *_multi engines")
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
    b = args.streams
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
    calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)),
                        jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)
    prepared_bf16 = streaming.prepare_bf16_fused(cfg, params, state)

    engines = {
        "bf16": (lambda ss, f: streaming.stream_step(cfg, params, state,
                                                     ss, f),
                 lambda: streaming.init_stream_state(cfg, params, state,
                                                     first)),
        "bf16_fused": (lambda ss, f: streaming.stream_step_bf16_fused(
                           cfg, prepared_bf16, ss, f),
                       lambda: streaming.init_stream_state(cfg, params,
                                                           state, first)),
        "int8": (lambda ss, f: streaming.stream_step_int8(cfg, q, ss, f),
                 lambda: streaming.init_stream_state_int8(cfg, q, first)),
        "int8_fused": (lambda ss, f: streaming.stream_step_int8_fused(
                           cfg, q, ss, f),
                       lambda: streaming.init_stream_state_int8(cfg, q,
                                                                first)),
    }
    k = args.frames_per_step
    first_k = jnp.asarray(rng.standard_normal((b, k, 17, 2)), jnp.float32)
    engines["int8_multi"] = (
        lambda ss, f: streaming.stream_step_int8_multi(cfg, q, ss, f),
        lambda: streaming.init_stream_state_int8_multi(cfg, q, first, k))
    engines["int8_multi_fused"] = (
        lambda ss, f: streaming.stream_step_int8_multi_fused(cfg, q, ss, f),
        lambda: streaming.init_stream_state_int8_multi(cfg, q, first, k))
    engines["bf16_multi"] = (
        lambda ss, f: streaming.stream_step_multi(cfg, params, state, ss, f),
        lambda: streaming.init_stream_state_multi(cfg, params, state,
                                                  first, k))
    engines["bf16_multi_fused"] = (
        lambda ss, f: streaming.stream_step_bf16_multi_fused(
            cfg, prepared_bf16, ss, f),
        lambda: streaming.init_stream_state_multi(cfg, params, state,
                                                  first, k))
    names = args.engines.split(",")

    runners = {}
    for name in names:
        step_fn, init_state = engines[name]
        frame0 = first_k if name.startswith("int8_multi") else first
        per_dispatch = k if name.startswith("int8_multi") else 1

        @functools.partial(jax.jit, static_argnums=1)
        def run_n(ss, n, _step=step_fn, _f=frame0):
            def body(i, carry):
                ss, acc = carry
                out, ss = _step(ss, _f + acc)
                return ss, jnp.sum(out[0, 0]) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, n, body, (ss, jnp.float32(0.0)))

        def timed(n, _run=run_n, _init=init_state):
            ss = _init()
            t0 = time.perf_counter()
            _, acc = _run(ss, n)
            float(acc)
            return time.perf_counter() - t0

        runners[name] = (timed, per_dispatch)
        # Compile both shapes.
        timed(args.iters_lo); timed(args.iters_hi)
        print(f"compiled {name}", flush=True)

    # Interleave: per rep, time every engine's lo then every engine's hi.
    for rep in range(args.reps):
        for name in names:
            timed, per_dispatch = runners[name]
            lo = timed(args.iters_lo)
            hi = timed(args.iters_hi)
            ms = ((hi - lo) / (args.iters_hi - args.iters_lo)
                  / per_dispatch * 1e3)
            print(f"rep {rep} {name:16s} {ms:.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
