#!/usr/bin/env python
"""Interleaved A/B of the chunk-interleave factor (halves) in the offline
int8 serving kernels, at the official bench shape.

Compares (t_tile, halves) configurations with alternating timed legs in one
process (sequential benches swing +/-10% across processes — see
exp_stream_ab.py / the realignment postmortem).

Usage: python tools/exp_halves.py [--configs 512:1,512:2,1024:2] [--reps 4]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t-out", type=int, default=32768)
    ap.add_argument("--configs", default="512:1,512:2,1024:2")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, receptive_field)
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        quantize_temporal_model, forward_dilated_int8)

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype="bfloat16")
    rf = receptive_field(cfg)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)),
                        jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)

    t_in = args.t_out + rf - 1
    frames_per_call = args.batch * args.t_out
    x = jnp.asarray(rng.standard_normal((args.batch, t_in, 17, 2)),
                    jnp.float32)

    configs = []
    for spec in args.configs.split(","):
        t_tile, halves = (int(v) for v in spec.split(":"))
        configs.append((t_tile, halves))

    def make_runner(t_tile, halves):
        @functools.partial(jax.jit, static_argnums=1)
        def infer_n(xx, n):
            def body(i, carry):
                x_dep, acc = carry
                pred = forward_dilated_int8(cfg, q, x_dep, t_tile=t_tile,
                                            halves=halves)
                acc = jnp.sum(pred[0, 0, 0]) * jnp.float32(1e-30)
                return x_dep + acc, acc
            return jax.lax.fori_loop(0, n, body, (xx, jnp.float32(0.0)))[1]

        def timed(n):
            t0 = time.perf_counter()
            float(infer_n(x, n))
            return time.perf_counter() - t0

        return timed

    runners = {}
    for t_tile, halves in configs:
        timed = make_runner(t_tile, halves)
        timed(1); timed(args.iters)   # compile both shapes
        runners[(t_tile, halves)] = timed
        print(f"compiled t_tile={t_tile} halves={halves}", flush=True)

    for rep in range(args.reps):
        for key, timed in runners.items():
            t1 = timed(1)
            tn = timed(args.iters)
            per_call = (tn - t1) / (args.iters - 1)
            mfps = frames_per_call / per_call / 1e6
            print(f"rep {rep} t_tile={key[0]:5d} halves={key[1]}  "
                  f"{per_call*1e3:7.3f} ms/call  {mfps:6.2f}M frames/s",
                  flush=True)


if __name__ == "__main__":
    main()
