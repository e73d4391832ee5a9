#!/usr/bin/env python
"""Interleaved sweep of the fused k-frame int8 streaming kernel over
(k, chunks) — finds the best frames-per-dispatch and software-pipeline
chunking for ``fused_blocks_step_multi`` (VERDICT r3 item 5: epilogue
amortization across the k-frame slab).

Each variant re-implements the ``stream_step_int8_multi_fused`` wrapper with
an explicit ``chunks`` knob so product code stays untouched during the sweep;
legs are interleaved per rep (the realignment-tax postmortem's lesson).

Usage: python tools/exp_multi_sweep.py --variants 8:8,8:4,8:2,16:16,16:8
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
    ap.add_argument("--variants", default="8:8,8:4,8:2,16:16")
    ap.add_argument("--baseline", action="store_true",
                    help="include the per-frame int8 XLA engine leg")
    ap.add_argument("--iters-lo", type=int, default=32)
    ap.add_argument("--iters-hi", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, receptive_field)
    from videopose3d_tpu import streaming
    from videopose3d_tpu.ops.pallas.streaming_fused import (
        fused_blocks_step_multi)
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

    def make_step(k, chunks):
        """stream_step_int8_multi_fused with an explicit chunks knob."""

        @functools.partial(jax.jit, donate_argnums=1)
        def step(q, stream_state, frames):
            bufs = list(stream_state["bufs"])
            ptr = stream_state["ptr"]
            caps = [buf.shape[0] // 2 for buf in bufs]
            x = jnp.asarray(frames)
            x = jnp.swapaxes(x, 0, 1).reshape(k, b, -1).astype(jnp.bfloat16)
            bufs[0] = streaming._ring_push_block(bufs[0], ptr[0], caps[0], x)
            k0 = cfg.filter_widths[0]
            taps0 = jnp.concatenate(
                streaming._ring_tap_rows_block(bufs[0], ptr[0], caps[0],
                                               k0, 1, k)
                + [x.reshape(k * b, -1)], axis=-1)
            eq = streaming._expand_step_i8(q, taps0).reshape(k, b, -1)
            widths = tuple(cfg.filter_widths[1:])
            dils = tuple(cfg.dilations[1:])
            lags = tuple(tuple((kw - 1 - j) * d for j in range(kw - 1))
                         for kw, d in zip(widths, dils))
            idx = []
            for i, kw in enumerate(widths):
                cap = caps[i + 1]
                idx.append(ptr[i + 1])
                idx += [jnp.mod(ptr[i + 1] - (kw - 1 - j) * dils[i], cap)
                        for j in range(kw - 1)]
            idx = jnp.stack(idx).astype(jnp.int32)
            poses_flat, new_rings = fused_blocks_step_multi(
                q, bufs[1:], eq, idx, widths=widths, lags=lags,
                caps=tuple(caps[1:]), k=k, chunks=chunks)
            poses = jnp.swapaxes(
                poses_flat.reshape(k, b, cfg.num_joints_out, 3), 0, 1
            ).astype(jnp.float32)
            return poses, {"bufs": [bufs[0]] + new_rings,
                           "ptr": jnp.mod(ptr + k,
                                          jnp.asarray(caps, jnp.int32))}

        return step

    runners = {}

    def add_runner(name, step_fn, init_fn, frame0, per_dispatch):
        @functools.partial(jax.jit, static_argnums=1)
        def run_n(ss, n):
            def body(i, carry):
                ss, acc = carry
                out, ss = step_fn(q, ss, frame0 + acc)
                return ss, jnp.sum(out[0, 0]) * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, n, body, (ss, jnp.float32(0.0)))

        def timed(n):
            ss = init_fn()
            t0 = time.perf_counter()
            _, acc = run_n(ss, n)
            float(acc)
            return time.perf_counter() - t0

        try:
            timed(args.iters_lo); timed(args.iters_hi)
        except Exception as e:  # compile OOM etc: record and skip
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return
        runners[name] = (timed, per_dispatch)
        print(f"compiled {name}", flush=True)

    if args.baseline:
        f1 = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
        add_runner(
            "int8_k1",
            lambda q, ss, f: streaming.stream_step_int8(cfg, q, ss, f),
            lambda: streaming.init_stream_state_int8(cfg, q, first),
            f1, 1)
    for spec in args.variants.split(","):
        k, chunks = (int(v) for v in spec.split(":"))
        fk = jnp.asarray(rng.standard_normal((b, k, 17, 2)), jnp.float32)
        add_runner(
            f"fused_k{k}c{chunks}", make_step(k, chunks),
            functools.partial(streaming.init_stream_state_int8_multi,
                              cfg, q, first, k),
            fk, k)

    for rep in range(args.reps):
        for name, (timed, per_dispatch) in runners.items():
            lo = timed(args.iters_lo)
            hi = timed(args.iters_hi)
            ms = ((hi - lo) / (args.iters_hi - args.iters_lo)
                  / per_dispatch * 1e3)
            print(f"rep {rep} {name:16s} {ms:.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
