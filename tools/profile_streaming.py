#!/usr/bin/env python
"""Op-level profile of the streaming engines on real TPU.

Captures a jax.profiler trace of N in-graph chained stream steps and prints
the per-op time breakdown (summed TPU op durations / N), to see where the
per-frame step sits relative to its MXU floor.

Usage: python tools/profile_streaming.py [--engine int8] [--streams 1024]
"""

import argparse
import functools
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=1024)
    ap.add_argument("--engine", choices=("bf16", "bf16_fused", "int8",
                                         "int8_fused"),
                    default="int8")
    ap.add_argument("--frames-per-step", type=int, default=1)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--top", type=int, default=25)
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
    b, k = args.streams, args.frames_per_step
    first = jnp.asarray(rng.standard_normal((b, 17, 2)), jnp.float32)
    frame = (first if k == 1 else jnp.asarray(
        rng.standard_normal((b, k, 17, 2)), jnp.float32))

    if args.engine in ("int8", "int8_fused"):
        calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)),
                            jnp.float32)
        q = quantize_temporal_model(cfg, params, state, calib)
        if args.engine == "int8_fused" and k > 1:
            step = lambda ss, f: streaming.stream_step_int8_multi_fused(
                cfg, q, ss, f)
            init = lambda: streaming.init_stream_state_int8_multi(cfg, q,
                                                                  first, k)
        elif args.engine == "int8_fused":
            step = lambda ss, f: streaming.stream_step_int8_fused(cfg, q,
                                                                  ss, f)
            init = lambda: streaming.init_stream_state_int8(cfg, q, first)
        elif k == 1:
            step = lambda ss, f: streaming.stream_step_int8(cfg, q, ss, f)
            init = lambda: streaming.init_stream_state_int8(cfg, q, first)
        else:
            step = lambda ss, f: streaming.stream_step_int8_multi(cfg, q, ss, f)
            init = lambda: streaming.init_stream_state_int8_multi(cfg, q,
                                                                  first, k)
    else:
        if args.engine == "bf16_fused" and k > 1:
            prepared = streaming.prepare_bf16_fused(cfg, params, state)
            step = lambda ss, f: streaming.stream_step_bf16_multi_fused(
                cfg, prepared, ss, f)
            init = lambda: streaming.init_stream_state_multi(
                cfg, params, state, first, k)
        elif args.engine == "bf16_fused":
            prepared = streaming.prepare_bf16_fused(cfg, params, state)
            step = lambda ss, f: streaming.stream_step_bf16_fused(
                cfg, prepared, ss, f)
            init = lambda: streaming.init_stream_state(cfg, params, state,
                                                       first)
        elif k == 1:
            step = lambda ss, f: streaming.stream_step(cfg, params, state,
                                                       ss, f)
            init = lambda: streaming.init_stream_state(cfg, params, state,
                                                       first)
        else:
            step = lambda ss, f: streaming.stream_step_multi(
                cfg, params, state, ss, f)
            init = lambda: streaming.init_stream_state_multi(
                cfg, params, state, first, k)

    @functools.partial(jax.jit, static_argnums=2)
    def run_n(ss, frame, n):
        def body(i, carry):
            ss, acc = carry
            out, ss = step(ss, frame + acc)
            return ss, jnp.sum(out[0, 0]) * jnp.float32(1e-30)
        ss, acc = jax.lax.fori_loop(0, n, body, (ss, jnp.float32(0.0)))
        return ss, acc

    # Compile + warm.
    float(run_n(init(), frame, args.iters)[1])

    logdir = tempfile.mkdtemp(prefix="stream_prof_")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    float(run_n(init(), frame, args.iters)[1])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
    tot = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            # Keep only device-lane ops (XLA op events carry args).
            name = e.get("name", "")
            if name.startswith(("Thread", "process_")):
                continue
            tot[name] += e["dur"]
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    n_frames = args.iters * k
    print(f"wall {wall*1e3:.1f} ms for {n_frames} frames "
          f"({wall*1e6/n_frames:.1f} us/frame incl. host)")
    for name, us in items[:args.top]:
        print(f"  {us/n_frames:9.2f} us/frame  {name[:100]}")


if __name__ == "__main__":
    main()
