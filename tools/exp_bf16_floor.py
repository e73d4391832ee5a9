#!/usr/bin/env python
"""Share-of-roofline accounting for the serving paths (real TPU).

Measures, in ONE session (so chip-day variance cancels): the large-matmul
roofline (8192^3), the bf16 fused-Pallas serving path, the XLA bf16 path,
and the int8 serving path at the bench shape — then converts each to
TFLOP/s via the model's per-output-frame FLOP count and prints the share of
the same-day roofline.

Per-frame FLOPs at RF 243 / 1024 ch / 17 joints (B*t_out output frames per
call; TTA off in the bench):
  expand 3*34*1024 + 4 blocks * (3*1024^2 + 1024^2) + shrink 1024*51
  = 16.93M MACs = 33.86 MFLOP/output frame (+0.7% receptive-field overlap).

Usage: python tools/exp_bf16_floor.py [--t-out 32768] [--batch 4]
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


def _throughput(infer_n, w, x, n_iters=16, reps=5):
    def timed(n):
        float(infer_n(w, x, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(infer_n(w, x, n))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tn = timed(1), timed(n_iters)
    return (tn - t1) / (n_iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t-out", type=int, default=32768)
    ap.add_argument("--t-tile", type=int, default=512)
    ap.add_argument("--halves", type=int, default=4)
    ap.add_argument("--matmul-n", type=int, default=8192)
    args = ap.parse_args()

    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, receptive_field,
        forward_dilated, forward_dilated_fused)
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        quantize_temporal_model, forward_dilated_int8)

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype="bfloat16")
    rf = receptive_field(cfg)
    c = cfg.channels
    n_blocks = len(cfg.filter_widths) - 1
    macs_per_frame = (3 * 34 * c + n_blocks * (3 * c * c + c * c)
                      + c * cfg.num_joints_out * 3)
    flop_per_frame = 2 * macs_per_frame
    print(f"model: {flop_per_frame / 1e6:.2f} MFLOP per output frame")

    # --- roofline: latency-cancelled chained big matmul ---
    n = args.matmul_n
    a = jnp.ones((n, n), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=2)
    def mm_n(w, x, iters):
        def body(i, acc):
            return jnp.dot(acc, w, preferred_element_type=jnp.bfloat16)
        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(out[0, :8].astype(jnp.float32)) * 1e-30

    per_mm = _throughput(mm_n, a * 1e-4, a, n_iters=8)
    roofline = 2 * n ** 3 / per_mm / 1e12
    print(f"roofline (bf16 {n}^3): {per_mm * 1e3:.2f} ms/matmul = "
          f"{roofline:.1f} TFLOP/s", flush=True)

    # --- serving paths at the bench shape ---
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)),
                        jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)
    batch, t_out, t_tile = args.batch, args.t_out, args.t_tile
    x = jnp.asarray(rng.standard_normal((batch, t_out + rf - 1, 17, 2)),
                    jnp.float32)
    frames_per_call = batch * t_out

    def make_infer_n(forward):
        @functools.partial(jax.jit, static_argnums=2)
        def infer_n(w, xx, iters):
            def body(i, carry):
                x_dep, acc = carry
                pred = forward(w, x_dep)
                acc = jnp.sum(pred[0, 0, 0]) * jnp.float32(1e-30)
                return x_dep + acc, acc
            (_, acc) = jax.lax.fori_loop(0, iters, body, (xx, jnp.float32(0.0)))
            return acc
        return infer_n

    legs = {
        "bf16_fused_pallas": (make_infer_n(
            lambda ps, xd: forward_dilated_fused(cfg, ps[0], ps[1], xd,
                                                 t_tile=t_tile)),
            (params, state), 1.0),
        "bf16_xla": (make_infer_n(
            lambda ps, xd: forward_dilated(cfg, ps[0], ps[1], xd,
                                           train=False)[0]),
            (params, state), 1.0),
        "int8_w8a8": (make_infer_n(
            lambda qq, xd: forward_dilated_int8(cfg, qq, xd, t_tile=t_tile,
                                                halves=args.halves)),
            q, 2.0),
    }
    for name, (fn, w, peak_factor) in legs.items():
        per = _throughput(fn, w, x)
        fps = frames_per_call / per
        tflops = fps * flop_per_frame / 1e12
        print(f"{name:18s}: {per * 1e3:7.2f} ms/call  {fps / 1e6:5.2f}M "
              f"frames/s  {tflops:6.1f} T(FL)OP/s  = "
              f"{tflops / (roofline * peak_factor) * 100:5.1f}% of the "
              f"same-day {'int8 (2x bf16)' if peak_factor > 1 else 'bf16'} "
              f"roofline", flush=True)


if __name__ == "__main__":
    main()
