#!/usr/bin/env python
"""Share-of-roofline accounting for the TRAIN step (real TPU).

The serving paths have a floor story (tools/exp_bf16_floor.py: bf16 fused at
94% of peak, int8 at 78% = the Mosaic realignment tax); this tool gives the
train step the same treatment, in ONE session so chip-day variance cancels:

  1. same-day bf16 matmul roofline (chained 8192^3),
  2. exact matmul FLOPs of the strided training step (fwd + bwd; dW and dX
     matmuls counted layer by layer, the expand layer's never-materialized
     dX excluded),
  3. measured per-step time of the production step graph at B=1024
     (assemble + fwd + bwd + fused AMSGrad, the bench_step "step" stage),

then prints the matmul-floor time, the share-of-floor, and the non-matmul
remainder — the "train step is X% of its matmul floor because Y" statement
(VERDICT r4 item 3).  The named remainder components come from the op-level
profile (tools/profile_step.py): BN-stat/dropout fwd elementwise, backward
elementwise+reduce chains, residual-grad layout copies, optimizer.

Reference hot loop being accounted: /root/reference/run.py:399-420.

``--dtype`` accepts a comma list (e.g. ``float32,bfloat16,mixed``): each
config gets its own step graph and the reps interleave across configs in one
process, so the f32-vs-bf16-vs-mixed ladder is chip-day-variance-free.

Usage: python tools/exp_train_floor.py [--batch 1024]
       [--dtype bfloat16,mixed,float32]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

import _bench_common as bc


def step_matmul_flops(cfg, batch):
    """Exact MXU MACs of one strided train step at chunk_length=1.

    Forward (per sample): expand conv over RF frames -> rows_0 outputs; each
    block i: conv_a (width fw, strided) + conv_b (1x1) at rows_i; shrink at 1
    row.  Backward: every forward matmul contributes a dW matmul (same MACs)
    and a dX matmul (same MACs), except the expand conv's dX (the input needs
    no gradient).  Returns (fwd_macs, bwd_macs) for the whole batch.
    """
    c = cfg.channels
    n_in = cfg.num_joints_in * cfg.in_features
    n_out = cfg.num_joints_out * 3
    fws = cfg.filter_widths
    # rows after each strided layer (per sample): RF/fw0, then /fw_i...
    rows = []
    r = 1
    for fw in reversed(fws):
        rows.append(r)
        r *= fw
    rows = rows[::-1]  # rows[0] = output rows of expand conv, etc.

    fwd = rows[0] * fws[0] * n_in * c          # expand
    for i, fw in enumerate(fws[1:]):
        fwd += rows[i + 1] * fw * c * c        # conv_a (strided width fw)
        fwd += rows[i + 1] * c * c             # conv_b (1x1)
    fwd += 1 * c * n_out                       # shrink
    bwd = 2 * fwd - rows[0] * fws[0] * n_in * c  # all dW+dX, minus expand dX
    return fwd * batch, bwd * batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16,mixed,float32",
                    help="comma list of compute dtypes to ladder")
    ap.add_argument("--dropout", type=float, default=0.25)
    ap.add_argument("--matmul-n", type=int, default=8192)
    args = ap.parse_args()

    dtypes = [s.strip() for s in args.dtype.split(",")]
    cfgs = {dt: bc.flagship_cfg(compute_dtype=dt, dropout=args.dropout)
            for dt in dtypes}
    cfg = cfgs[dtypes[0]]
    B = args.batch
    fwd_f, bwd_f = step_matmul_flops(cfg, B)
    flops = 2 * (fwd_f + bwd_f)
    print(f"step matmul FLOPs at B={B}: fwd {2 * fwd_f / 1e9:.1f} G + "
          f"bwd {2 * bwd_f / 1e9:.1f} G = {flops / 1e9:.1f} GFLOP")

    # --- same-day roofline ---
    n = args.matmul_n
    a = jnp.ones((n, n), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=2)
    def mm_n(w, x, iters):
        def body(i, acc):
            return jnp.dot(acc, w, preferred_element_type=jnp.bfloat16)
        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(out[0, :8].astype(jnp.float32)) * 1e-30

    def timed(fn, *fargs, reps=5):
        float(fn(*fargs))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*fargs))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(mm_n, a * 1e-4, a, 1)
    t8 = timed(mm_n, a * 1e-4, a, 8)
    per_mm = (t8 - t1) / 7
    roofline = 2 * n ** 3 / per_mm / 1e12
    print(f"roofline (bf16 {n}^3): {roofline:.1f} TFLOP/s", flush=True)

    # --- production step graph (bench_step "step" stage) ---
    fx = bc.train_fixture(cfg, B)
    dev = fx.ds.to_device()

    stages = ("fwd", "fwdbwd", "step")
    graphs = {(dt, st): bc.step_graph(cfgs[dt], fx, stage=st)
              for dt in dtypes for st in stages}
    for key_g, g in graphs.items():
        bc.warm(g, fx, dev, args.iters)
        print(f"compiled {key_g}", flush=True)

    # Interleaved reps across configs: best-of per (dtype, stage).
    results = {k: float("inf") for k in graphs}
    for rep in range(3):
        for key_g, g in graphs.items():
            per = bc.timed_ms_per_step(g, fx, dev, args.iters) / 1e3
            results[key_g] = min(results[key_g], per)
    for dt in dtypes:
        print(f"{dt:9s}: " + "  ".join(
            f"{st} {results[(dt, st)] * 1e3:7.3f} ms" for st in stages),
            flush=True)

    floor_ms = flops / (roofline * 1e12) * 1e3
    fwd_floor_ms = 2 * fwd_f / (roofline * 1e12) * 1e3
    print(f"\nmatmul floors at the same-day bf16 roofline: "
          f"fwd {fwd_floor_ms:.2f} ms, full step {floor_ms:.2f} ms")
    for dt in dtypes:
        fwd_ms = results[(dt, "fwd")] * 1e3
        step_ms = results[(dt, "step")] * 1e3
        print(f"{dt:9s}: fwd {fwd_floor_ms / fwd_ms * 100:3.0f}% of its "
              f"floor (remainder {fwd_ms - fwd_floor_ms:5.2f} ms) | step "
              f"{floor_ms / step_ms * 100:3.0f}% of the matmul floor "
              f"(remainder {step_ms - floor_ms:5.2f} ms) | "
              f"{flops / results[(dt, 'step')] / 1e12:5.1f} TFLOP/s eff | "
              f"{B / results[(dt, 'step')] / 1e3:.0f}k frames/s")


if __name__ == "__main__":
    main()
