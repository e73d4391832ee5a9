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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


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

    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 forward_strided,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.train import fused_optimizer_apply, make_optimizer

    dtypes = [s.strip() for s in args.dtype.split(",")]
    cfgs = {dt: TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=args.dropout,
        channels=1024, compute_dtype=dt) for dt in dtypes}
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
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    rng = np.random.default_rng(0)
    n_seqs, seq_len = 4, 3000
    poses_2d = [rng.standard_normal((seq_len, 17, 2)).astype(np.float32)
                for _ in range(n_seqs)]
    poses_3d = [rng.standard_normal((seq_len, 17, 3)).astype(np.float32)
                for _ in range(n_seqs)]
    perm17 = tuple(range(17))
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm17, perm17))
    dev = ds.to_device()
    meta = np.stack([
        rng.integers(0, n_seqs, B),
        rng.integers(0, seq_len - 1, B),
        np.zeros(B, np.int64),
        rng.integers(0, 2, B)], axis=1).astype(np.int32)
    meta[:, 2] = meta[:, 1] + 1
    meta = jnp.asarray(meta)

    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(1)
    momentum = jnp.float32(0.1)
    assemble = functools.partial(
        assemble_chunked_batch_contiguous,
        pad=pad, causal_shift=0, chunk_length=1,
        kps_flip_perm=perm17, joints_flip_perm=perm17,
        with_3d=True, with_cameras=False)
    data = (dev.flat_2d_padded, dev.flat_3d_padded, dev.base_2d, dev.base_3d)

    def make_stage(cfg_d, stage):
        def loss_of(p, b2, b3, k):
            pred, new_state = forward_strided(cfg_d, p, state, b2, train=True,
                                              momentum=momentum, rng=k)
            return jnp.mean(jnp.linalg.norm(pred - b3, axis=-1)), new_state

        @functools.partial(jax.jit, static_argnums=(5,))
        def run(params, opt_state, data, meta, key, iters):
            def body(i, carry):
                params, opt_state, acc = carry
                meta_i = meta + (acc * 0).astype(jnp.int32)
                flat_2d, flat_3d, base_2d, base_3d = data
                _, b3, b2 = assemble(flat_2d, flat_3d, None, base_2d,
                                     base_3d, meta_i,
                                     aug_offset_2d=dev.aug_offset_2d,
                                     aug_offset_3d=dev.aug_offset_3d)
                k = jax.random.fold_in(key, i)
                if stage == "fwd":
                    loss, _ = loss_of(params, b2, b3, k)
                    return params, opt_state, loss * 1e-30
                (loss, _), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(params, b2, b3, k)
                if stage == "fwdbwd":
                    gsum = sum(jnp.sum(g) for g in
                               jax.tree_util.tree_leaves(grads))
                    return params, opt_state, loss * 1e-30 + gsum * 1e-30
                params, opt_state = fused_optimizer_apply(
                    optimizer, grads, opt_state, params)
                return params, opt_state, loss * 1e-30
            params, opt_state, acc = jax.lax.fori_loop(
                0, iters, body, (params, opt_state, jnp.float32(0.0)))
            return acc
        return run

    stages = ("fwd", "fwdbwd", "step")
    graphs = {(dt, st): make_stage(cfgs[dt], st)
              for dt in dtypes for st in stages}
    for key_g, g in graphs.items():
        float(g(params, opt_state, data, meta, key, 1))
        float(g(params, opt_state, data, meta, key, args.iters))
        print(f"compiled {key_g}", flush=True)

    # Interleaved reps across configs: best-of per (dtype, stage).
    results = {k: float("inf") for k in graphs}
    for rep in range(3):
        for key_g, g in graphs.items():
            t0 = time.perf_counter()
            float(g(params, opt_state, data, meta, key, 1))
            tt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(g(params, opt_state, data, meta, key, args.iters))
            ttn = time.perf_counter() - t0
            per = (ttn - tt1) / (args.iters - 1)
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
