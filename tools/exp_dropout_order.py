#!/usr/bin/env python
"""Interleaved A/B of the dropout-mask draw order on the full train step.

"btc" draws the mask in the activation shape (forces a relayout copy of the
rng bits per layer, e.g. copy.196 = 232 us/step for the expand layer at
B=1024); "tcb" draws (T, C, B) and transposes, which XLA folds to a bitcast
(see models/temporal.py::_dropout_mask_btc).  Both graphs are built in one
process and timed interleaved, per the methodology notes in CLAUDE.md.

Usage: python tools/exp_dropout_order.py [--batch 1024] [--iters 8] [--reps 5]
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

from videopose3d_tpu.data.generators import (  # noqa: E402
    FlatSequenceDataset, assemble_chunked_batch_contiguous)
import videopose3d_tpu.models.temporal as temporal  # noqa: E402
from videopose3d_tpu.models.temporal import (  # noqa: E402
    TemporalModelConfig, init_temporal_model, forward_strided,
    receptive_field)
from videopose3d_tpu.train import (  # noqa: E402
    fused_optimizer_apply, make_optimizer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    if args.iters < 2:
        ap.error("--iters must be >= 2 (per-step time is the slope between "
                 "an n-iteration and a 1-iteration run)")

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype="bfloat16")
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    B = args.batch

    rng = np.random.default_rng(0)
    n_seqs, seq_len = 4, 3000
    poses_2d = [rng.standard_normal((n, 17, 2)).astype(np.float32)
                for n in [seq_len] * n_seqs]
    poses_3d = [rng.standard_normal((n, 17, 3)).astype(np.float32)
                for n in [seq_len] * n_seqs]
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

    def loss_of(p, b2, b3, k):
        pred, _ = forward_strided(cfg, p, state, b2, train=True,
                                  momentum=momentum, rng=k)
        return jnp.mean(jnp.linalg.norm(pred - b3, axis=-1))

    def build(order):
        temporal._DROPOUT_DRAW_ORDER = order

        @functools.partial(jax.jit, static_argnums=(4,))
        def run(params, opt_state, meta, key, n):
            def body(i, carry):
                params, opt_state, acc = carry
                meta_i = meta + (acc * 0).astype(jnp.int32)
                _, b3, b2 = assemble(dev.flat_2d_padded, dev.flat_3d_padded,
                                     None, dev.base_2d, dev.base_3d, meta_i,
                                     aug_offset_2d=dev.aug_offset_2d,
                                     aug_offset_3d=dev.aug_offset_3d)
                k = jax.random.fold_in(key, i)
                loss, grads = jax.value_and_grad(loss_of)(params, b2, b3, k)
                params, opt_state = fused_optimizer_apply(
                    optimizer, grads, opt_state, params)
                return params, opt_state, loss * 1e-30
            params, opt_state, acc = jax.lax.fori_loop(
                0, n, body, (params, opt_state, jnp.float32(0.0)))
            return acc
        # Trace now (at the current draw-order setting) by compiling eagerly.
        run_c = run.lower(params, opt_state, meta, key, args.iters).compile()
        run_1 = run.lower(params, opt_state, meta, key, 1).compile()
        return run_1, run_c

    variants = {o: build(o) for o in ("btc", "tcb")}
    n = args.iters
    for name, (r1, rn) in variants.items():  # warm both
        float(r1(params, opt_state, meta, key))
        float(rn(params, opt_state, meta, key))

    results = {o: [] for o in variants}
    for rep in range(args.reps):
        for name, (r1, rn) in variants.items():
            t1 = time.perf_counter()
            float(r1(params, opt_state, meta, key))
            t1 = time.perf_counter() - t1
            t0 = time.perf_counter()
            float(rn(params, opt_state, meta, key))
            tn = time.perf_counter() - t0
            per = (tn - t1) / (n - 1)
            results[name].append(per)
            print(f"rep {rep} {name}: {per * 1e3:7.3f} ms/step", flush=True)
    for name, vals in results.items():
        v = np.array(vals) * 1e3
        print(f"{name}: mean {v.mean():.3f} ms/step  min {v.min():.3f}  "
              f"({B / (v.mean() / 1e3) / 1e3:.0f}k frames/s)")


if __name__ == "__main__":
    main()
