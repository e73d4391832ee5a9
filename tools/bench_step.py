#!/usr/bin/env python
"""Train-step decomposition benchmark (real TPU).

Measures, with the latency-cancelled in-graph fori_loop pattern, per-step time
of: batch assembly alone; assembly + train-mode forward; assembly + forward +
backward; the full step (+ Adam update).  Each stage's graph carries a true
data dependency between iterations so XLA cannot hoist or elide work.

Usage: python tools/bench_step.py [--batch 1024] [--iters 8] [--stage all]
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
import optax

jax.config.update("jax_default_prng_impl", "rbg")

from videopose3d_tpu.data.generators import (  # noqa: E402
    FlatSequenceDataset, assemble_chunked_batch_contiguous)
from videopose3d_tpu.models.temporal import (  # noqa: E402
    TemporalModelConfig, init_temporal_model, forward_strided,
    receptive_field)
from videopose3d_tpu.train import (  # noqa: E402
    fused_optimizer_apply, make_optimizer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", default="assemble,fwd,fwdbwd,step")
    ap.add_argument("--remat", default="none",
                    choices=["none", "dots", "full"])
    ap.add_argument("--dropout", type=float, default=0.25)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-baked-flip", action="store_true")
    ap.add_argument("--train-engine", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--n-seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=3000)
    ap.add_argument("--sort-meta", action="store_true",
                    help="sort the batch's descriptors by flat-array offset "
                         "(flip, seq, start) — the locality A/B for at-scale "
                         "flat arrays; within-batch row order is numerically "
                         "invisible to the loss/BN/optimizer")
    args = ap.parse_args()

    t_wall = time.perf_counter()

    def mark(msg):
        print(f"[{time.perf_counter() - t_wall:7.1f}s] {msg}", flush=True)

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=args.dropout,
        channels=1024, compute_dtype=args.dtype, remat_policy=args.remat,
        train_engine=args.train_engine)
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2
    B = args.batch

    rng = np.random.default_rng(0)
    lengths = [args.seq_len] * args.n_seqs
    poses_2d = [rng.standard_normal((n, 17, 2)).astype(np.float32)
                for n in lengths]
    poses_3d = [rng.standard_normal((n, 17, 3)).astype(np.float32)
                for n in lengths]
    perm17 = tuple(range(17))
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=None if args.no_baked_flip else (perm17, perm17))
    mark(f"host data built: flat_2d_padded {ds.flat_2d_padded.shape} "
         f"({ds.flat_2d_padded.nbytes / 1e6:.0f} MB), flat_3d_padded "
         f"{ds.flat_3d_padded.nbytes / 1e6:.0f} MB")
    # Production supervised layout: pre-flattened (rows, 34) 2D stream
    # (runner.py wires flatten_2d for the supervised trainer).
    dev = ds.to_device(flatten_2d=not args.no_baked_flip)
    jax.block_until_ready((dev.flat_2d_padded, dev.flat_3d_padded))
    mark("device upload done")

    meta = np.stack([
        rng.integers(0, args.n_seqs, B),
        rng.integers(0, args.seq_len - 1, B),
        np.zeros(B, np.int64),
        rng.integers(0, 2, B)], axis=1).astype(np.int32)
    meta[:, 2] = meta[:, 1] + 1
    if args.sort_meta:
        order = np.lexsort((meta[:, 1], meta[:, 0], meta[:, 3]))
        meta = meta[order]
    meta = jnp.asarray(meta)

    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(1)
    momentum = jnp.float32(0.1)

    assemble = functools.partial(
        assemble_chunked_batch_contiguous,
        pad=pad, causal_shift=0, chunk_length=1,
        kps_flip_perm=tuple(range(17)), joints_flip_perm=tuple(range(17)),
        with_3d=True, with_cameras=False)

    # The flat arrays MUST be jit arguments (as the trainers pass them), not
    # closure captures: a closed-over device array is baked into the lowered
    # HLO as a constant, which at H36M scale ships ~1.1 GB through the
    # remote-compile hop (observed: broken pipe at 600x2600 frames).
    data = (dev.flat_2d_padded, dev.flat_3d_padded, dev.base_2d, dev.base_3d)

    def do_assemble(data, meta_i):
        flat_2d, flat_3d, base_2d, base_3d = data
        _, b3, b2 = assemble(flat_2d, flat_3d, None, base_2d, base_3d, meta_i,
                             aug_offset_2d=dev.aug_offset_2d,
                             aug_offset_3d=dev.aug_offset_3d)
        return b2, b3

    def loss_of(p, b2, b3, k):
        pred, new_state = forward_strided(cfg, p, state, b2, train=True,
                                          momentum=momentum, rng=k)
        return jnp.mean(jnp.linalg.norm(pred - b3, axis=-1)), new_state

    def stage_graph(stage):
        @functools.partial(jax.jit, static_argnums=(5,))
        def run(params, opt_state, data, meta, key, n):
            def body(i, carry):
                params, opt_state, acc = carry
                meta_i = meta + (acc * 0).astype(jnp.int32)
                b2, b3 = do_assemble(data, meta_i)
                if stage == "assemble":
                    # Consume every element so XLA cannot narrow the gathers.
                    acc = (jnp.sum(b2) + jnp.sum(b3)) * 1e-30
                    return params, opt_state, acc
                k = jax.random.fold_in(key, i)
                if stage == "fwd":
                    loss, _ = loss_of(params, b2, b3, k)
                    return params, opt_state, loss * 1e-30
                (loss, _), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(params, b2, b3, k)
                if stage == "fwdbwd":
                    # Consume every gradient leaf so the full backward runs.
                    gsum = sum(jnp.sum(g) for g in
                               jax.tree_util.tree_leaves(grads))
                    return params, opt_state, loss * 1e-30 + gsum * 1e-30
                # The trainers' one-pass AMSGrad+apply (train.py).
                params, opt_state = fused_optimizer_apply(
                    optimizer, grads, opt_state, params)
                return params, opt_state, loss * 1e-30
            params, opt_state, acc = jax.lax.fori_loop(
                0, n, body, (params, opt_state, jnp.float32(0.0)))
            return acc
        return run

    n = args.iters
    stages = [s.strip() for s in args.stages.split(",")]
    valid = {"assemble", "fwd", "fwdbwd", "step"}
    unknown = set(stages) - valid
    if unknown:
        raise SystemExit(f"unknown stages {sorted(unknown)}; pick from {sorted(valid)}")
    for stage in stages:
        g = stage_graph(stage)

        def timed(k, reps=3):
            float(g(params, opt_state, data, meta, key, k))
            mark(f"{stage} n={k}: compiled + warm")
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g(params, opt_state, data, meta, key, k))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tn = timed(1), timed(n)
        per = (tn - t1) / (n - 1)
        print(f"{stage:10s}: {per * 1e3:8.3f} ms/step  "
              f"({B / per / 1e3:.0f}k frames/s)", flush=True)


if __name__ == "__main__":
    main()
