#!/usr/bin/env python
"""Op-level profile of the supervised train step on real TPU.

Captures a jax.profiler trace of N in-graph chained steps (same graph as
tools/bench_step.py's "step" stage) and prints the per-op time breakdown
(summed TPU op durations / N), to see where the remaining non-matmul time
goes.

Usage: python tools/profile_step.py [--batch 1024] [--iters 16] [--top 40]
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

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dropout", type=float, default=0.25)
    ap.add_argument("--group", action="store_true",
                    help="group ops by kind (fusion/copy/dot/...)")
    ap.add_argument("--dump-hlo", default=None,
                    help="write the compiled optimized HLO to this path "
                         "(to map trace op names like fusion.585 to content)")
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, forward_strided,
        receptive_field)
    from videopose3d_tpu.train import fused_optimizer_apply, make_optimizer

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=args.dropout,
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
    dev = ds.to_device(flatten_2d=True)  # production supervised layout

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
        pred, new_state = forward_strided(cfg, p, state, b2, train=True,
                                          momentum=momentum, rng=k)
        return jnp.mean(jnp.linalg.norm(pred - b3, axis=-1)), new_state

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(params, opt_state, meta, key, n):
        def body(i, carry):
            params, opt_state, acc = carry
            meta_i = meta + (acc * 0).astype(jnp.int32)
            _, b3, b2 = assemble(dev.flat_2d_padded, dev.flat_3d_padded, None,
                                 dev.base_2d, dev.base_3d, meta_i,
                                 aug_offset_2d=dev.aug_offset_2d,
                                 aug_offset_3d=dev.aug_offset_3d)
            k = jax.random.fold_in(key, i)
            (loss, _), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params, b2, b3, k)
            params, opt_state = fused_optimizer_apply(
                optimizer, grads, opt_state, params)
            return params, opt_state, loss * 1e-30
        params, opt_state, acc = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return acc

    if args.dump_hlo:
        compiled = run.lower(params, opt_state, meta, key,
                             args.iters).compile()
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"wrote optimized HLO to {args.dump_hlo}", flush=True)

    float(run(params, opt_state, meta, key, args.iters))  # compile + warm

    logdir = tempfile.mkdtemp(prefix="step_prof_")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    float(run(params, opt_state, meta, key, args.iters))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
    tot = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            if name.startswith(("Thread", "process_")):
                continue
            if args.group:
                base = name.split(".")[0].rstrip("0123456789_")
                tot[base] += e["dur"]
            else:
                tot[name] += e["dur"]
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    n = args.iters
    print(f"wall {wall*1e3:.1f} ms for {n} steps "
          f"({wall*1e3/n:.2f} ms/step incl. host)")
    total_us = sum(tot.values())
    print(f"device op total {total_us/n/1e3:.2f} ms/step")
    for name, us in items[:args.top]:
        print(f"  {us/n:9.1f} us/step  {name[:110]}")


if __name__ == "__main__":
    main()
