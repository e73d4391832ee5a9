#!/usr/bin/env python
"""Interleaved same-process A/B: XLA vs fused-Pallas TRAIN engine (real TPU).

The round-2 finding (Pallas custom-VJP train block slower than XLA because
pallas_call boundaries force operand relayouts) is a *toolchain* statement —
it must be re-checked when jaxlib/Mosaic updates.  This tool times the full
train step (assemble + fwd + bwd + fused optimizer) for
``train_engine="xla"`` and ``"pallas"`` in ONE process with alternating
reps, the only methodology that survives the ~8-10%% chip-day swings
(CLAUDE.md round-3 notes: sequential cross-process benches once showed a
fake 2%% win).

Usage: python tools/exp_train_engine_ab.py [--batch 1024] [--reps 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 forward_strided,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.train import fused_optimizer_apply, make_optimizer

    def make_cfg(engine):
        return TemporalModelConfig(
            num_joints_in=17, in_features=2, num_joints_out=17,
            filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
            channels=1024, compute_dtype=args.dtype, train_engine=engine)

    cfgs = {"xla": make_cfg("xla"), "pallas": make_cfg("pallas")}
    rf = receptive_field(cfgs["xla"])
    pad = (rf - 1) // 2
    B = args.batch

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
    jax.block_until_ready((dev.flat_2d_padded, dev.flat_3d_padded))

    meta = np.stack([
        rng.integers(0, n_seqs, B),
        rng.integers(0, seq_len - 1, B),
        np.zeros(B, np.int64),
        rng.integers(0, 2, B)], axis=1).astype(np.int32)
    meta[:, 2] = meta[:, 1] + 1
    meta = jnp.asarray(meta)

    params, state = init_temporal_model(cfgs["xla"], jax.random.PRNGKey(0))
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

    def step_graph(cfg):
        def loss_of(p, b2, b3, k):
            pred, new_state = forward_strided(cfg, p, state, b2, train=True,
                                              momentum=momentum, rng=k)
            return jnp.mean(jnp.linalg.norm(pred - b3, axis=-1)), new_state

        @functools.partial(jax.jit, static_argnums=(5,))
        def run(params, opt_state, data, meta, key, n):
            def body(i, carry):
                params, opt_state, acc = carry
                meta_i = meta + (acc * 0).astype(jnp.int32)
                flat_2d, flat_3d, base_2d, base_3d = data
                _, b3, b2 = assemble(flat_2d, flat_3d, None, base_2d,
                                     base_3d, meta_i,
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
        return run

    graphs = {name: step_graph(cfg) for name, cfg in cfgs.items()}
    for name, g in graphs.items():
        float(g(params, opt_state, data, meta, key, 1))
        float(g(params, opt_state, data, meta, key, args.iters))
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in graphs}
    for rep in range(args.reps):
        for name, g in graphs.items():
            t0 = time.perf_counter()
            float(g(params, opt_state, data, meta, key, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(g(params, opt_state, data, meta, key, args.iters))
            tn = time.perf_counter() - t0
            ms = (tn - t1) / (args.iters - 1) * 1e3
            results[name].append(ms)
            print(f"rep {rep} {name:7s} {ms:.3f} ms/step", flush=True)

    print()
    means = {}
    for name, ms in results.items():
        means[name] = float(np.mean(ms))
        print(f"{name:7s} mean {np.mean(ms):.3f} min {np.min(ms):.3f} "
              f"ms/step", flush=True)
    ratio = means["pallas"] / means["xla"]
    print(f"pallas/xla ratio {ratio:.3f} "
          f"({'pallas SLOWER — XLA stays default' if ratio > 1.0 else 'pallas FASTER — revisit the default!'})",
          flush=True)


if __name__ == "__main__":
    main()
