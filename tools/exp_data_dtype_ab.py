#!/usr/bin/env python
"""Interleaved A/B: f32-stored vs bf16-stored 2D training stream (real TPU).

At ``compute_dtype="bfloat16"`` the model's first matmul casts its operand to
bf16 anyway, so storing the padded flat 2D array in bf16
(``FlatSequenceDataset.to_device(dtype_2d=jnp.bfloat16)``) is bit-identical
— and halves both the assembly-gather HBM traffic (the window slices read
~34 MB/step at B=1024/RF=243) and the dataset's device footprint.  This
tool measures the actual step-time win, interleaved in one process, and
checks bitwise equality of the two steps' losses first.

Usage: python tools/exp_data_dtype_ab.py [--batch 1024] [--reps 4]
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
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 forward_strided,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.train import fused_optimizer_apply, make_optimizer

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype="bfloat16")
    rf = receptive_field(cfg)
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
    devs = {"f32_data": ds.to_device(),
            "bf16_data": ds.to_device(dtype_2d=jnp.bfloat16)}
    jax.block_until_ready(tuple(d.flat_2d_padded for d in devs.values()))

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

    # One jitted graph parameterized by the data tuple (the flat arrays must
    # be jit ARGUMENTS — closure constants would bake them into the HLO); the
    # bf16-stored variant retraces automatically on the dtype change.
    @functools.partial(jax.jit, static_argnums=(5, 6))
    def run(params, opt_state, data, meta, key, n, aug2):
        def body(i, carry):
            params, opt_state, acc = carry
            meta_i = meta + (acc * 0).astype(jnp.int32)
            flat_2d, flat_3d, base_2d, base_3d = data
            _, b3, b2 = assemble(flat_2d, flat_3d, None, base_2d, base_3d,
                                 meta_i, aug_offset_2d=aug2,
                                 aug_offset_3d=devs["f32_data"].aug_offset_3d)
            k = jax.random.fold_in(key, i)
            (loss, _), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params, b2, b3, k)
            params, opt_state = fused_optimizer_apply(
                optimizer, grads, opt_state, params)
            return params, opt_state, loss
        params, opt_state, acc = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return acc

    def data_of(dev):
        return (dev.flat_2d_padded, dev.flat_3d_padded, dev.base_2d,
                dev.base_3d)

    # Bitwise check: the two storages produce the SAME loss trajectory.
    vals = {}
    for name, dev in devs.items():
        vals[name] = float(run(params, opt_state, data_of(dev), meta, key,
                               4, dev.aug_offset_2d))
        print(f"compiled {name}; loss after 4 steps {vals[name]:.9f}",
              flush=True)
    bitwise = vals["f32_data"] == vals["bf16_data"]
    print(f"bitwise loss equality: {bitwise}", flush=True)

    for name, dev in devs.items():
        float(run(params, opt_state, data_of(dev), meta, key, args.iters,
                  dev.aug_offset_2d))

    results = {name: [] for name in devs}
    for rep in range(args.reps):
        for name, dev in devs.items():
            d = data_of(dev)
            t0 = time.perf_counter()
            float(run(params, opt_state, d, meta, key, 1, dev.aug_offset_2d))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(params, opt_state, d, meta, key, args.iters,
                      dev.aug_offset_2d))
            tn = time.perf_counter() - t0
            ms = (tn - t1) / (args.iters - 1) * 1e3
            results[name].append(ms)
            print(f"rep {rep} {name:10s} {ms:.3f} ms/step", flush=True)

    print()
    means = {}
    for name, ms in results.items():
        means[name] = float(np.mean(ms))
        print(f"{name:10s} mean {np.mean(ms):.3f} min {np.min(ms):.3f} "
              f"ms/step", flush=True)
    print(f"bf16_data/f32_data ratio {means['bf16_data'] / means['f32_data']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
