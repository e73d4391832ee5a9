#!/usr/bin/env python
"""Interleaved semi-supervised-step A/B: XLA batch-assembly gathers vs the
Pallas DMA-ring gather on flattened lane-padded streams.

The semi step assembles TWO 2D window batches per step (labeled + unlabeled,
each B x (2*pad+1) rows) — exactly the shape where the DMA gather measured
5.7x standalone (tools/exp_pallas_gather.py) and -1.8%/-3.5% inside the
supervised step (tools/exp_gather_step_ab.py).  The unlabeled keypoints
double as the reprojection-loss target, so the assembly restores the joint
axis after the flattened gather (``joint_axis_2d`` — bitwise-equal values,
tests/test_pallas_gather.py::TestSemiTrainerGather).

Variants (bitwise-identical loss trajectories):
  xla    — production-to-date semi layout: rank-3 (rows, J, 2) streams,
           vmap(dynamic_slice) gathers
  pallas — flattened + 128-lane-padded streams (labeled 2D + 3D, unlabeled
           2D), DMA-ring gathers, joint axis restored in-assembly

Timing: per-step slope between a 1-step and an n-step epoch scan
(SemiSupervisedTrainer.run_epoch), same two-endpoint latency-cancelled
methodology as tools/_bench_common (the scan removes per-step dispatch).

Usage: python tools/exp_gather_semi_ab.py [--batch 1024] [--reps 5]
         [--iters 16] [--dtype float32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "mixed"])
    ap.add_argument("--n-seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=3000)
    ap.add_argument("--n-seqs-semi", type=int, default=100)
    ap.add_argument("--seq-len-semi", type=int, default=2600)
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.train import SemiSupervisedTrainer, TrainLoopConfig

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype=args.dtype)
    traj_cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=1,
        filter_widths=cfg.filter_widths, dropout=cfg.dropout,
        channels=cfg.channels, compute_dtype=cfg.compute_dtype)
    pad = (receptive_field(cfg) - 1) // 2
    B = args.batch
    margins = FlatSequenceDataset.training_margins(pad, 0, 1)
    perm = np.arange(17)
    cam = np.array([2.29, 2.28, 0.04, 0.0, -0.21, 0.24, -0.003, 0.0, 0.0],
                   np.float32)

    rng = np.random.default_rng(0)
    lengths = [args.seq_len] * args.n_seqs
    lengths_semi = [args.seq_len_semi] * args.n_seqs_semi

    def host_ds(ls, with_3d):
        p2 = [rng.standard_normal((n, 17, 2)).astype(np.float32) * 0.3
              for n in ls]
        p3 = ([(rng.standard_normal((n, 17, 3)) * 0.3 +
                np.array([0, 0, 4])).astype(np.float32) for n in ls]
              if with_3d else None)
        return FlatSequenceDataset(p2, p3, [cam] * len(ls), margins=margins,
                                   flip_perms=(perm, perm))

    ds = host_ds(lengths, True)
    ds_semi = host_ds(lengths_semi, False)
    devs = {
        "xla": ("xla", ds.to_device(), ds_semi.to_device()),
        # 3D targets stay rank-3/XLA (flattening them measured perf-neutral
        # and breaks hardware bitwiseness via loss-reduce re-tiling — see
        # exp_gather_step_ab.py pallas3d).
        "pallas": ("auto",
                   ds.to_device(flatten_2d=True, lane_pad_2d=True),
                   ds_semi.to_device(flatten_2d=True, lane_pad_2d=True)),
    }
    jax.block_until_ready(tuple(d.flat_2d_padded for _, d, _ in devs.values()))
    print(f"data uploaded (labeled {sum(lengths)} + unlabeled "
          f"{sum(lengths_semi)} frames, x2 flip)", flush=True)

    sampler = ChunkedPairSampler(lengths, B, 1, augment=True)
    sampler_semi = ChunkedPairSampler(lengths_semi, B, 1, random_seed=4321,
                                      augment=True, endless=True)
    steps = []
    semi_iter = sampler_semi.next_epoch()
    for meta, n_valid in sampler.next_epoch():
        steps.append((meta, n_valid) + tuple(next(semi_iter)))
        if len(steps) >= args.iters:
            break
    assert len(steps) == args.iters, "fixture too small for --iters"
    metas = np.stack([s[0] for s in steps])
    n_valids = np.asarray([s[1] for s in steps], np.int32)
    metas_semi = np.stack([s[2] for s in steps])
    n_valids_semi = np.asarray([s[3] for s in steps], np.int32)

    parents = np.array([-1] + list(range(16)))
    params0 = {}
    params0["pos"], s_pos = init_temporal_model(cfg, jax.random.PRNGKey(0))
    params0["traj"], s_traj = init_temporal_model(traj_cfg,
                                                  jax.random.PRNGKey(1))
    states0 = {"pos": s_pos, "traj": s_traj}

    trainers, frozen = {}, {}
    for name, (impl, dev, dev_semi) in devs.items():
        loop = TrainLoopConfig(batch_size=B, chunk_length=1, pad=pad,
                               causal_shift=0, warmup=0, gather_impl=impl)
        trainers[name] = SemiSupervisedTrainer(cfg, traj_cfg, loop, perm,
                                               perm, parents)

    def run_epoch(name, n):
        impl, dev, dev_semi = devs[name]
        tr = trainers[name]
        params = jax.tree_util.tree_map(lambda x: x + 0, params0)
        states = jax.tree_util.tree_map(lambda x: x + 0, states0)
        opt = tr.init_optimizer(params)
        out = tr.run_epoch(params, states, opt, jax.random.PRNGKey(2),
                           dev, dev_semi, metas[:n], n_valids[:n],
                           metas_semi[:n], n_valids_semi[:n], 0.1, False)
        losses = out[4]
        return float(np.asarray(losses[3])[-1])  # total loss, forces exec

    # Compile both endpoint graphs per variant; bitwise check on the way.
    vals = {}
    for name in devs:
        t0 = time.perf_counter()
        run_epoch(name, 1)
        print(f"compiled {name} n=1 in {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        vals[name] = run_epoch(name, args.iters)
        print(f"compiled {name} n={args.iters} in "
              f"{time.perf_counter()-t0:.1f}s  final loss "
              f"{vals[name]:.9f}", flush=True)
    print(f"bitwise loss equality: {vals['xla'] == vals['pallas']}",
          flush=True)

    results = {name: [] for name in devs}
    for rep in range(args.reps):
        for name in devs:
            t0 = time.perf_counter()
            run_epoch(name, 1)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_epoch(name, args.iters)
            tn = time.perf_counter() - t0
            ms = (tn - t1) / (args.iters - 1) * 1e3
            results[name].append(ms)
            print(f"rep {rep} {name:7s} {ms:.3f} ms/step", flush=True)

    print()
    means = {}
    for name, ms in results.items():
        means[name] = float(np.mean(ms))
        print(f"{name:7s} mean {means[name]:.3f} min {np.min(ms):.3f} "
              f"ms/step", flush=True)
    print(f"pallas/xla ratio {means['pallas'] / means['xla']:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
