#!/usr/bin/env python
"""One real H36M-scale training epoch through the production path (real TPU).

Unlike tools/bench_step.py (a fori_loop over one reused descriptor batch),
this drives exactly what the runner's epoch-scan path runs: the
ChunkedPairSampler enumerates + shuffles the full flip-augmented descriptor
set (~3047 batches of 1024 at H36M scale), and ``SupervisedTrainer.run_epoch``
executes the whole epoch as ONE ``lax.scan`` program over the stacked
descriptors.  Prints host (sampler) time and device epoch time separately.

Usage: python tools/bench_epoch.py [--n-seqs 600] [--seq-len 2600]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def _print_trace_breakdown(logdir, steps, top):
    """Parse the profiler trace at ``logdir`` and print the summed per-op
    device time divided by ``steps`` (TPU device PIDs only — host/pjrt rows
    excluded)."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
    device_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "pjrt" not in str(e["args"]["name"]).lower()}
    tot = defaultdict(float)
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and e.get("pid") in device_pids):
            tot[e.get("name", "")] += e["dur"]
    total_us = sum(tot.values())
    print(f"device op total {total_us / steps / 1e3:.2f} ms/step")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us / steps:9.1f} us/step  {name[:110]}")


def _semi_epochs(args, cfg, loop, pad):
    """Semi-supervised epoch at scale: LABELED set sized by --n-seqs/
    --seq-len, UNLABELED endless stream over a full 600-seq corpus (the
    reference's semi setting trains on a small labeled subject + everything
    else unlabeled, run.py:319-398)."""
    import dataclasses

    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 init_temporal_model)
    from videopose3d_tpu.train import (SemiSupervisedTrainer,
                                       bn_momentum_for_epoch)

    loop = dataclasses.replace(loop, warmup=0)
    B = loop.batch_size
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    lengths = [args.seq_len] * args.n_seqs
    lengths_semi = [2600] * 600
    margins = FlatSequenceDataset.training_margins(pad, 0, 1)
    perm = np.arange(17)
    cam = np.array([2.29, 2.28, 0.04, 0.0, -0.21, 0.24, -0.003, 0.0, 0.0],
                   np.float32)

    # Production layout mirror: flatten + lane-pad where the Pallas DMA
    # gather can run (single TPU device, not forced off) — runner parity.
    lane_pad = (args.gather_impl != "xla"
                and jax.default_backend() == "tpu")

    def build(ls, with_3d):
        p2 = [rng.standard_normal((n, 17, 2)).astype(np.float32) * 0.3
              for n in ls]
        p3 = ([(rng.standard_normal((n, 17, 3)) * 0.3 +
                np.array([0, 0, 4])).astype(np.float32) for n in ls]
              if with_3d else None)
        return FlatSequenceDataset(p2, p3, [cam] * len(ls), margins=margins,
                                   flip_perms=(perm, perm)).to_device(
            flatten_2d=lane_pad, lane_pad_2d=lane_pad)

    dev = build(lengths, True)
    dev_semi = build(lengths_semi, False)
    jax.block_until_ready((dev.flat_2d_padded, dev_semi.flat_2d_padded))
    print(f"[{time.perf_counter() - t0:6.1f}s] semi data built "
          f"(labeled {sum(lengths)} + unlabeled {sum(lengths_semi)} frames, "
          "x2 flip)", flush=True)

    traj_cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=1,
        filter_widths=cfg.filter_widths, dropout=cfg.dropout,
        channels=cfg.channels, compute_dtype=cfg.compute_dtype)
    parents = np.array([-1] + list(range(16)))
    trainer = SemiSupervisedTrainer(cfg, traj_cfg, loop, perm, perm, parents)
    params = {}
    params["pos"], s_pos = init_temporal_model(cfg, jax.random.PRNGKey(0))
    params["traj"], s_traj = init_temporal_model(traj_cfg,
                                                 jax.random.PRNGKey(1))
    states = {"pos": s_pos, "traj": s_traj}
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(2)

    sampler = ChunkedPairSampler(lengths, B, 1, augment=True)
    sampler_semi = ChunkedPairSampler(lengths_semi, B, 1, random_seed=4321,
                                      augment=True, endless=True)
    semi_iter = sampler_semi.next_epoch()

    for epoch in range(args.epochs):
        tracing = args.profile and epoch == args.epochs - 1
        if tracing:
            import tempfile
            logdir = tempfile.mkdtemp(prefix="semi_epoch_prof_")
            jax.profiler.start_trace(logdir)
        momentum = bn_momentum_for_epoch(loop, epoch - 1)
        th0 = time.perf_counter()
        metas, n_valids, metas_semi, n_valids_semi = [], [], [], []
        for meta, n_valid in sampler.next_epoch():
            ms, nvs = next(semi_iter)
            metas.append(meta)
            n_valids.append(n_valid)
            metas_semi.append(ms)
            n_valids_semi.append(nvs)
        metas, metas_semi = np.stack(metas), np.stack(metas_semi)
        n_valids, n_valids_semi = (np.array(n_valids),
                                   np.array(n_valids_semi))
        if args.max_steps is not None:
            metas, n_valids = metas[:args.max_steps], n_valids[:args.max_steps]
            metas_semi = metas_semi[:args.max_steps]
            n_valids_semi = n_valids_semi[:args.max_steps]
        host_s = time.perf_counter() - th0

        td0 = time.perf_counter()
        (params, states, opt_state, step_rng,
         (l_pos, l_traj, l_recon, l_total)) = trainer.run_epoch(
            params, states, opt_state, step_rng, dev, dev_semi,
            metas, n_valids, metas_semi, n_valids_semi, momentum,
            skip=False, scan_chunk=args.scan_chunk)
        final = float(jnp.asarray(l_total)[-1])
        dev_s = time.perf_counter() - td0
        steps = len(n_valids)
        frames = int(n_valids.sum()) + int(n_valids_semi.sum())
        print(f"semi epoch {epoch}: sampler {host_s:.2f} s + scan "
              f"{dev_s:.2f} s ({steps} steps, {dev_s / steps * 1e3:.2f} "
              f"ms/step, {frames / dev_s / 1e3:.0f}k frames/s) "
              f"loss {final:.4f}", flush=True)
        if tracing:
            jax.profiler.stop_trace()
            _print_trace_breakdown(logdir, steps, args.top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n-seqs", type=int, default=600)
    ap.add_argument("--seq-len", type=int, default=2600)
    ap.add_argument("--epochs", type=int, default=2,
                    help="first epoch compiles; report the rest")
    ap.add_argument("--dtype", default="bfloat16",
                    help="training compute dtype (the perf configuration; "
                         "the CLI's metric-grade default is float32)")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="truncate each epoch's descriptor stack (crash/"
                         "scale isolation)")
    ap.add_argument("--scan-chunk", type=int, default=0,
                    help="split the epoch scan into device programs of at "
                         "most this many steps (bit-identical; the f32 "
                         "workaround for the ~3000-step tunnel fault)")
    ap.add_argument("--gather-impl", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="batch-assembly copy engine (supervised path; "
                         "mirrors run.py --gather-impl)")
    ap.add_argument("--semi", action="store_true",
                    help="semi-supervised epoch at scale: --n-seqs/--seq-len "
                         "size the LABELED set (e.g. --n-seqs 60 for the "
                         "reference's ~10%%-labeled setting); the unlabeled "
                         "endless stream covers the full 600-seq corpus")
    ap.add_argument("--profile", action="store_true",
                    help="trace the last epoch and print the per-op device "
                         "time breakdown")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from videopose3d_tpu.data.generators import (ChunkedPairSampler,
                                                 FlatSequenceDataset)
    from videopose3d_tpu.models.temporal import (TemporalModelConfig,
                                                 init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.train import (SupervisedTrainer, TrainLoopConfig,
                                       bn_momentum_for_epoch)

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype=args.dtype)
    pad = (receptive_field(cfg) - 1) // 2
    B = args.batch
    loop = TrainLoopConfig(batch_size=B, chunk_length=1, pad=pad,
                           causal_shift=0, epochs=args.epochs,
                           gather_impl=args.gather_impl)

    if args.semi:
        return _semi_epochs(args, cfg, loop, pad)

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    lengths = [args.seq_len] * args.n_seqs
    poses_2d = [rng.standard_normal((n, 17, 2)).astype(np.float32)
                for n in lengths]
    poses_3d = [rng.standard_normal((n, 17, 3)).astype(np.float32)
                for n in lengths]
    perm = np.arange(17)
    ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(pad, 0, 1),
        flip_perms=(perm, perm))
    # Production supervised layout; lane_pad mirrors the runner's auto gate
    # (Pallas DMA gather on a single TPU device unless --gather-impl xla).
    lane_pad = (args.gather_impl != "xla"
                and jax.default_backend() == "tpu")
    dev = ds.to_device(flatten_2d=True, lane_pad_2d=lane_pad)
    jax.block_until_ready((dev.flat_2d_padded, dev.flat_3d_padded))
    print(f"[{time.perf_counter() - t0:6.1f}s] data built + uploaded "
          f"({ds.num_frames} frames x2 flip)", flush=True)

    sampler = ChunkedPairSampler(lengths, B, 1, augment=True)
    trainer = SupervisedTrainer(cfg, loop, perm, perm)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    opt_state = trainer.init_optimizer(params)
    step_rng = jax.random.PRNGKey(1)

    for epoch in range(args.epochs):
        tracing = args.profile and epoch == args.epochs - 1
        if tracing:
            import tempfile
            logdir = tempfile.mkdtemp(prefix="epoch_prof_")
            jax.profiler.start_trace(logdir)
        momentum = bn_momentum_for_epoch(loop, epoch - 1)
        th0 = time.perf_counter()
        metas, n_valids = [], []
        for meta, n_valid in sampler.next_epoch():
            metas.append(meta)
            n_valids.append(n_valid)
        metas = np.stack(metas)
        n_valids = np.array(n_valids)
        if args.max_steps is not None:
            metas = metas[:args.max_steps]
            n_valids = n_valids[:args.max_steps]
        host_s = time.perf_counter() - th0

        td0 = time.perf_counter()
        params, state, opt_state, step_rng, losses = trainer.run_epoch(
            params, state, opt_state, step_rng, dev, metas, n_valids,
            momentum, scan_chunk=args.scan_chunk)
        final = float(jnp.asarray(losses)[-1])  # forces execution
        dev_s = time.perf_counter() - td0
        steps = len(n_valids)
        print(f"epoch {epoch}: sampler {host_s:.2f} s + scan {dev_s:.2f} s "
              f"({steps} steps, {dev_s / steps * 1e3:.2f} ms/step, "
              f"{int(n_valids.sum()) / dev_s / 1e3:.0f}k frames/s) "
              f"loss {final:.4f}", flush=True)
        if tracing:
            jax.profiler.stop_trace()
            _print_trace_breakdown(logdir, steps, args.top)


if __name__ == "__main__":
    main()
