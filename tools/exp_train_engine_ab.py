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
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import _bench_common as bc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    if args.dtype == "mixed":
        # models/temporal.py gates the fused kernel OFF for "mixed" (it is an
        # XLA-engine scheme), so both legs would silently run the identical
        # XLA path and print a fake parity verdict into the floor records.
        sys.exit("--dtype mixed never engages the pallas train engine; "
                 "A/B at float32 or bfloat16")

    cfgs = {engine: bc.flagship_cfg(compute_dtype=args.dtype,
                                    train_engine=engine)
            for engine in ("xla", "pallas")}
    fx = bc.train_fixture(cfgs["xla"], args.batch)
    dev = fx.ds.to_device()
    jax.block_until_ready((dev.flat_2d_padded, dev.flat_3d_padded))

    graphs = {name: bc.step_graph(cfg, fx) for name, cfg in cfgs.items()}
    for name, g in graphs.items():
        bc.warm(g, fx, dev, args.iters)
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in graphs}
    for rep in range(args.reps):
        for name, g in graphs.items():
            ms = bc.timed_ms_per_step(g, fx, dev, args.iters)
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
