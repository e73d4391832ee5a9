#!/usr/bin/env python
"""Benchmark: 2D->3D lifting inference throughput on the flagship model.

Metric: lifted output frames/sec/chip through the 243-frame-receptive-field,
1024-channel dilated temporal ConvNet (the reference's headline config,
``/root/reference/README.md:18``).  Baseline (BASELINE.json north star):
1,000,000 frames/sec/chip.

Engine: the w8a8 int8 serving kernels (``ops/pallas/temporal_block_int8.py``)
— the production bulk-serving configuration (per-channel weight quantization +
calibrated activation scales; accuracy vs the f32 path is mm-level, validated
in ``tests/test_int8_serving.py``).  The bf16 fused-Pallas number is tracked
in PARITY.md alongside.

Measurement methodology: the model forward is iterated N times *inside* one jit
graph via ``lax.fori_loop`` with a data dependency between iterations, and the
per-call time is the latency-cancelled difference ``(t(N) - t(1)) / (N - 1)``.
This removes host->device dispatch/round-trip latency (which on tunneled TPU
setups can exceed the compute time itself) from the measurement, leaving pure
device throughput — the number that determines batch-serving capacity.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    # Defaults from the measured shape sweeps (PARITY.md): longer windows
    # amortize the receptive-field overlap (242/33010 = 0.7% waste) and B=4
    # keeps the per-tile working set resident.  Post inter-block-fusion
    # re-sweep: 32768 gains ~0.8% over 16384 (8.98 vs 8.91M); 65536 only
    # ~0.4% more at twice the buffers, and t_tile 768/1024/1536 all lose.
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t-out", type=int, default=32768)
    ap.add_argument("--t-tile", type=int, default=512)
    args = ap.parse_args()
    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, receptive_field)
    from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
        quantize_temporal_model, forward_dilated_int8)

    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
        channels=1024, compute_dtype="bfloat16")
    rf = receptive_field(cfg)

    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.standard_normal((1, rf + 200, 17, 2)), jnp.float32)
    q = quantize_temporal_model(cfg, params, state, calib)

    # Long windows amortize the receptive-field overlap: each input window of T
    # frames yields T - rf + 1 output frames of useful work.
    batch, t_out, t_tile = args.batch, args.t_out, args.t_tile
    t_in = t_out + rf - 1
    frames_per_call = batch * t_out

    @functools.partial(jax.jit, static_argnums=2)
    def infer_n(q, x, n):
        def body(i, carry):
            x_dep, acc = carry
            # w8a8 fused residual-block serving path (int8 MXU, int8 stream).
            pred = forward_dilated_int8(cfg, q, x_dep, t_tile=t_tile)
            # Fold a scalar of the output back into the input: a true data
            # dependency (not compiler-removable) with negligible numerics.
            acc = jnp.sum(pred[0, 0, 0]) * jnp.float32(1e-30)
            return x_dep + acc, acc
        (_, acc) = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    x = jnp.asarray(rng.standard_normal((batch, t_in, 17, 2)), jnp.float32)

    n_iters = 16

    def timed(n, reps=5):
        float(infer_n(q, x, n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(infer_n(q, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tn = timed(n_iters)
    per_call = (tn - t1) / (n_iters - 1)

    frames_per_sec = frames_per_call / per_call
    baseline = 1_000_000.0
    print(json.dumps({
        "metric": "lifted_frames_per_sec_per_chip_rf243",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
