"""Experiment: int8 dilated-tap realignment strategies (real TPU).

The serving kernels' documented ~20% MXU-efficiency tax comes from the
unaligned int8 VMEM slices feeding the dilated taps
(``x[j*dilation : j*dilation + t_tile]`` with dilation 3/9/27/81 against the
(32, 128) int8 tiling).  This tool A/Bs three forms of one mid block at the
flagship shape (B=4, T_out=16384, C=1024, t_tile=512):

  base     — the production kernel (unaligned int8 operand slices).
  control  — same kernel at dilation 32/96 (aligned; same FLOPs) = tax bound.
  psum     — per-tap dots over ALIGNED windows into i32 partials, shift done
             on the i32 accumulator side (sub-32 sublane rotate of 32-bit
             data instead of packed-int8 realignment).

Outputs agree bit-exactly between base and psum (integer adds commute).

CONCLUSIONS (v5e, 2026-08-17, interleaved warm-chip A/Bs): base and psum
measure within noise at every dilation — base 1.75-2.00 ms/call, psum
1.98-2.04 across d=9/27/81; aligned controls 1.74-1.82.  The true
unaligned-slice tax is therefore only ~5-12% of the block (not the ~2.5x a
cold-chip first run suggested: base d=9 read 4.10 ms while the chip was
still slow and psum "won" only by running later).  psum's +32-row tap dots
and int32-side shifts consume the recovered tax.  The production kernels
keep the slice form by default; the psum form ships as the bit-identical
``accshift`` tap mode (``forward_dilated_int8(accshift_min_d=...)``,
``ACCSHIFT_MIN_DILATION`` in temporal_block_int8.py).

Usage: python tools/exp_realign.py [--t-out 16384] [--iters 16]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from videopose3d_tpu.ops.pallas.temporal_block_int8 import (  # noqa: E402
    _i8dot, _mid_block_i8, _quantize_relu, _rowvec, _tile_geometry)


def _psum_kernel(x_hbm, wq_a, a1, b1, wq_b, a2, b2, r, out,
                 x_vmem, sems, *, t_tile, dilation, res_offset, n_taps, win):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    idx = b * n_t + t
    slot = jax.lax.rem(idx, 2)
    next_slot = jax.lax.rem(idx + 1, 2)

    def window_dma(dst_slot, row, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[row, pl.ds(tile_idx * t_tile, win)],
            x_vmem.at[dst_slot], sems.at[dst_slot])

    @pl.when(idx == 0)
    def _():
        window_dma(slot, b, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        window_dma(next_slot, b, t + 1).start()

    @pl.when(jnp.logical_and(t + 1 == n_t, b + 1 < n_b))
    def _():
        window_dma(next_slot, b + 1, 0).start()

    window_dma(slot, b, t).wait()
    x = x_vmem[slot]

    # Aligned per-tap dots (+32 slack rows), shift on the i32 side.
    acc = _i8dot(x[0:t_tile], wq_a[0])
    for j in range(1, n_taps):
        start = (j * dilation) // 32 * 32
        off = j * dilation - start
        p = _i8dot(x[start:start + t_tile + 32], wq_a[j])
        acc += p[off:off + t_tile]
    hq, rowmax = _quantize_relu(acc, a1[0, :], b1[0, :])

    acc2 = _i8dot(hq, wq_b[:, :])
    y = jnp.maximum(
        acc2.astype(jnp.float32) * (rowmax * (1.0 / 127.0)) * a2[0, :]
        + b2[0, :], 0.0)
    # Residual through the same aligned-slice + 32-bit-shift trick.
    rstart = res_offset // 32 * 32
    roff = res_offset - rstart
    res_wide = x[rstart:rstart + t_tile + 32].astype(jnp.float32) * r[0, :]
    res = res_wide[roff:roff + t_tile]
    out[0] = jnp.clip(jnp.round(res + y), 0.0, 127.0).astype(jnp.int8)


def _mid_block_psum(xq, valid, blk, *, dilation, causal_shift, t_tile,
                    interpret):
    n_taps = blk["wq_a"].shape[0]
    b, t_phys, c = xq.shape
    t = valid
    res_offset = (n_taps - 1) * dilation // 2 + causal_shift
    t_out = t - (n_taps - 1) * dilation
    t_tile, n_tiles, t_padded_out, win, _ = _tile_geometry(
        t, t_out, t_tile, (n_taps - 1) * dilation)
    # The aligned per-tap windows need up to 32 slack rows past the base
    # window (start_j + t_tile + 32 <= reach + t_tile + 32).
    win += 32
    t_needed = (n_tiles - 1) * t_tile + win
    if t_phys < t_needed:
        xq = jnp.pad(xq, ((0, 0), (0, t_needed - t_phys), (0, 0)))

    kernel = functools.partial(
        _psum_kernel, t_tile=t_tile, dilation=dilation,
        res_offset=res_offset, n_taps=n_taps, win=win)
    vec = lambda: pl.BlockSpec((1, c), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_padded_out, c), jnp.int8),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_taps, c, c), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(),
            pl.BlockSpec((c, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win, c), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100)),
        interpret=interpret,
    )(xq, blk["wq_a"], _rowvec(blk["A1"]), _rowvec(blk["B1"]), blk["wq_b"],
      _rowvec(blk["A2"]), _rowvec(blk["B2"]), _rowvec(blk["R"]))
    return out, t_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-out", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t-tile", type=int, default=512)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--dilations", default="9,27,81")
    ap.add_argument("--controls", default="32,96")
    ap.add_argument("--check", action="store_true",
                    help="also verify psum == base bit-exactly")
    args = ap.parse_args()

    c = args.channels
    rng = np.random.default_rng(0)
    blk = {
        "wq_a": jnp.asarray(rng.integers(-127, 128, (3, c, c)), jnp.int8),
        "wq_b": jnp.asarray(rng.integers(-127, 128, (c, c)), jnp.int8),
        "A1": jnp.asarray(rng.uniform(1e-5, 2e-5, c), jnp.float32),
        "B1": jnp.asarray(rng.uniform(-0.5, 0.5, c), jnp.float32),
        "A2": jnp.asarray(rng.uniform(1e-5, 2e-5, c), jnp.float32),
        "B2": jnp.asarray(rng.uniform(-0.5, 0.5, c), jnp.float32),
        "R": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
    }

    def bench(fn, valid_t, label):
        @functools.partial(jax.jit, static_argnums=1)
        def run_n(x, n):
            def body(i, carry):
                x_dep, acc = carry
                out, _ = fn(x_dep[:, :valid_t + 0])  # same shape each iter
                s = jnp.sum(out[0, 0, :8].astype(jnp.int32))
                # int8-safe data dependency: xor the low bit into one element.
                x_dep = jax.lax.dynamic_update_slice(
                    x_dep,
                    (x_dep[0:1, 0:1, 0:1] ^ (s & 1).astype(jnp.int8)),
                    (0, 0, 0))
                return x_dep, s
            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.int32(0)))
            return acc

        t_alloc = valid_t  # wrapper pads internally as needed
        x = jnp.asarray(
            rng.integers(0, 128, (args.batch, t_alloc, c)), jnp.int8)

        def timed(n, reps=4):
            int(run_n(x, n))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                int(run_n(x, n))
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = timed(1)
        tn = timed(args.iters)
        per = (tn - t1) / (args.iters - 1)
        print(f"{label}: {per * 1e3:.3f} ms/call", flush=True)
        return per

    results = {}
    for d in [int(v) for v in args.dilations.split(",")]:
        valid_t = args.t_out + 2 * d
        results[f"base_d{d}"] = bench(
            lambda x, d=d: _mid_block_i8(
                x, x.shape[1], blk, dilation=d, causal_shift=0,
                t_tile=args.t_tile, interpret=False),
            valid_t, f"base     d={d:3d}")
        results[f"psum_d{d}"] = bench(
            lambda x, d=d: _mid_block_psum(
                x, x.shape[1], blk, dilation=d, causal_shift=0,
                t_tile=args.t_tile, interpret=False),
            valid_t, f"psum     d={d:3d}")
    for d in [int(v) for v in args.controls.split(",") if v]:
        valid_t = args.t_out + 2 * d
        results[f"ctrl_d{d}"] = bench(
            lambda x, d=d: _mid_block_i8(
                x, x.shape[1], blk, dilation=d, causal_shift=0,
                t_tile=args.t_tile, interpret=False),
            valid_t, f"control  d={d:3d} (aligned)")

    if args.check:
        d = 9
        valid_t = 2048 + 2 * d
        x = jnp.asarray(
            rng.integers(0, 128, (2, valid_t, c)), jnp.int8)
        a, _ = _mid_block_i8(x, valid_t, blk, dilation=d, causal_shift=0,
                             t_tile=args.t_tile, interpret=False)
        b_, tb = _mid_block_psum(x, valid_t, blk, dilation=d, causal_shift=0,
                                 t_tile=args.t_tile, interpret=False)
        a = np.asarray(a)[:, :tb]
        b_ = np.asarray(b_)[:, :tb]
        print("psum == base:", np.array_equal(a, b_),
              "(max |diff|", np.abs(a.astype(np.int32)
                                    - b_.astype(np.int32)).max(), ")")

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
