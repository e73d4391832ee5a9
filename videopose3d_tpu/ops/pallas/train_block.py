"""Pallas TPU kernels: fused strided residual block for TRAINING (custom VJP).

The training hot path (``/root/reference/common/model.py:140-197`` semantics —
the strided TemporalModelOptimized1f block) is

    u = taps @ Wa                 # strided conv; taps row j = frames j*fw..+fw
    d = mask_a * relu(bn_a(u))    # train-mode BN (batch stats) + dropout
    v = d @ Wb                    # 1x1 conv
    e = mask_b * relu(bn_b(v))
    out = (center tap of x) + e   # residual

XLA's autodiff of this chain is correct but leaves ~40% of the step in
elementwise/reduction passes and layout copies.  These kernels fuse:

* forward: BatchNorm batch statistics accumulate in the conv matmuls'
  epilogues (no separate reduction pass over the activations); the
  normalize+ReLU+dropout chains fuse into the consuming matmul.
* backward: the ReLU/dropout/BN-affine chain, the BN reduction terms
  (d_scale / d_bias / the batch-stat sums), the ``dv @ Wb^T`` /
  ``du @ Wa^T`` matmuls, the ``dWb`` accumulation, and the residual-cotangent
  injection (which XLA lowers to a scatter-add plus full-tensor layout
  copies) all run in VMEM.

Layout discipline: the block input is consumed as a free ``(N, fw, C)`` view
of ``(B, T, C)`` and every kernel reads/writes per-tap ``(tile, C)`` slices of
3-D blocks — no host-visible reshape of activations ever materializes (an
``(N, fw*C)`` taps matrix fed to a pallas_call costs ~0.5 ms per block in
relayout copies at B=1024/C=1024).

Dropout masks are *explicit inputs* (pre-scaled 0 / 1/keep, produced by the
same ``jax.random.bits`` stream as the XLA path), so values and gradients are
directly comparable against the unfused form — verified in
``tests/test_train_block.py``.

The batch-statistics barrier (finalizing mean/var between the two convs) and
the weight-gradient contraction ``taps^T @ du`` stay in XLA: the former is
O(C) math, the latter a plain large matmul XLA already runs at peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videopose3d_tpu.models.temporal import BN_EPS


def _pick_tile(n: int, dtype, cap: int = 256) -> int:
    """Largest row tile <= cap that divides n and respects sublane tiling."""
    min_tile = 16 if dtype == jnp.bfloat16 else 8
    t = cap
    while t >= min_tile:
        if n % t == 0:
            return t
        t //= 2
    return 0  # caller falls back to the XLA path


def _row_block(tile, c):
    return pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _tap_block(tile, fw, c):
    return pl.BlockSpec((tile, fw, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_block(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


_VMEM_CAP = pltpu.CompilerParams(vmem_limit_bytes=int(1024 * 1024 * 100))


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------


def _conv_stats_kernel(x_ref, w_ref, shift_ref, out_ref, res_ref, s1_ref,
                       s2_ref, acc1, acc2, *, fw, center):
    """u = sum_j x[:, j, :] @ w[j]; accumulate per-channel sum / sum-sq of the
    *cast* values (matching the XLA path, whose batch statistics are computed
    from the compute-dtype activations).  Also copies out the residual (the
    center tap) so the block-output kernel reads a contiguous (N, C) array —
    the tap block is already resident here, so this costs one write instead
    of a strided gather later."""
    i = pl.program_id(0)
    res_ref[:, :] = x_ref[:, center, :]
    acc = jnp.dot(x_ref[:, 0, :], w_ref[0],
                  preferred_element_type=jnp.float32)
    for j in range(1, fw):
        acc += jnp.dot(x_ref[:, j, :], w_ref[j],
                       preferred_element_type=jnp.float32)
    y = acc.astype(out_ref.dtype)
    out_ref[:, :] = y

    # Shifted one-pass statistics (see models.temporal._batchnorm): center on
    # the running mean so E[x^2]-E[x]^2 cancellation happens near zero.
    yf = y.astype(jnp.float32) - shift_ref[0, :]

    @pl.when(i == 0)
    def _():
        acc1[:, :] = jnp.zeros_like(acc1)
        acc2[:, :] = jnp.zeros_like(acc2)

    acc1[:, :] += jnp.sum(yf, axis=0, keepdims=True)
    acc2[:, :] += jnp.sum(yf * yf, axis=0, keepdims=True)
    s1_ref[:, :] = acc1[:, :]
    s2_ref[:, :] = acc2[:, :]


def _norm_drop_matmul_stats_kernel(u_ref, mask_ref, mean_ref, inv_ref, b_ref,
                                   w_ref, shift_ref, d_ref, v_ref, s1_ref,
                                   s2_ref, acc1, acc2):
    """d = mask * relu((u - mean) * inv + b); v = d @ w (+ stats of v)."""
    i = pl.program_id(0)
    u = u_ref[:, :]
    y = (u - mean_ref[0, :]) * inv_ref[0, :] + b_ref[0, :]
    d = jnp.maximum(y, 0).astype(u.dtype) * mask_ref[:, :]
    d_ref[:, :] = d
    v = jnp.dot(d, w_ref[:, :], preferred_element_type=jnp.float32)
    v = v.astype(v_ref.dtype)
    v_ref[:, :] = v

    vf = v.astype(jnp.float32) - shift_ref[0, :]

    @pl.when(i == 0)
    def _():
        acc1[:, :] = jnp.zeros_like(acc1)
        acc2[:, :] = jnp.zeros_like(acc2)

    acc1[:, :] += jnp.sum(vf, axis=0, keepdims=True)
    acc2[:, :] += jnp.sum(vf * vf, axis=0, keepdims=True)
    s1_ref[:, :] = acc1[:, :]
    s2_ref[:, :] = acc2[:, :]


def _norm_drop_res_kernel(v_ref, mask_ref, mean_ref, inv_ref, b_ref, res_ref,
                          out_ref):
    """out = res + mask * relu((v - mean) * inv + b)."""
    v = v_ref[:, :]
    y = (v - mean_ref[0, :]) * inv_ref[0, :] + b_ref[0, :]
    e = jnp.maximum(y, 0).astype(v.dtype) * mask_ref[:, :]
    out_ref[:, :] = res_ref[:, :] + e


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _relu_mask_bn_sums_kernel(g_ref, z_ref, mask_ref, mean_ref, inv_ref,
                              gate_ref, gz_ref, s1_ref, s2_ref, acc1, acc2):
    """gz = g * mask * [bn_affine(z) > 0]; accumulate S1 = sum(gz) (= d_bias)
    and S2 = sum(gz * zhat) (= d_scale), zhat = (z - mean) * inv_raw.

    gate_ref rows (COMPUTE dtype): [mean_c, inv_c, bias_c] — the gate affine
    must replay the forward kernels' compute-dtype arithmetic bit-exactly,
    or bf16 pre-activations that round across 0 would open/close different
    ReLU gates in forward and backward.  mean_ref/inv_ref stay f32 for the
    d_scale statistic."""
    i = pl.program_id(0)
    zd = z_ref[:, :]
    yg = (zd - gate_ref[0, :]) * gate_ref[1, :] + gate_ref[2, :]
    # Compare in f32: bf16->f32 upcast is exact, so the gate is bit-identical
    # to a bf16 compare — and current Mosaic rejects arith.cmpf on packed
    # bf16 vectors ("Target does not support this comparison", caught by
    # tools/recheck_floors.py round 5; the kernel compiled in round 2).
    keep = (yg.astype(jnp.float32) > 0).astype(jnp.float32)
    gz = (g_ref[:, :].astype(jnp.float32)
          * mask_ref[:, :].astype(jnp.float32) * keep)
    gz_ref[:, :] = gz.astype(gz_ref.dtype)

    zhat = (zd.astype(jnp.float32) - mean_ref[0, :]) * inv_ref[0, :]

    @pl.when(i == 0)
    def _():
        acc1[:, :] = jnp.zeros_like(acc1)
        acc2[:, :] = jnp.zeros_like(acc2)

    acc1[:, :] += jnp.sum(gz, axis=0, keepdims=True)
    acc2[:, :] += jnp.sum(gz * zhat, axis=0, keepdims=True)
    s1_ref[:, :] = acc1[:, :]
    s2_ref[:, :] = acc2[:, :]


def _dz_matmul_dw_kernel(gz_ref, z_ref, d_ref, coef_ref, mean_ref, w_ref,
                         dd_ref, dw_ref, dwacc):
    """Fused BN-input gradient + both adjacent matmuls of the 1x1 conv:

        dz = invs * (gz - c1 - zhat * c2)       # bn backward, scale folded
        dw += d^T @ dz                           # weight-grad accumulation
        dd = dz @ w^T                            # producer's input grad

    coef_ref rows: [inv*scale, c1, c2, inv]."""
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    z = z_ref[:, :].astype(jnp.float32)
    zhat = (z - mean_ref[0, :]) * coef_ref[3, :]
    gz = gz_ref[:, :].astype(jnp.float32)
    dz = coef_ref[0, :] * (gz - coef_ref[1, :] - zhat * coef_ref[2, :])
    dz_c = dz.astype(dd_ref.dtype)

    @pl.when(i == 0)
    def _():
        dwacc[:, :] = jnp.zeros_like(dwacc)

    dwacc[:, :] += jax.lax.dot_general(
        d_ref[:, :], dz_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dd_ref[:, :] = jax.lax.dot_general(
        dz_c, w_ref[:, :], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dd_ref.dtype)

    @pl.when(i == n_i - 1)
    def _():
        dw_ref[:, :] = dwacc[:, :]


def _du_dtaps_res_kernel(ga_ref, u_ref, g_ref, coef_ref, mean_ref, w_ref,
                         du_ref, dx_ref, *, fw, center):
    """du = invs * (ga - c1 - uhat * c2); per-tap dx[:, j, :] = du @ Wa[j]^T,
    with the residual cotangent g added into the center tap — replacing XLA's
    scatter-add + layout copies."""
    u = u_ref[:, :].astype(jnp.float32)
    uhat = (u - mean_ref[0, :]) * coef_ref[3, :]
    ga = ga_ref[:, :].astype(jnp.float32)
    du = coef_ref[0, :] * (ga - coef_ref[1, :] - uhat * coef_ref[2, :])
    du_c = du.astype(du_ref.dtype)
    du_ref[:, :] = du_c

    for j in range(fw):
        dxj = jax.lax.dot_general(
            du_c, w_ref[j], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        if j == center:
            dxj = dxj + g_ref[:, :]
        dx_ref[:, j, :] = dxj


# ---------------------------------------------------------------------------
# XLA glue
# ---------------------------------------------------------------------------


def _finalize_stats(s1, s2, n, shift):
    m1 = s1 / n
    mean = shift + m1
    var = jnp.maximum(s2 / n - m1 * m1, 0.0)  # biased, shifted one-pass
    return mean, var


def _affine_consts(mean, var, scale, bias, dtype):
    """Cast-folded constants matching models.temporal._batchnorm's
    compute-dtype elementwise arithmetic: y = (x - mean_c) * inv_c + bias_c."""
    inv = jax.lax.rsqrt(var + BN_EPS) * scale
    return (mean.astype(dtype).reshape(1, -1),
            inv.astype(dtype).reshape(1, -1),
            bias.astype(dtype).reshape(1, -1))


def _bwd_consts(mean, var, scale, s1, s2, n):
    """(4, C) f32 rows [inv*scale, c1, c2, inv] + (1, C) mean."""
    inv = jax.lax.rsqrt(var + BN_EPS)
    return (jnp.stack([inv * scale, s1 / n, s2 / n, inv], axis=0),
            mean.reshape(1, -1))


# ---------------------------------------------------------------------------
# The custom-VJP block
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_train_block(center: int, fw: int, interpret: bool,
                      x, wa, wb, sa, ba, sb, bb, mask_a, mask_b,
                      shift_a, shift_b):
    """One strided residual block, training mode, fused.

    Args:
      center: residual tap index (causal_shift + fw//2).
      x: (B, T, C) input, T divisible by fw (compute dtype).
      wa: (fw, C, C), wb: (C, C) conv weights (compute dtype).
      sa/ba/sb/bb: (C,) f32 BatchNorm scale/bias.
      mask_a/mask_b: (B, T/fw, C) pre-scaled dropout masks (0 or 1/keep) in
        the compute dtype.
      shift_a/shift_b: (C,) f32 centering points for the one-pass batch
        statistics (pass the BN running means; stop-gradient).

    Returns:
      (out (B, T/fw, C), mean_a, var_a, mean_b, var_b) — biased batch stats
      for the running update outside.  The stats outputs are stop-gradient
      (running statistics carry no gradient).
    """
    primal, _ = _block_fwd(center, fw, interpret, x, wa, wb, sa, ba, sb, bb,
                           mask_a, mask_b, shift_a, shift_b)
    return primal


def _block_fwd(center, fw, interpret, x, wa, wb, sa, ba, sb, bb,
               mask_a, mask_b, shift_a, shift_b):
    b, t, c = x.shape
    n = b * (t // fw)
    x3 = x.reshape(n, fw, c)  # free view: row j = frames j*fw .. j*fw+fw-1
    ma = mask_a.reshape(n, c)
    mb = mask_b.reshape(n, c)
    dtype = x.dtype
    tile = _pick_tile(n, dtype)
    assert tile, (n, dtype)

    u, res, s1a, s2a = pl.pallas_call(
        functools.partial(_conv_stats_kernel, fw=fw, center=center),
        out_shape=(jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=(n // tile,),
        in_specs=[_tap_block(tile, fw, c), _const_block(wa.shape),
                  _const_block((1, c))],
        out_specs=(_row_block(tile, c), _row_block(tile, c),
                   _const_block((1, c)), _const_block((1, c))),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        compiler_params=_VMEM_CAP,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * fw * c * c,
            bytes_accessed=(x3.size + wa.size + n * c) * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x3, wa, shift_a.astype(jnp.float32).reshape(1, -1))
    s1a, s2a = s1a[0], s2a[0]
    mean_a, var_a = _finalize_stats(s1a, s2a, n, shift_a)
    mean_ac, inv_ac, bias_ac = _affine_consts(mean_a, var_a, sa, ba, dtype)

    d, v, s1b, s2b = pl.pallas_call(
        _norm_drop_matmul_stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=(n // tile,),
        in_specs=[_row_block(tile, c), _row_block(tile, c),
                  _const_block((1, c)), _const_block((1, c)),
                  _const_block((1, c)), _const_block((c, c)),
                  _const_block((1, c))],
        out_specs=(_row_block(tile, c), _row_block(tile, c),
                   _const_block((1, c)), _const_block((1, c))),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        compiler_params=_VMEM_CAP,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c,
            bytes_accessed=4 * n * c * x3.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(u, ma, mean_ac, inv_ac, bias_ac, wb,
      shift_b.astype(jnp.float32).reshape(1, -1))
    s1b, s2b = s1b[0], s2b[0]
    mean_b, var_b = _finalize_stats(s1b, s2b, n, shift_b)
    mean_bc, inv_bc, bias_bc = _affine_consts(mean_b, var_b, sb, bb, dtype)

    out = pl.pallas_call(
        _norm_drop_res_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), dtype),
        grid=(n // tile,),
        in_specs=[_row_block(tile, c), _row_block(tile, c),
                  _const_block((1, c)), _const_block((1, c)),
                  _const_block((1, c)), _row_block(tile, c)],
        out_specs=_row_block(tile, c),
        compiler_params=_VMEM_CAP,
        interpret=interpret,
    )(v, mb, mean_bc, inv_bc, bias_bc, res)
    out = out.reshape(b, t // fw, c)

    primal = (out, mean_a, var_a, mean_b, var_b)
    residuals = (x, wa, wb, sa, ba, sb, bb, mask_a, mask_b, u, d, v,
                 (mean_a, var_a), (mean_b, var_b))
    return primal, residuals


def _relu_mask_bn_sums(g, z, mask, mean, var, scale, bias, *, interpret):
    """B1/B3 kernel driver: returns (gz, S1, S2) = (masked relu'd cotangent,
    d_bias, d_scale)."""
    n, c = g.shape
    dtype = g.dtype
    inv_raw = jax.lax.rsqrt(var + BN_EPS).astype(jnp.float32).reshape(1, -1)
    mean_r = mean.astype(jnp.float32).reshape(1, -1)
    # Gate constants rounded exactly as the forward kernels received them.
    mean_c, inv_c, bias_c = _affine_consts(mean, var, scale, bias, dtype)
    gate = jnp.concatenate([mean_c, inv_c, bias_c], axis=0)
    tile = _pick_tile(n, dtype)
    gz, s1, s2 = pl.pallas_call(
        _relu_mask_bn_sums_kernel,
        out_shape=(jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=(n // tile,),
        in_specs=[_row_block(tile, c), _row_block(tile, c),
                  _row_block(tile, c), _const_block((1, c)),
                  _const_block((1, c)), _const_block((3, c))],
        out_specs=(_row_block(tile, c), _const_block((1, c)),
                   _const_block((1, c))),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        compiler_params=_VMEM_CAP,
        interpret=interpret,
    )(g, z, mask, mean_r, inv_raw, gate)
    return gz, s1[0], s2[0]


def _block_bwd(center, fw, interpret, residuals, cotangents):
    (x, wa, wb, sa, ba, sb, bb, mask_a, mask_b, u, d, v,
     (mean_a, var_a), (mean_b, var_b)) = residuals
    g = cotangents[0]  # stats outputs are stop-gradient (running-stat path)
    b, t, c = x.shape
    n = b * (t // fw)
    dtype = x.dtype
    x3 = x.reshape(n, fw, c)
    g2 = g.reshape(n, c).astype(dtype)
    ma = mask_a.reshape(n, c)
    mb = mask_b.reshape(n, c)
    tile = _pick_tile(n, dtype)

    # ---- BN_b / ReLU / dropout chain + its reductions ----
    gz, dbb, dsb = _relu_mask_bn_sums(g2, v, mb, mean_b, var_b, sb, bb,
                                      interpret=interpret)
    coefs_b, mean_b_r = _bwd_consts(mean_b, var_b, sb, dbb, dsb, n)

    dd, dwb = pl.pallas_call(
        _dz_matmul_dw_kernel,
        out_shape=(jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((c, c), jnp.float32)),
        grid=(n // tile,),
        in_specs=[_row_block(tile, c), _row_block(tile, c),
                  _row_block(tile, c), _const_block((4, c)),
                  _const_block((1, c)), _const_block((c, c))],
        out_specs=(_row_block(tile, c), _const_block((c, c))),
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        compiler_params=_VMEM_CAP,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * c,
            bytes_accessed=5 * n * c * dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(gz, v, d, coefs_b, mean_b_r, wb)

    # ---- BN_a / ReLU / dropout chain + its reductions ----
    ga, dba, dsa = _relu_mask_bn_sums(dd, u, ma, mean_a, var_a, sa, ba,
                                      interpret=interpret)
    coefs_a, mean_a_r = _bwd_consts(mean_a, var_a, sa, dba, dsa, n)

    du, dx3 = pl.pallas_call(
        functools.partial(_du_dtaps_res_kernel, fw=fw, center=center),
        out_shape=(jax.ShapeDtypeStruct((n, c), dtype),
                   jax.ShapeDtypeStruct((n, fw, c), dtype)),
        grid=(n // tile,),
        in_specs=[_row_block(tile, c), _row_block(tile, c),
                  _row_block(tile, c), _const_block((4, c)),
                  _const_block((1, c)), _const_block(wa.shape)],
        out_specs=(_row_block(tile, c), _tap_block(tile, fw, c)),
        compiler_params=_VMEM_CAP,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * fw * c * c,
            bytes_accessed=(2 + fw) * n * c * dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(ga, u, g2, coefs_a, mean_a_r, wa)

    # Weight-gradient contraction over the batch: one large matmul, XLA's
    # bread and butter.  (N, fw, C) x (N, C) -> (fw, C, C).
    dwa = jax.lax.dot_general(
        x3, du, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dx = dx3.reshape(b, t, c)
    return (dx, dwa.astype(wa.dtype), dwb.astype(wb.dtype),
            dsa.astype(sa.dtype), dba.astype(ba.dtype),
            dsb.astype(sb.dtype), dbb.astype(bb.dtype),
            jnp.zeros_like(mask_a), jnp.zeros_like(mask_b),
            # stats-shift inputs are stop-gradient (running-mean centering)
            jnp.zeros_like(sa), jnp.zeros_like(sa))


fused_train_block.defvjp(_block_fwd, _block_bwd)
