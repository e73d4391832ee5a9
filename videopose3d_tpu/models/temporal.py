"""Dilated temporal convolution model for 2D->3D pose lifting, TPU-native.

Capability parity target: ``/root/reference/common/model.py`` —
``TemporalModelBase`` (:10-77), ``TemporalModel`` (:79-138, the dilated/eval form)
and ``TemporalModelOptimized1f`` (:140-197, the strided/train form).  The two forms
are **weight-interchangeable**: one parameter pytree serves both, exactly as the
reference documents at ``model.py:146-148``.

TPU-first design
----------------
The reference runs cuDNN ``nn.Conv1d``.  Here every temporal convolution is lowered
explicitly to MXU matmuls:

* A width-``k`` conv with dilation ``d`` over channels-last ``(B, T, C)`` is ``k``
  statically-shifted slices concatenated on the feature axis, followed by one
  ``(B*T_out, k*C) @ (k*C, C_out)`` matmul — XLA tiles this straight onto the
  128x128 systolic array, and fuses the BatchNorm/ReLU/residual element-wise tail
  into the matmul epilogue.
* The strided training form (input length = receptive field, output length = chunk)
  is pure ``reshape`` + matmul: ``(B, T, C) -> (B, T/k, k*C)`` — zero wasted FLOPs,
  the TPU equivalent of the reference's strided-conv trick.

Everything is a pure function over explicit pytrees:

* ``params``: convolution weights (layout ``(k, C_in, C_out)``) + shrink bias +
  BatchNorm affine terms.  Trainable.
* ``state``: BatchNorm running statistics.  Mutated functionally (returned).

BatchNorm reproduces PyTorch ``nn.BatchNorm1d`` semantics bit-for-bit (biased batch
variance for normalization, *unbiased* variance folded into the running estimate,
``running = (1-m)*running + m*batch``), with ``momentum`` supplied at call time so
the reference's per-epoch exponential momentum decay (``run.py:589-593``) is a plain
scalar argument — no graph retracing.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
State = Dict[str, Any]

BN_EPS = 1e-5  # PyTorch BatchNorm1d default


@dataclasses.dataclass(frozen=True)
class TemporalModelConfig:
    """Static architecture hyperparameters (CLI surface parity:
    ``/root/reference/common/arguments.py:35-55``)."""

    num_joints_in: int
    in_features: int
    num_joints_out: int
    filter_widths: Tuple[int, ...]
    causal: bool = False
    dropout: float = 0.25
    channels: int = 1024
    dense: bool = False
    # TPU knob (no reference equivalent): MXU / activation precision.
    #   "float32"  — reference numerics (run.py:200-202 trains f32 throughout).
    #   "bfloat16" — bf16 MXU operands AND bf16 stored activations (BN
    #                normalize, residual adds, dropout in bf16); params, BN
    #                statistics, matmul accumulation, output, loss, optimizer
    #                all stay f32.  Fastest; measured ~+1.8% relative eval
    #                degradation on the paired-seed harness
    #                (tests/test_bf16_parity.py).
    #   "mixed"    — bf16 MXU operand casts ONLY; every activation, BN
    #                normalize, residual add, and dropout mask stays f32.
    #                MXU speed on the matmuls with f32 elementwise numerics.
    compute_dtype: str = "float32"
    # TPU knob: rematerialize residual blocks in the backward pass (saves the
    # HBM traffic of stored intermediates at the cost of one extra forward
    # matmul per block).  Bit-identical gradients.
    remat_blocks: bool = False
    # TPU knob: rematerialization policy for the strided train form.
    #   "none"  — store every intermediate (XLA default autodiff).
    #   "dots"  — save matmul outputs only; recompute the elementwise chains
    #             (BN normalize, ReLU, dropout masks) in the backward pass.
    #             Cuts the saved-activation HBM traffic at ~zero FLOP cost
    #             (the recompute is elementwise, fused into the backward).
    #   "full"  — save block inputs only (max memory saving, recomputes the
    #             matmuls; same as remat_blocks=True).
    remat_policy: str = "none"
    # TPU knob: engine for the strided TRAIN blocks.  "pallas" runs each
    # residual block through the fused custom-VJP kernels
    # (ops/pallas/train_block.py): BN statistics accumulate in the conv
    # matmul epilogues and the backward elementwise/reduction chains +
    # residual-cotangent injection fuse in VMEM.  Same math, same dropout
    # mask stream as "xla" (gradient-parity tested).
    train_engine: str = "xla"

    def __post_init__(self):
        object.__setattr__(self, "filter_widths", tuple(int(f) for f in self.filter_widths))
        for fw in self.filter_widths:
            if fw % 2 == 0:
                raise ValueError("Only odd filter widths are supported")
        if not 0.0 <= self.dropout <= 1.0:
            raise ValueError(f"dropout must be in [0, 1], got {self.dropout}")
        if self.compute_dtype != "mixed":
            jnp.dtype(self.compute_dtype)  # raises on unknown names

    # --- precision scheme (see compute_dtype docs above) ---

    @property
    def matmul_dtype(self):
        """dtype the MXU matmul *operands* are cast to."""
        return (jnp.dtype(jnp.bfloat16) if self.compute_dtype == "mixed"
                else jnp.dtype(self.compute_dtype))

    @property
    def activation_dtype(self):
        """dtype activations are stored/processed in between matmuls."""
        return (jnp.dtype(jnp.float32) if self.compute_dtype == "mixed"
                else jnp.dtype(self.compute_dtype))

    # --- derived static geometry (parity: model.py:31, :107-121) ---

    @property
    def dilations(self) -> Tuple[int, ...]:
        """dilations[i] = product of filter widths before block i."""
        d = [1]
        for fw in self.filter_widths[:-1]:
            d.append(d[-1] * fw)
        return tuple(d)

    @property
    def pads(self) -> Tuple[int, ...]:
        fws, dils = self.filter_widths, self.dilations
        return tuple((fw - 1) * d // 2 for fw, d in zip(fws, dils))

    @property
    def causal_shifts_dilated(self) -> Tuple[int, ...]:
        """Per-block asymmetric shift in *input frames* (dilated form)."""
        if not self.causal:
            return tuple(0 for _ in self.filter_widths)
        fws, dils = self.filter_widths, self.dilations
        return tuple((fw // 2) * d for fw, d in zip(fws, dils))

    @property
    def causal_shifts_strided(self) -> Tuple[int, ...]:
        """Per-block shift in *post-stride frames* (strided form)."""
        if not self.causal:
            return tuple(0 for _ in self.filter_widths)
        return tuple(fw // 2 for fw in self.filter_widths)


def receptive_field(config: TemporalModelConfig) -> int:
    """Total receptive field in frames: ``1 + 2*sum(pads)``
    (parity: ``model.py:41-48``)."""
    return 1 + 2 * sum(config.pads)


def total_causal_shift(config: TemporalModelConfig, form: str = "dilated") -> int:
    """Asymmetric padding offset for causal mode (parity: ``model.py:50-61``).

    Note the reference computes this from ``self.causal_shift``, whose entries
    already include the dilation factor in the dilated class but not in the strided
    class — so the two classes return different values (e.g. 91 vs 13 for causal
    ``3,3,3``).  ``run.py`` never calls it (it uses ``causal_shift = pad``,
    ``run.py:189-193``); we mirror both behaviours for checkable parity.
    """
    shifts = (config.causal_shifts_dilated if form == "dilated"
              else config.causal_shifts_strided)
    frames = shifts[0]
    next_dilation = config.filter_widths[0]
    for i in range(1, len(config.filter_widths)):
        frames += shifts[i] * next_dilation
        next_dilation *= config.filter_widths[i]
    return frames


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _conv_init(rng, k: int, c_in: int, c_out: int, bias: bool = False):
    """PyTorch Conv1d default init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
    so that training dynamics match the reference.  Weight layout: (k, C_in, C_out)."""
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    w_key, b_key = jax.random.split(rng)
    out = {"weight": jax.random.uniform(
        w_key, (k, c_in, c_out), jnp.float32, minval=-bound, maxval=bound)}
    if bias:
        out["bias"] = jax.random.uniform(
            b_key, (c_out,), jnp.float32, minval=-bound, maxval=bound)
    return out


def _bn_init(channels: int):
    params = {"scale": jnp.ones((channels,), jnp.float32),
              "bias": jnp.zeros((channels,), jnp.float32)}
    state = {"mean": jnp.zeros((channels,), jnp.float32),
             "var": jnp.ones((channels,), jnp.float32)}
    return params, state


def init_temporal_model(config: TemporalModelConfig, rng) -> Tuple[Params, State]:
    """Create the (params, state) pytrees.

    Layer inventory (parity: ``model.py:102-124``): ``expand_conv`` (width fw[0]),
    then per block ``i`` in 1..n-1 a dilated/strided conv of width fw[i] and a 1x1
    conv, each followed by BatchNorm; finally the 1x1 ``shrink`` projection to
    ``num_joints_out*3`` (the only biased conv).
    """
    c = config.channels
    n_in = config.num_joints_in * config.in_features
    keys = jax.random.split(rng, 2 * len(config.filter_widths) + 2)

    params: Params = {}
    state: State = {}

    params["expand_conv"] = _conv_init(keys[0], config.filter_widths[0], n_in, c)
    params["expand_bn"], state["expand_bn"] = _bn_init(c)

    layers_conv: List[Params] = []
    layers_bn_p: List[Params] = []
    layers_bn_s: List[State] = []
    for i in range(1, len(config.filter_widths)):
        if config.dense:
            width = 2 * config.pads[i] + 1
        else:
            width = config.filter_widths[i]
        layers_conv.append(_conv_init(keys[2 * i], width, c, c))
        bn_p, bn_s = _bn_init(c)
        layers_bn_p.append(bn_p)
        layers_bn_s.append(bn_s)
        layers_conv.append(_conv_init(keys[2 * i + 1], 1, c, c))
        bn_p, bn_s = _bn_init(c)
        layers_bn_p.append(bn_p)
        layers_bn_s.append(bn_s)

    params["layers_conv"] = layers_conv
    params["layers_bn"] = layers_bn_p
    state["layers_bn"] = layers_bn_s

    params["shrink"] = _conv_init(
        keys[-1], 1, c, config.num_joints_out * 3, bias=True)
    return params, state


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _batchnorm(x, bn_params, bn_state, *, train: bool, momentum):
    """PyTorch-semantics BatchNorm over (B, T, C), normalizing per channel.

    Returns (y, new_bn_state).  Statistics are always accumulated in float32.
    """
    if train:
        xf = x.astype(jnp.float32)
        n = xf.shape[0] * xf.shape[1]
        # Shifted one-pass statistics: a single read of the activation tensor
        # (the train step is HBM-bandwidth-bound on these elementwise passes),
        # but centered on the running mean so the E[x^2] - E[x]^2 cancellation
        # happens near zero regardless of the activation offset — var(x - c) =
        # var(x) for any constant c, and the running mean tracks the batch
        # mean, making this as accurate as two-pass in practice (stress-tested
        # vs torch at offset-30-sigma activations in tests/test_model.py).
        shift = bn_state["mean"]
        centered = xf - shift
        m1 = jnp.mean(centered, axis=(0, 1))
        m2 = jnp.mean(jnp.square(centered), axis=(0, 1))
        mean = shift + m1
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)  # biased
        unbiased = var * (n / max(n - 1, 1))
        # Running statistics are updated under no-grad in torch (and the
        # fused pallas train engine's stats outputs are likewise
        # non-differentiable); stop_gradient makes the XLA engine agree —
        # only the *normalization* below differentiates through batch stats.
        new_state = {
            "mean": jax.lax.stop_gradient(
                (1.0 - momentum) * bn_state["mean"] + momentum * mean),
            "var": jax.lax.stop_gradient(
                (1.0 - momentum) * bn_state["var"] + momentum * unbiased),
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state

    inv = jax.lax.rsqrt(var + BN_EPS) * bn_params["scale"]
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bn_params["bias"].astype(x.dtype)
    return y, new_state


# A/B escape hatch for the transposed mask draw in _dropout ("tcb" = draw
# (T, C, B) and bitcast-transpose; "btc" = draw the activation shape as-is).
# Read at TRACE time and not part of any jit cache key: it must be set in the
# environment before the first trace of a model function (tools that flip it
# in-process must do so before compiling anything, as tools/exp_dropout_order
# does).  Mutating it later silently leaves cached traces on the old order.
_DROPOUT_DRAW_ORDER = os.environ.get("VP3D_DROPOUT_DRAW_ORDER", "tcb")
if _DROPOUT_DRAW_ORDER not in ("tcb", "btc"):
    raise ValueError(
        f"VP3D_DROPOUT_DRAW_ORDER={_DROPOUT_DRAW_ORDER!r}: must be 'tcb' or 'btc'")


def _dropout_mask(rate: float, rng, shape, dtype):
    """Pre-scaled inverted-dropout mask (values 0 or 1/keep) from narrow
    random draws.

    ``jax.random.bernoulli`` spends a uint32 per element — at B=1024 that is
    ~600 MB/step of random bits written and re-read.  When the keep
    probability is exactly representable as k/256 (true for the reference
    default rate 0.25 -> keep 192/256) one byte per element quarters that
    traffic; any other rate uses 16-bit draws (probability exact to 1/65536,
    half the bernoulli traffic).  The inverse-keep scale uses the realized
    probability so the expectation stays exactly 1.

    Returns None when dropout is inactive.
    """
    if rate == 0.0 or rng is None:
        return None
    if rate >= 1.0:
        # torch parity: nn.Dropout(p=1.0) zeroes the whole tensor.
        return jnp.zeros(shape, dtype)
    keep_exact = 1.0 - rate
    t8 = round(keep_exact * 256)
    if abs(keep_exact * 256 - t8) < 1e-9 and 0 < t8 < 256:
        threshold, denom, bits_dtype = int(t8), 256.0, jnp.uint8
    else:
        threshold = min(max(int(round(keep_exact * 65536)), 1), 65535)
        denom, bits_dtype = 65536.0, jnp.uint16
    keep = threshold / denom
    bits = jax.random.bits(rng, shape, dtype=bits_dtype)
    mask = bits < jnp.asarray(threshold, bits_dtype)
    return mask.astype(dtype) * (1.0 / keep)


def _dropout_mask_btc(rate: float, rng, shape, dtype):
    """Rank-3 ``(B, T, C)`` dropout mask, drawn in ``(T, C, B)`` order and
    transposed back.  XLA lays the activations out batch-minor (physical
    ``[T][C][B]``, lanes = batch), while ``rng-bit-generator`` emits its
    default major-to-minor layout — drawing ``(B, T, C)`` directly forces a
    full relayout copy of the mask per layer (measured 232 us/step for the
    expand layer alone at B=1024/C=1024).  Drawing the transposed shape makes
    the transpose a pure bitcast.  Mask bits are IID so any axis order is an
    equally valid dropout mask (this only permutes which PRNG draw lands on
    which element).  Shared by the XLA block path and the fused Pallas train
    block so both consume the identical mask stream."""
    if len(shape) == 3 and _DROPOUT_DRAW_ORDER == "tcb":
        b, t, c = shape
        mask = _dropout_mask(rate, rng, (t, c, b), dtype)
        return None if mask is None else mask.transpose(2, 0, 1)
    return _dropout_mask(rate, rng, shape, dtype)


def _dropout(x, rate: float, rng):
    mask = _dropout_mask_btc(rate, rng, x.shape, x.dtype)
    return x if mask is None else x * mask


def _conv_matmul(x, weight, dilation: int = 1, compute_dtype=jnp.float32,
                 out_dtype=None):
    """Valid temporal conv as one MXU matmul over stacked shifted slices.

    x: (B, T, C_in); weight: (k, C_in, C_out).
    Output: (B, T - (k-1)*dilation, C_out).
    ``compute_dtype`` is the MXU operand dtype; ``out_dtype`` (default: the
    same) the dtype the f32-accumulated result is cast back to — the "mixed"
    scheme passes bf16 operands / f32 out.
    """
    k = weight.shape[0]
    t_out = x.shape[1] - (k - 1) * dilation
    if k == 1:
        taps = x
    else:
        taps = jnp.concatenate(
            [x[:, j * dilation: j * dilation + t_out] for j in range(k)], axis=-1
        )
    w = weight.reshape(k * weight.shape[1], weight.shape[2])
    # bf16 operands, f32 accumulation (MXU-native); cast back to out dtype.
    return jnp.dot(
        taps.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype or compute_dtype)


def _conv_strided(x, weight, compute_dtype=jnp.float32, out_dtype=None):
    """Stride == width conv as reshape + matmul (zero-waste training form).

    x: (B, T, C_in) with T divisible by k; weight: (k, C_in, C_out).
    Output: (B, T/k, C_out).  Dtypes as in :func:`_conv_matmul`.
    """
    k = weight.shape[0]
    b, t, c_in = x.shape
    assert t % k == 0, f"sequence length {t} not divisible by stride {k}"
    taps = x.reshape(b, t // k, k * c_in)
    w = weight.reshape(k * c_in, weight.shape[2])
    return jnp.dot(
        taps.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype or compute_dtype)


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _prep_input(config: TemporalModelConfig, x):
    if x.ndim == 3:
        # Pre-flattened (B, T, J*F) input: the caller already merged the
        # joint/feature axes (e.g. a gather over a (rows, J*F)-stored flat
        # dataset, which XLA tiles better than minor-dim-2 (rows, J, 2)).
        assert x.shape[-1] == config.num_joints_in * config.in_features, (
            x.shape, config.num_joints_in, config.in_features)
        return x
    assert x.ndim == 4, f"expected (B, T, J, F), got {x.shape}"
    assert x.shape[-2] == config.num_joints_in, (x.shape, config.num_joints_in)
    assert x.shape[-1] == config.in_features, (x.shape, config.in_features)
    return x.reshape(x.shape[0], x.shape[1], -1)


def _finish_output(config: TemporalModelConfig, x):
    return x.reshape(x.shape[0], x.shape[1], config.num_joints_out, 3)


def _split_rngs(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def forward_dilated(
    config: TemporalModelConfig,
    params: Params,
    state: State,
    x,
    *,
    train: bool = False,
    momentum=0.1,
    rng=None,
) -> Tuple[jnp.ndarray, State]:
    """Reference (dilated) form: arbitrary input length T, output length
    ``T - receptive_field + 1``.  Parity: ``model.py:126-138``.

    Args:
      x: (B, T, J_in, F) input keypoints.
      train: use batch statistics + dropout; otherwise running stats, no dropout.
      momentum: BatchNorm running-stat update rate (traced scalar OK).
      rng: dropout PRNG key (required iff train and dropout > 0).

    Returns:
      ((B, T_out, J_out, 3) poses, new BN state).
    """
    compute_dtype = config.matmul_dtype
    act_dtype = config.activation_dtype
    x = _prep_input(config, x)
    n_blocks = len(config.filter_widths) - 1
    rngs = _split_rngs(rng if train else None, 2 * n_blocks + 1)
    new_state: State = {"layers_bn": [None] * (2 * n_blocks)}

    x = _conv_matmul(x, params["expand_conv"]["weight"], 1, compute_dtype,
                     act_dtype)
    x, new_state["expand_bn"] = _batchnorm(
        x, params["expand_bn"], state["expand_bn"], train=train, momentum=momentum)
    x = _dropout(jax.nn.relu(x), config.dropout if train else 0.0, rngs[0])

    for i in range(n_blocks):
        pad = config.pads[i + 1]
        shift = config.causal_shifts_dilated[i + 1]
        res = x[:, pad + shift: x.shape[1] - pad + shift]

        dilation = 1 if config.dense else config.dilations[i + 1]
        y = _conv_matmul(x, params["layers_conv"][2 * i]["weight"], dilation,
                         compute_dtype, act_dtype)
        y, new_state["layers_bn"][2 * i] = _batchnorm(
            y, params["layers_bn"][2 * i], state["layers_bn"][2 * i],
            train=train, momentum=momentum)
        y = _dropout(jax.nn.relu(y), config.dropout if train else 0.0, rngs[2 * i + 1])

        y = _conv_matmul(y, params["layers_conv"][2 * i + 1]["weight"], 1,
                         compute_dtype, act_dtype)
        y, new_state["layers_bn"][2 * i + 1] = _batchnorm(
            y, params["layers_bn"][2 * i + 1], state["layers_bn"][2 * i + 1],
            train=train, momentum=momentum)
        y = _dropout(jax.nn.relu(y), config.dropout if train else 0.0, rngs[2 * i + 2])
        x = res + y

    x = _conv_matmul(x, params["shrink"]["weight"], 1, compute_dtype,
                     act_dtype)
    x = x + params["shrink"]["bias"].astype(x.dtype)
    return _finish_output(config, x.astype(jnp.float32)), new_state


def forward_strided(
    config: TemporalModelConfig,
    params: Params,
    state: State,
    x,
    *,
    train: bool = True,
    momentum=0.1,
    rng=None,
) -> Tuple[jnp.ndarray, State]:
    """Optimized single-frame training form: input length must be exactly the
    receptive field (times nothing — output length 1).  Strided convs become pure
    reshapes, so no wasted intermediate frames.  Weight-interchangeable with
    :func:`forward_dilated`.  Parity: ``model.py:140-197``.
    """
    if config.dense:
        raise ValueError("strided form is incompatible with dense convolutions")
    compute_dtype = config.matmul_dtype
    act_dtype = config.activation_dtype
    x = _prep_input(config, x)
    assert x.shape[1] == receptive_field(config), (
        f"strided form expects input length == receptive field "
        f"({receptive_field(config)}), got {x.shape[1]}")

    n_blocks = len(config.filter_widths) - 1
    rngs = _split_rngs(rng if train else None, 2 * n_blocks + 1)
    new_state: State = {"layers_bn": [None] * (2 * n_blocks)}

    def prologue(p_expand, p_bn, s_bn, x, rng0):
        u = _conv_strided(x, p_expand["weight"], compute_dtype, act_dtype)
        u, new_bn = _batchnorm(u, p_bn, s_bn, train=train, momentum=momentum)
        return _dropout(jax.nn.relu(u), config.dropout if train else 0.0,
                        rng0), new_bn

    if train and config.remat_policy == "dots":
        prologue = jax.checkpoint(
            prologue, policy=jax.checkpoint_policies.dots_saveable)

    x, new_state["expand_bn"] = prologue(
        params["expand_conv"], params["expand_bn"], state["expand_bn"],
        x, rngs[0])

    def block(i, x, block_params, block_state, rng_a, rng_b):
        fw = config.filter_widths[i + 1]
        b, t, c = x.shape
        # One reshape serves both the strided conv (taps @ W) and the residual
        # (the center tap = a contiguous column slice).  This matters for the
        # backward pass: d(res) becomes a pad that fuses into d(taps) plus a
        # free bitcast back to (b, t, c), where the reference-style strided
        # slice ``x[:, off::fw]`` differentiates into a scatter-add whose
        # layout forces three full-tensor copies per block (measured ~1.5 ms
        # per block at B=1024/C=1024 on v5e).
        taps = x.reshape(b, t // fw, fw * c)
        center = config.causal_shifts_strided[i + 1] + fw // 2
        res = jax.lax.slice_in_dim(taps, center * c, (center + 1) * c, axis=2)

        w_a = block_params["conv_a"]["weight"]
        y = jnp.dot(taps.astype(compute_dtype),
                    w_a.reshape(fw * c, w_a.shape[2]).astype(compute_dtype),
                    preferred_element_type=jnp.float32).astype(act_dtype)
        y, bn_a = _batchnorm(y, block_params["bn_a"], block_state["bn_a"],
                             train=train, momentum=momentum)
        y = _dropout(jax.nn.relu(y), config.dropout if train else 0.0, rng_a)

        y = _conv_matmul(y, block_params["conv_b"]["weight"], 1,
                         compute_dtype, act_dtype)
        y, bn_b = _batchnorm(y, block_params["bn_b"], block_state["bn_b"],
                             train=train, momentum=momentum)
        y = _dropout(jax.nn.relu(y), config.dropout if train else 0.0, rng_b)
        return res + y, bn_a, bn_b

    def block_fused(i, x, block_params, block_state, rng_a, rng_b):
        """Same block through the fused custom-VJP Pallas kernels (identical
        math and dropout mask stream; see ops/pallas/train_block.py)."""
        from videopose3d_tpu.ops.pallas.train_block import fused_train_block
        fw = config.filter_widths[i + 1]
        b, t, c = x.shape
        n = b * (t // fw)
        center = config.causal_shifts_strided[i + 1] + fw // 2
        shape = (b, t // fw, c)
        rate = config.dropout if train else 0.0
        ma = _dropout_mask_btc(rate, rng_a, shape, compute_dtype)
        mb = _dropout_mask_btc(rate, rng_b, shape, compute_dtype)
        ones = None
        if ma is None or mb is None:
            ones = jnp.ones(shape, compute_dtype)
        interp = jax.default_backend() == "cpu"

        out, mean_a, var_a, mean_b, var_b = fused_train_block(
            center, fw, interp,
            x.astype(compute_dtype),
            block_params["conv_a"]["weight"].astype(compute_dtype),
            block_params["conv_b"]["weight"][0].astype(compute_dtype),
            block_params["bn_a"]["scale"], block_params["bn_a"]["bias"],
            block_params["bn_b"]["scale"], block_params["bn_b"]["bias"],
            ma if ma is not None else ones, mb if mb is not None else ones,
            block_state["bn_a"]["mean"], block_state["bn_b"]["mean"])

        def running(st, mean, var):
            unbiased = var * (n / max(n - 1, 1))
            return {"mean": (1.0 - momentum) * st["mean"] + momentum * mean,
                    "var": (1.0 - momentum) * st["var"] + momentum * unbiased}

        return (out, running(block_state["bn_a"], mean_a, var_a),
                running(block_state["bn_b"], mean_b, var_b))

    if train and (config.remat_blocks or config.remat_policy != "none"):
        # Rematerialize residual blocks in the backward pass.  With the "dots"
        # policy only matmul outputs are stored and the elementwise chains
        # (BN normalize / ReLU / dropout mask generation) are recomputed —
        # dropout masks regenerate bit-identically from the same PRNG key, so
        # gradients are exact.  "full" (or remat_blocks=True) stores only the
        # block inputs and recomputes the matmuls too (memory option).
        if config.remat_policy == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif config.remat_policy in ("full", "none"):
            policy = None
        else:
            raise ValueError(f"unknown remat_policy {config.remat_policy!r}")
        block = functools.partial(jax.checkpoint, static_argnums=(0,),
                                  policy=policy)(block)

    if config.train_engine not in ("xla", "pallas"):
        raise ValueError(f"unknown train_engine {config.train_engine!r}")
    # The fused kernels run one homogeneous dtype; "mixed" (bf16 operands /
    # f32 activations) is an XLA-engine scheme.
    use_fused = (train and config.train_engine == "pallas"
                 and not config.dense and not config.remat_blocks
                 and config.remat_policy == "none"
                 and config.compute_dtype != "mixed")

    for i in range(n_blocks):
        block_params = {"conv_a": params["layers_conv"][2 * i],
                        "bn_a": params["layers_bn"][2 * i],
                        "conv_b": params["layers_conv"][2 * i + 1],
                        "bn_b": params["layers_bn"][2 * i + 1]}
        block_state = {"bn_a": state["layers_bn"][2 * i],
                       "bn_b": state["layers_bn"][2 * i + 1]}
        block_fn = block
        if use_fused:
            from videopose3d_tpu.ops.pallas.train_block import _pick_tile
            fw_i = config.filter_widths[i + 1]
            n_rows = x.shape[0] * (x.shape[1] // fw_i)
            if _pick_tile(n_rows, jnp.dtype(compute_dtype)):
                block_fn = block_fused
        x, bn_a, bn_b = block_fn(i, x, block_params, block_state,
                                 rngs[2 * i + 1], rngs[2 * i + 2])
        new_state["layers_bn"][2 * i] = bn_a
        new_state["layers_bn"][2 * i + 1] = bn_b

    x = _conv_matmul(x, params["shrink"]["weight"], 1, compute_dtype,
                     act_dtype)
    x = x + params["shrink"]["bias"].astype(x.dtype)
    return _finish_output(config, x.astype(jnp.float32)), new_state


def forward_dilated_fused(
    config: TemporalModelConfig,
    params: Params,
    state: State,
    x,
    *,
    t_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inference-only dilated forward using the fused Pallas residual-block
    kernel (``ops/pallas/temporal_block.py``) for the heavy blocks; the cheap
    expand (34->C) and shrink (C->J*3) convolutions stay in XLA.

    Numerically equivalent to ``forward_dilated(..., train=False)`` up to the
    compute dtype.  No state is returned (inference never mutates BN stats).
    """
    if config.dense:
        raise ValueError("fused path does not support dense convolutions")
    from videopose3d_tpu.ops.pallas.temporal_block import (
        fold_batchnorm, fused_dilated_block, fused_expand_block,
        fused_shrink_block)

    # Pallas TPU kernels only compile for TPU; fall back to the interpreter on
    # CPU (tests / local runs) automatically.
    interpret = interpret or jax.default_backend() == "cpu"

    # "mixed" has no distinct meaning for the homogeneous-dtype serving
    # kernel; it runs at the matmul dtype (bf16), same as a bf16 config.
    compute_dtype = config.matmul_dtype
    x = _prep_input(config, x)
    n_blocks = len(config.filter_widths) - 1

    def block_affines(i):
        s1, b1 = fold_batchnorm(params["layers_bn"][2 * i],
                                state["layers_bn"][2 * i])
        s2, b2 = fold_batchnorm(params["layers_bn"][2 * i + 1],
                                state["layers_bn"][2 * i + 1])
        return s1, b1, s2, b2

    if n_blocks == 0:
        # Degenerate single-layer model: expand + shrink only, XLA path.
        x = _conv_matmul(x, params["expand_conv"]["weight"], 1, compute_dtype)
        scale, shift = fold_batchnorm(params["expand_bn"], state["expand_bn"])
        x = jax.nn.relu(x * scale.astype(x.dtype) + shift.astype(x.dtype))
        x = _conv_matmul(x, params["shrink"]["weight"], 1, compute_dtype)
        x = x + params["shrink"]["bias"].astype(x.dtype)
        return _finish_output(config, x.astype(jnp.float32))

    # First block with the expand conv fused in (saves the (B, T, C) expand
    # round-trip to HBM).
    s0, b0 = fold_batchnorm(params["expand_bn"], state["expand_bn"])
    s1, b1, s2, b2 = block_affines(0)
    if n_blocks == 1:
        # The single block would need both expand and shrink fused; fuse the
        # expand side and run the cheap shrink in XLA.
        x = fused_expand_block(
            x, params["expand_conv"]["weight"].astype(compute_dtype), s0, b0,
            params["layers_conv"][0]["weight"].astype(compute_dtype), s1, b1,
            params["layers_conv"][1]["weight"].astype(compute_dtype), s2, b2,
            dilation=config.dilations[1],
            causal_shift=config.causal_shifts_dilated[1],
            t_tile=t_tile, interpret=interpret)
        x = _conv_matmul(x, params["shrink"]["weight"], 1, compute_dtype)
        x = x + params["shrink"]["bias"].astype(x.dtype)
        return _finish_output(config, x.astype(jnp.float32))

    # In the multi-block chain each kernel over-allocates its output stream
    # so the next block's windows fit directly (next_reach) — no
    # slice-to-valid + re-pad full-stream copies between blocks.  ``valid``
    # tracks the real row count through the scratch tails.
    fw = config.filter_widths
    reach = lambda blk: (fw[blk + 1] - 1) * config.dilations[blk + 1]
    k0 = fw[0]
    t_raw = x.shape[1]
    x = fused_expand_block(
        x, params["expand_conv"]["weight"].astype(compute_dtype), s0, b0,
        params["layers_conv"][0]["weight"].astype(compute_dtype), s1, b1,
        params["layers_conv"][1]["weight"].astype(compute_dtype), s2, b2,
        dilation=config.dilations[1],
        causal_shift=config.causal_shifts_dilated[1],
        t_tile=t_tile, interpret=interpret, next_reach=reach(1))
    valid = t_raw - (k0 - 1) - reach(0)

    for i in range(1, n_blocks - 1):
        s1, b1, s2, b2 = block_affines(i)
        x = fused_dilated_block(
            x,
            params["layers_conv"][2 * i]["weight"].astype(compute_dtype),
            s1, b1,
            params["layers_conv"][2 * i + 1]["weight"].astype(compute_dtype),
            s2, b2,
            dilation=config.dilations[i + 1],
            causal_shift=config.causal_shifts_dilated[i + 1],
            t_tile=t_tile,
            interpret=interpret,
            valid=valid,
            next_reach=reach(i + 1),
        )
        valid -= reach(i)

    # Last block with the shrink projection fused in (writes J*3 lanes instead
    # of C).
    i = n_blocks - 1
    s1, b1, s2, b2 = block_affines(i)
    x = fused_shrink_block(
        x,
        params["layers_conv"][2 * i]["weight"].astype(compute_dtype), s1, b1,
        params["layers_conv"][2 * i + 1]["weight"].astype(compute_dtype),
        s2, b2,
        params["shrink"]["weight"], params["shrink"]["bias"],
        dilation=config.dilations[i + 1],
        causal_shift=config.causal_shifts_dilated[i + 1],
        t_tile=t_tile, interpret=interpret, valid=valid)
    return _finish_output(config, x.astype(jnp.float32))


def forward(config, params, state, x, *, mode: str = "dilated", **kwargs):
    """Dispatch to the dilated (reference/eval) or strided (train) form."""
    if mode == "dilated":
        return forward_dilated(config, params, state, x, **kwargs)
    elif mode == "strided":
        return forward_strided(config, params, state, x, **kwargs)
    elif mode == "fused":
        return forward_dilated_fused(config, params, state, x, **kwargs), state
    raise ValueError(f"unknown mode {mode!r}")
