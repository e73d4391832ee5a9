"""w8a8 int8 serving kernel tests (interpret mode on CPU): accuracy vs the f32
path at mm scale, geometry, causal mode, and the Evaluator int8 engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, init_temporal_model, forward_dilated,
    receptive_field)
from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
    quantize_temporal_model, forward_dilated_int8)


def _setup(fw=(3, 3, 3), channels=64, causal=False, seed=0):
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=fw, causal=causal, dropout=0.25, channels=channels)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(seed))
    rf = receptive_field(cfg)
    rng = np.random.default_rng(seed)
    calib = jnp.asarray(rng.standard_normal((2, rf + 64, 17, 2)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, rf + 20, 17, 2)), jnp.float32)
    return cfg, params, state, calib, x


@pytest.mark.parametrize("fw,channels", [((3, 3, 3), 64), ((3, 3, 3, 3), 32),
                                         ((5, 5, 5), 64)])
def test_int8_accuracy_vs_f32(fw, channels):
    """Random weights + random inputs are the worst case for post-training
    quantization; even so the per-joint error must stay at mm scale relative
    to the f32 path (README.md:16-23 accuracy table is the anchor: protocol
    errors are ~40 mm, so a few-mm serving delta is the acceptable regime)."""
    cfg, params, state, calib, x = _setup(fw, channels)
    q = quantize_temporal_model(cfg, params, state, calib)
    want, _ = forward_dilated(cfg, params, state, x, train=False)
    got = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=32)
    want, got = np.asarray(want), np.asarray(got)
    assert got.shape == want.shape
    per_joint = np.linalg.norm(got - want, axis=-1).mean()
    scale = np.sqrt((want ** 2).mean())
    assert per_joint < 0.06 * scale, (per_joint, scale)


def test_int8_causal():
    cfg, params, state, calib, x = _setup(causal=True)
    q = quantize_temporal_model(cfg, params, state, calib)
    want, _ = forward_dilated(cfg, params, state, x, train=False)
    got = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=32)
    err = np.linalg.norm(np.asarray(got) - np.asarray(want), axis=-1).mean()
    assert np.asarray(got).shape == np.asarray(want).shape
    assert err < 0.06 * np.sqrt((np.asarray(want) ** 2).mean())


def test_int8_output_geometry():
    cfg, params, state, calib, _ = _setup()
    q = quantize_temporal_model(cfg, params, state, calib)
    rf = receptive_field(cfg)
    x = jnp.zeros((3, rf + 7, 17, 2), jnp.float32)
    out = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=32)
    assert out.shape == (3, 8, 17, 3)
    assert out.dtype == jnp.float32


def test_int8_rejects_unsupported():
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3,), dropout=0.25, channels=32)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        quantize_temporal_model(cfg, params, state,
                                jnp.zeros((1, 16, 17, 2)))


def test_evaluator_int8_engine():
    from videopose3d_tpu.evaluate import Evaluator
    cfg, params, state, _, x = _setup()
    ev_exact = Evaluator(cfg, joints_flip_perm=np.arange(17))
    ev_int8 = Evaluator(cfg, joints_flip_perm=np.arange(17), engine="int8")
    want = ev_exact.predict(params, state, x[:1], augment=False)
    got = ev_int8.predict(params, state, x[:1], augment=False)
    assert got.shape == want.shape
    err = np.linalg.norm(got - want, axis=-1).mean()
    assert err < 0.06 * np.sqrt((want ** 2).mean())
    # Re-quantization hook.
    ev_int8.reset_quantization()
    assert ev_int8._q is None


def test_int8_calibration_transfer_structured_data():
    """On structured (smooth, pose-like) inputs — the realistic serving case —
    calibration transfers across segments and the int8 error tightens well
    below the random-noise worst case."""
    cfg, params, state, _, _ = _setup(channels=64)
    rf = receptive_field(cfg)
    t_axis = np.arange(rf + 300, dtype=np.float32)[None, :, None, None]
    phase = np.linspace(0, 3, 17 * 2, dtype=np.float32).reshape(1, 1, 17, 2)
    motion = 0.4 * np.sin(0.07 * t_axis + 6 * phase) + 0.1 * phase
    x_all = jnp.asarray(np.broadcast_to(motion, (1,) + motion.shape[1:]))
    calib, test = x_all[:, :rf + 120], x_all[:, rf + 50:]

    q = quantize_temporal_model(cfg, params, state, calib)
    want, _ = forward_dilated(cfg, params, state, test, train=False)
    got = forward_dilated_int8(cfg, q, test, interpret=True, t_tile=32)
    err = np.linalg.norm(np.asarray(got) - np.asarray(want), axis=-1).mean()
    scale = np.sqrt((np.asarray(want) ** 2).mean())
    assert err < 0.02 * scale, (err, scale)


def test_evaluator_requant_cache_key():
    """The quantization cache keys on the weight *buffers*: a fresh pytree
    (even with identical values) triggers requantization; repeated calls with
    the same buffers hit the cache (ADVICE r2: identity-of-the-tree keying
    missed replaced leaves)."""
    from videopose3d_tpu.evaluate import Evaluator
    cfg, params, state, _, x = _setup()
    ev = Evaluator(cfg, joints_flip_perm=np.arange(17), engine="int8")
    ev.predict(params, state, x[:1], augment=False)
    q1 = ev._q
    ev.predict(params, state, x[:1], augment=False)
    assert ev._q is q1  # cache hit on identical buffers

    params2 = jax.tree_util.tree_map(jnp.array, params)
    ev.predict(params2, state, x[:1], augment=False)
    assert ev._q is not q1  # fresh buffers -> requantized


def test_evaluator_designated_calibration():
    """set_calibration pins the activation-scale calibration batch, removing
    the first-predicted-batch call-order dependence."""
    from videopose3d_tpu.evaluate import Evaluator
    cfg, params, state, _, x = _setup()
    calib = x[:1] * 0.5
    ev = Evaluator(cfg, joints_flip_perm=np.arange(17), engine="int8")
    ev.set_calibration(calib)
    ev.predict(params, state, x[:1], augment=False)

    q_direct = quantize_temporal_model(cfg, params, state, calib)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ev._q, q_direct)


@pytest.mark.parametrize("fw,causal", [((3, 3, 3), False), ((3, 3, 3), True),
                                       ((3, 3, 3, 3), False)])
def test_int8_tap_modes_bit_identical(fw, causal):
    """The accshift tap form (aligned int8 operand slices + int32-side
    shifts, _taps_i8) must be BIT-identical to the slice form through the
    whole forward: integer adds commute and the f32 residual convert is
    elementwise.  accshift_min_d=0 forces accshift on every block (incl. the
    expand block's in-register taps); the huge value forces slice."""
    cfg, params, state, calib, x = _setup(fw, 64, causal=causal)
    q = quantize_temporal_model(cfg, params, state, calib)
    base = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=32,
                                accshift_min_d=10**9)
    shifted = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=32,
                                   accshift_min_d=0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(shifted))


@pytest.mark.parametrize("fw,causal", [((3, 3, 3), False), ((3, 3, 3), True),
                                       ((3, 3, 3, 3), False)])
def test_int8_halves_bit_identical(fw, causal):
    """The chunk-interleaved kernel form (halves=2: phase-major emission so
    one chunk's requantize VPU epilogue overlaps the other chunk's MXU dots)
    must be BIT-identical to the single-chunk form: row chunks are
    independent and per-row math is unchanged (_chunked_block_i8)."""
    cfg, params, state, calib, x = _setup(fw, 64, causal=causal)
    q = quantize_temporal_model(cfg, params, state, calib)
    base = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=64)
    split = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=64,
                                 halves=2)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(split))


def test_int8_accshift_with_halves_bit_identical():
    """Both experiment knobs together: the chunked accshift branch
    (_taps_i8/_residual_rows with row0 != 0 shifting the aligned-slice
    arithmetic) must still be bit-identical to the plain form."""
    cfg, params, state, calib, x = _setup((3, 3, 3), 64, causal=True)
    q = quantize_temporal_model(cfg, params, state, calib)
    base = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=64)
    both = forward_dilated_int8(cfg, q, x, interpret=True, t_tile=64,
                                halves=2, accshift_min_d=0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(both))
