"""Fused custom-VJP Pallas train block (interpret mode on CPU): value, BN
running-state, and gradient parity against the XLA strided path, which shares
the exact dropout mask stream."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, init_temporal_model, forward_strided,
    receptive_field)


def _cfg(fw=(3, 3, 3), channels=32, dropout=0.25, causal=False, engine="xla"):
    return TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=fw, causal=causal, dropout=dropout, channels=channels,
        train_engine=engine)


def _run(cfg, params, state, x, key):
    def loss_fn(p):
        pred, new_state = forward_strided(cfg, p, state, x, train=True,
                                          momentum=0.07, rng=key)
        # A non-trivial functional of the output so every gradient is
        # exercised.
        return jnp.sum(pred * jnp.cos(jnp.arange(pred.size)
                                      .reshape(pred.shape))), new_state

    (loss, new_state), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    return loss, new_state, grads


@pytest.mark.parametrize("fw,channels,dropout,causal", [
    ((3, 3, 3), 32, 0.25, False),
    ((3, 3, 3), 32, 0.0, False),
    ((3, 3, 3, 3), 16, 0.25, True),
    ((5, 5), 32, 0.25, False),
])
@pytest.mark.slow
def test_fused_block_matches_xla(fw, channels, dropout, causal):
    cfg_x = _cfg(fw, channels, dropout, causal, "xla")
    cfg_p = _cfg(fw, channels, dropout, causal, "pallas")
    params, state = init_temporal_model(cfg_x, jax.random.PRNGKey(3))
    rf = receptive_field(cfg_x)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, rf, 17, 2)), jnp.float32)
    key = jax.random.PRNGKey(11)

    loss_x, state_x, grads_x = _run(cfg_x, params, state, x, key)
    loss_p, state_p, grads_p = _run(cfg_p, params, state, x, key)

    np.testing.assert_allclose(float(loss_p), float(loss_x),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_p),
                    jax.tree_util.tree_leaves(state_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(grads_x)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(grads_p)
    for (path, gx), (_, gp) in zip(flat_x, flat_p):
        scale = max(float(np.abs(np.asarray(gx)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=2e-5, atol=2e-5 * scale,
            err_msg=str(path))


def test_fused_block_forward_values():
    """Fused forward == XLA forward elementwise (same masks)."""
    cfg_x = _cfg(engine="xla")
    cfg_p = _cfg(engine="pallas")
    params, state = init_temporal_model(cfg_x, jax.random.PRNGKey(0))
    rf = receptive_field(cfg_x)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, rf, 17, 2)),
                    jnp.float32)
    key = jax.random.PRNGKey(4)
    out_x, _ = forward_strided(cfg_x, params, state, x, train=True,
                               momentum=0.1, rng=key)
    out_p, _ = forward_strided(cfg_p, params, state, x, train=True,
                               momentum=0.1, rng=key)
    # Reduction order inside the stats kernels differs from XLA's, so batch
    # means/vars (and thus normalized values) agree to f32 reassociation
    # level, not bitwise.
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)


def test_fused_engine_eval_mode_ignored():
    """train=False never routes through the fused train kernels (they assume
    batch statistics); eval output must equal the xla engine's."""
    cfg_p = _cfg(engine="pallas")
    params, state = init_temporal_model(cfg_p, jax.random.PRNGKey(0))
    rf = receptive_field(cfg_p)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, rf, 17, 2)),
                    jnp.float32)
    out_p, _ = forward_strided(cfg_p, params, state, x, train=False)
    out_x, _ = forward_strided(_cfg(engine="xla"), params, state, x,
                               train=False)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_fused_block_bf16_matches_xla():
    """bf16 compute dtype: the backward ReLU/dropout gates must replay the
    forward's compute-dtype affine (f32-gate recomputation can disagree on
    pre-activations that round across 0).  bf16 accumulation-order noise means
    tolerances are looser than f32; gate corruption shows up as gross per-leaf
    disagreement, which the cosine check catches."""
    cfg_x = _cfg((3, 3, 3), 32, 0.25, False, "xla")
    cfg_p = _cfg((3, 3, 3), 32, 0.25, False, "pallas")
    cfg_x = cfg_x.__class__(**{**cfg_x.__dict__, "compute_dtype": "bfloat16"})
    cfg_p = cfg_p.__class__(**{**cfg_p.__dict__, "compute_dtype": "bfloat16"})
    params, state = init_temporal_model(cfg_x, jax.random.PRNGKey(3))
    rf = receptive_field(cfg_x)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, rf, 17, 2)), jnp.float32)
    key = jax.random.PRNGKey(11)

    loss_x, state_x, grads_x = _run(cfg_x, params, state, x, key)
    loss_p, state_p, grads_p = _run(cfg_p, params, state, x, key)

    np.testing.assert_allclose(float(loss_p), float(loss_x),
                               rtol=5e-3, atol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(grads_x)):
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom == 0:
            continue
        cos = float(np.dot(a, b) / denom)
        assert cos > 0.995, cos
