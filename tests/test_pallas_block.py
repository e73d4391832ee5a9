"""Pallas fused residual-block kernel tests (interpret mode on CPU): numerical
equivalence with the unfused XLA path, including causal shifts, ragged tile
tails, and the full fused forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, forward_dilated,
)
from videopose3d_tpu.models.temporal import forward_dilated_fused
from videopose3d_tpu.ops.pallas.temporal_block import (
    fused_dilated_block, fold_batchnorm)

C = 128  # channels (lane-width aligned)


def _block_params(rng, k=3):
    w1 = rng.standard_normal((k, C, C)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((1, C, C)).astype(np.float32) * 0.05
    bn = lambda: (
        {"scale": rng.uniform(0.5, 1.5, C).astype(np.float32),
         "bias": rng.uniform(-0.2, 0.2, C).astype(np.float32)},
        {"mean": rng.uniform(-0.1, 0.1, C).astype(np.float32),
         "var": rng.uniform(0.5, 2.0, C).astype(np.float32)})
    return w1, w2, bn(), bn()


def _xla_block(x, w1, w2, bn1, bn2, dilation, causal_shift=0):
    """Unfused reference of one block (matches forward_dilated's inner loop)."""
    k = w1.shape[0]
    pad = (k - 1) * dilation // 2
    t = x.shape[1]
    res = x[:, pad + causal_shift: t - pad + causal_shift]
    t_out = t - (k - 1) * dilation
    taps = jnp.concatenate(
        [x[:, j * dilation: j * dilation + t_out] for j in range(k)], axis=-1)
    y = taps @ w1.reshape(k * C, C)
    s1, b1 = fold_batchnorm(*bn1)
    y = jax.nn.relu(y * s1 + b1)
    y = y @ w2[0]
    s2, b2 = fold_batchnorm(*bn2)
    y = jax.nn.relu(y * s2 + b2)
    return res + y


@pytest.mark.parametrize("dilation,t,t_tile,causal_shift", [
    (1, 40, 16, 0),
    (3, 70, 16, 0),
    (3, 70, 16, 3),     # causal
    (9, 100, 32, 0),
    (1, 19, 16, 0),     # ragged tail (t_out=17 not divisible by 16)
    (3, 300, 256, 0),   # single tile larger than t_out
])
def test_fused_block_matches_xla(dilation, t, t_tile, causal_shift):
    rng = np.random.default_rng(0)
    w1, w2, bn1, bn2 = _block_params(rng)
    x = rng.standard_normal((2, t, C)).astype(np.float32) * 0.5

    want = np.asarray(_xla_block(jnp.asarray(x), jnp.asarray(w1),
                                 jnp.asarray(w2), bn1, bn2, dilation,
                                 causal_shift))
    s1, b1 = fold_batchnorm(*bn1)
    s2, b2 = fold_batchnorm(*bn2)
    got = np.asarray(fused_dilated_block(
        jnp.asarray(x), jnp.asarray(w1), s1, b1, jnp.asarray(w2), s2, b2,
        dilation=dilation, causal_shift=causal_shift, t_tile=t_tile,
        interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_forward_matches_dilated():
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3, 3), dropout=0.0, channels=C)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 27 + 13, 17, 2)).astype(np.float32)

    want, _ = forward_dilated(cfg, params, state, x, train=False)
    got = forward_dilated_fused(cfg, params, state, x, t_tile=8, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_forward_causal():
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3), causal=True, dropout=0.0, channels=C)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 9 + 6, 17, 2)).astype(np.float32)

    want, _ = forward_dilated(cfg, params, state, x, train=False)
    got = forward_dilated_fused(cfg, params, state, x, t_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_forward_flagship_depth_chain():
    """The valid/next_reach scratch-tail chaining through 4- and 5-block
    stacks (the mid-to-mid handoff the shallower tests never reach),
    symmetric and causal, against the unfused XLA forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videopose3d_tpu.models.temporal import (
        TemporalModelConfig, init_temporal_model, forward_dilated,
        forward_dilated_fused, receptive_field)

    rng = np.random.default_rng(5)
    for fw, causal in [((3, 3, 3, 3), False), ((3, 3, 3, 3, 3), False),
                       ((3, 3, 3, 3, 3), True)]:
        cfg = TemporalModelConfig(
            num_joints_in=17, in_features=2, num_joints_out=17,
            filter_widths=fw, causal=causal, dropout=0.0, channels=32)
        rf = receptive_field(cfg)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((2, rf + 37, 17, 2)),
                        jnp.float32)
        ref, _ = forward_dilated(cfg, params, state, x, train=False)
        out = forward_dilated_fused(cfg, params, state, x, t_tile=48)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=f"{fw} causal={causal}")
