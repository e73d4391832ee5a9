"""Temporal model tests: geometry helpers, dilated<->strided weight
interchangeability, PyTorch BatchNorm semantics, and golden parity against the
reference implementation with converted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from videopose3d_tpu.models import (
    TemporalModelConfig,
    init_temporal_model,
    forward_dilated,
    forward_strided,
    receptive_field,
    total_causal_shift,
    param_count,
)
from videopose3d_tpu.models.convert import (
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)


def _config(fw=(3, 3, 3), causal=False, channels=32, dense=False,
            compute_dtype="float32"):
    return TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=fw, causal=causal, dropout=0.25, channels=channels,
        dense=dense, compute_dtype=compute_dtype,
    )


class TestGeometry:
    @pytest.mark.parametrize("fw,rf", [((3, 3, 3), 27), ((3, 3, 3, 3), 81),
                                       ((3, 3, 3, 3, 3), 243), ((1,), 1),
                                       ((5, 5), 25), ((3, 9), 27)])
    def test_receptive_field(self, fw, rf):
        assert receptive_field(_config(fw)) == rf

    def test_even_width_rejected(self):
        with pytest.raises(ValueError):
            _config((3, 4, 3))

    def test_receptive_field_parity(self, reference_modules):
        for fw in [(3, 3, 3), (3, 3, 3, 3, 3), (5, 5), (1,)]:
            ref = reference_modules.model.TemporalModel(17, 2, 17, list(fw))
            assert receptive_field(_config(fw)) == ref.receptive_field()
        for fw in [(3, 3, 3), (5, 5)]:
            ref = reference_modules.model.TemporalModel(17, 2, 17, list(fw), causal=True)
            assert total_causal_shift(_config(fw, causal=True)) == ref.total_causal_shift()

    def test_param_count_parity(self, reference_modules):
        cfg = _config((3, 3, 3), channels=64)
        params, _ = init_temporal_model(cfg, jax.random.PRNGKey(0))
        ref = reference_modules.model.TemporalModel(17, 2, 17, [3, 3, 3], channels=64)
        ref_count = sum(p.numel() for p in ref.parameters())
        assert param_count(params) == ref_count


def _torch_reference_model(reference_modules, cfg, optimized=False):
    torch.manual_seed(0)
    if optimized:
        return reference_modules.model.TemporalModelOptimized1f(
            cfg.num_joints_in, cfg.in_features, cfg.num_joints_out,
            list(cfg.filter_widths), causal=cfg.causal, dropout=cfg.dropout,
            channels=cfg.channels)
    return reference_modules.model.TemporalModel(
        cfg.num_joints_in, cfg.in_features, cfg.num_joints_out,
        list(cfg.filter_widths), causal=cfg.causal, dropout=cfg.dropout,
        channels=cfg.channels, dense=cfg.dense)


class TestParity:
    @pytest.mark.parametrize("fw,causal,dense", [
        ((3, 3, 3), False, False),
        ((3, 3, 3), True, False),
        ((3, 3, 3, 3), False, False),
        ((5, 5), False, False),
        ((3, 3, 3), False, True),
        ((1,), False, False),
    ])
    def test_dilated_eval_parity(self, reference_modules, fw, causal, dense):
        cfg = _config(fw, causal=causal, dense=dense)
        ref = _torch_reference_model(reference_modules, cfg).eval()
        params, state = params_from_torch_state_dict(
            cfg, {k: v.numpy() for k, v in ref.state_dict().items()})

        rng = np.random.default_rng(0)
        T = receptive_field(cfg) + 10
        x = rng.standard_normal((2, T, 17, 2)).astype(np.float32)

        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got, _ = forward_dilated(cfg, params, state, x, train=False)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_strided_eval_parity(self, reference_modules):
        cfg = _config((3, 3, 3))
        ref = _torch_reference_model(reference_modules, cfg, optimized=True).eval()
        params, state = params_from_torch_state_dict(
            cfg, {k: v.numpy() for k, v in ref.state_dict().items()})

        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, receptive_field(cfg), 17, 2)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got, _ = forward_strided(cfg, params, state, x, train=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_train_mode_bn_parity(self, reference_modules):
        """Train-mode forward (batch stats) + running-stat update parity.
        Dropout disabled so randomness doesn't enter."""
        import dataclasses
        cfg = dataclasses.replace(_config((3, 3, 3)), dropout=0.0)
        ref = _torch_reference_model(reference_modules, cfg, optimized=True).train()
        params, state = params_from_torch_state_dict(
            cfg, {k: v.numpy() for k, v in ref.state_dict().items()})

        rng = np.random.default_rng(2)
        x = rng.standard_normal((8, receptive_field(cfg), 17, 2)).astype(np.float32)

        ref.set_bn_momentum(0.05)
        want = ref(torch.from_numpy(x)).detach().numpy()
        got, new_state = forward_strided(
            cfg, params, state, x, train=True, momentum=0.05, rng=None)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

        # Running stats after one train step must match.
        want_sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        np.testing.assert_allclose(
            np.asarray(new_state["expand_bn"]["mean"]),
            want_sd["expand_bn.running_mean"], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["expand_bn"]["var"]),
            want_sd["expand_bn.running_var"], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["layers_bn"][3]["mean"]),
            want_sd["layers_bn.3.running_mean"], atol=1e-5)


class TestInterchangeability:
    """The strided (train) and dilated (eval) forms share one weight pytree:
    strided output == center frame of dilated output (reference property,
    model.py:146-148 / run.py:426)."""

    @pytest.mark.parametrize("fw,causal", [((3, 3, 3), False), ((3, 3, 3), True),
                                           ((3, 3, 3, 3), False), ((5, 5), False)])
    def test_strided_equals_dilated_center(self, fw, causal):
        cfg = _config(fw, causal=causal)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(42))
        rng = np.random.default_rng(3)
        x = rng.standard_normal((3, receptive_field(cfg), 17, 2)).astype(np.float32)

        dilated, _ = forward_dilated(cfg, params, state, x, train=False)
        strided, _ = forward_strided(cfg, params, state, x, train=False)
        assert dilated.shape == (3, 1, 17, 3)
        assert strided.shape == (3, 1, 17, 3)
        np.testing.assert_allclose(
            np.asarray(strided), np.asarray(dilated), atol=1e-5)


class TestMixedPrecision:
    """``compute_dtype="mixed"``: bf16 MXU operand casts, f32 activations/BN
    normalize/residual/dropout (the metric-grade fast config)."""

    def test_mixed_closer_to_f32_than_bf16(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 60, 17, 2)).astype(np.float32)
        outs = {}
        for dt in ("float32", "bfloat16", "mixed"):
            cfg = _config((3, 3), compute_dtype=dt)
            params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
            y, new_state = forward_dilated(cfg, params, state, x, train=True,
                                           rng=None, momentum=0.1)
            outs[dt] = (np.asarray(y), new_state)
        err_mixed = np.abs(outs["mixed"][0] - outs["float32"][0]).max()
        err_bf16 = np.abs(outs["bfloat16"][0] - outs["float32"][0]).max()
        assert err_mixed <= err_bf16, (err_mixed, err_bf16)
        assert err_mixed < 0.05, err_mixed
        # BN running stats stay float32 in every mode.
        for dt, (_, st) in outs.items():
            assert st["expand_bn"]["mean"].dtype == np.float32, dt

    def test_mixed_strided_equals_dilated_center(self):
        cfg = _config((3, 3, 3), compute_dtype="mixed")
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(42))
        x = np.random.default_rng(3).standard_normal(
            (3, receptive_field(cfg), 17, 2)).astype(np.float32)
        dilated, _ = forward_dilated(cfg, params, state, x, train=False)
        strided, _ = forward_strided(cfg, params, state, x, train=False)
        np.testing.assert_allclose(
            np.asarray(strided), np.asarray(dilated), atol=1e-5)

    def test_unknown_dtype_rejected(self):
        with pytest.raises((TypeError, ValueError)):
            _config((3, 3), compute_dtype="float17")


class TestThreeFeatureInput:
    def test_in_features_3(self):
        """Detections with confidence scores (x, y, p) — the reference's
        d-pt-243-style models — flow through both forms."""
        cfg = TemporalModelConfig(
            num_joints_in=17, in_features=3, num_joints_out=17,
            filter_widths=(3, 3), dropout=0.0, channels=16)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        x = np.random.default_rng(0).standard_normal((2, 9, 17, 3)).astype(np.float32)
        y1, _ = forward_dilated(cfg, params, state, x, train=False)
        y2, _ = forward_strided(cfg, params, state, x, train=False)
        assert y1.shape == (2, 1, 17, 3)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


class TestJit:
    def test_jit_forward(self):
        cfg = _config((3, 3, 3))
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        f = jax.jit(lambda p, s, x: forward_dilated(cfg, p, s, x, train=False))
        x = jnp.zeros((2, 37, 17, 2))
        y, _ = f(params, state, x)
        assert y.shape == (2, 37 - 26, 17, 3)

    def test_grads_flow(self):
        cfg = _config((3, 3, 3), channels=16)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(0))
        x = jnp.ones((2, 27, 17, 2))
        target = jnp.zeros((2, 1, 17, 3))

        def loss_fn(p):
            y, _ = forward_strided(cfg, p, state, x, train=True, momentum=0.1,
                                   rng=jax.random.PRNGKey(1))
            return jnp.mean((y - target) ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestRoundTripConversion:
    def test_torch_roundtrip(self):
        cfg = _config((3, 3, 3), channels=16)
        params, state = init_temporal_model(cfg, jax.random.PRNGKey(7))
        sd = params_to_torch_state_dict(params, state)
        params2, state2 = params_from_torch_state_dict(cfg, sd)
        for want, got in ((params, params2), (state, state2)):
            assert (jax.tree_util.tree_structure(want)
                    == jax.tree_util.tree_structure(got))
            for a, b in zip(jax.tree_util.tree_leaves(want),
                            jax.tree_util.tree_leaves(got), strict=True):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFlagshipParity:
    """Full-size golden parity at the headline config (arc 3,3,3,3,3 @ 1024
    channels, RF 243 — ``/root/reference/README.md:18``), in float64 so the
    comparison isolates math from rounding: "46.8 mm would reproduce" rests on
    the flagship graph agreeing with the torch reference, not just toy arcs."""

    FLAGSHIP = (3, 3, 3, 3, 3)

    def _f64_setup(self, reference_modules, optimized):
        cfg = TemporalModelConfig(
            num_joints_in=17, in_features=2, num_joints_out=17,
            filter_widths=self.FLAGSHIP, causal=False, dropout=0.25,
            channels=1024, compute_dtype="float64")
        ref = _torch_reference_model(reference_modules, cfg,
                                     optimized=optimized).double().eval()
        params, state = params_from_torch_state_dict(
            cfg, {k: v.numpy() for k, v in ref.state_dict().items()})
        return cfg, ref, params, state

    def test_flagship_dilated_f64(self, reference_modules):
        with jax.enable_x64():
            cfg, ref, params, state = self._f64_setup(reference_modules, False)
            rng = np.random.default_rng(11)
            x = rng.standard_normal((1, receptive_field(cfg) + 10, 17, 2))
            with torch.no_grad():
                want = ref(torch.from_numpy(x)).numpy()
            got, _ = forward_dilated(cfg, params, state, x, train=False)
            assert got.shape == want.shape == (1, 11, 17, 3)
            # The forward pass intentionally returns float32 (serving dtype);
            # agreement at the f32 rounding level proves the f64 internals
            # match the reference exactly.
            np.testing.assert_allclose(np.asarray(got), want, atol=5e-7)

    def test_flagship_strided_f64(self, reference_modules):
        with jax.enable_x64():
            cfg, ref, params, state = self._f64_setup(reference_modules, True)
            rng = np.random.default_rng(12)
            x = rng.standard_normal((2, receptive_field(cfg), 17, 2))
            with torch.no_grad():
                want = ref(torch.from_numpy(x)).numpy()
            got, _ = forward_strided(cfg, params, state, x, train=False)
            assert got.shape == want.shape == (2, 1, 17, 3)
            np.testing.assert_allclose(np.asarray(got), want, atol=5e-7)


class TestBatchNormNumerics:
    """One-pass batch statistics must not lose precision to catastrophic
    cancellation when activations sit far from zero (the shifted formulation
    centers on the running mean before squaring)."""

    @pytest.mark.parametrize("offset", [0.0, 30.0, 300.0])
    def test_shifted_one_pass_vs_torch(self, offset):
        from videopose3d_tpu.models.temporal import _batchnorm

        c = 32
        rng = np.random.default_rng(5)
        x = (offset + rng.standard_normal((64, 9, c))).astype(np.float32)

        bn = torch.nn.BatchNorm1d(c, momentum=0.1)
        with torch.no_grad():
            bn.running_mean.fill_(offset)  # running stats track the data
            bn.weight.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, c).astype(np.float32)))
            bn.bias.copy_(torch.from_numpy(
                rng.standard_normal(c).astype(np.float32)))
        bn.train()
        want = bn(torch.from_numpy(x).permute(0, 2, 1)).detach() \
            .permute(0, 2, 1).numpy()

        params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
                  "bias": jnp.asarray(bn.bias.detach().numpy())}
        state = {"mean": jnp.full((c,), offset, jnp.float32),
                 "var": jnp.ones((c,), jnp.float32)}
        got, new_state = _batchnorm(jnp.asarray(x), params, state,
                                    train=True, momentum=0.1)
        # Normalized outputs are O(1); the tolerance must not scale with the
        # offset — that is exactly the cancellation failure mode.
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(new_state["var"]),
            bn.running_var.detach().numpy(), rtol=1e-3)
