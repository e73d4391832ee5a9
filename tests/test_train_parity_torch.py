"""Training-dynamics parity vs the torch reference: identical weights,
identical batches, dropout off, Adam(amsgrad) on both sides — per-step losses
and the weights after optimization must track each other closely.

This is the strongest no-real-data substitute for reproducing the published
46.8 mm: if the forward, the BatchNorm train-mode semantics, the gradients,
and the optimizer all match step-for-step, the training trajectory is the
reference's trajectory (``/root/reference/run.py:399-420`` supervised loop,
``:252-264`` optimizer)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, forward_strided, receptive_field)
from videopose3d_tpu.models.convert import params_from_torch_state_dict

STEPS = 15
LR = 1e-3


def _batches(rf, n=STEPS, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        x2d = rng.standard_normal((batch, rf, 17, 2)).astype(np.float32)
        # Learnable structure so losses actually move.
        depth = 0.3 * np.sin(2 * x2d[..., :1]) + 0.2 * x2d[..., 1:]
        x3d = np.concatenate([0.5 * x2d, depth], axis=-1)[:, rf // 2:rf // 2 + 1]
        x3d[:, :, 0] = 0.0
        yield x2d, x3d.astype(np.float32)


def test_supervised_training_tracks_torch_reference(reference_modules):
    cfg = TemporalModelConfig(
        num_joints_in=17, in_features=2, num_joints_out=17,
        filter_widths=(3, 3), causal=False, dropout=0.0, channels=32)
    rf = receptive_field(cfg)

    torch.manual_seed(7)
    ref = reference_modules.model.TemporalModelOptimized1f(
        17, 2, 17, [3, 3], causal=False, dropout=0.0, channels=32)
    ref.train()
    params, state = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref.state_dict().items()})

    # --- torch side: the reference training loop (run.py:399-420) ---
    opt_t = torch.optim.Adam(ref.parameters(), lr=LR, amsgrad=True)
    losses_t = []
    for x2d, x3d in _batches(rf):
        opt_t.zero_grad()
        pred = ref(torch.from_numpy(x2d))
        loss = reference_modules.loss.mpjpe(pred, torch.from_numpy(x3d))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    # --- jax side: same batches, the torch-exact optimizer ---
    from videopose3d_tpu.train import make_optimizer
    optimizer = make_optimizer(LR)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, state, opt_state, x2d, x3d):
        def loss_fn(p):
            pred, new_state = forward_strided(cfg, p, state, x2d, train=True,
                                              momentum=0.1, rng=None)
            return jnp.mean(jnp.linalg.norm(pred - x3d, axis=-1)), new_state
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    losses_j = []
    for x2d, x3d in _batches(rf):
        params, state, opt_state, loss = step(
            params, state, opt_state, jnp.asarray(x2d), jnp.asarray(x3d))
        losses_j.append(float(loss))

    losses_t, losses_j = np.array(losses_t), np.array(losses_j)
    # Same trajectory: tight at the start, tolerance widening with the
    # accumulated f32/optimizer-implementation drift.
    np.testing.assert_allclose(losses_j[:5], losses_t[:5], rtol=1e-5)
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4)
    # Losses actually decreased (this is a learnable task).
    assert losses_t[-1] < 0.85 * losses_t[0]

    # The optimized weights land in the same place.
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    w_t = sd["layers_conv.0.weight"]  # torch layout (C_out, C_in, k)
    w_j = np.transpose(np.asarray(params["layers_conv"][0]["weight"]),
                       (2, 1, 0))
    np.testing.assert_allclose(w_j, w_t, rtol=2e-3, atol=2e-5)
