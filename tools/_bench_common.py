"""Shared fixture + timing scaffolding for the train-step measurement tools.

One implementation of (a) the synthetic flagship training dataset, (b) the
latency-cancelled ``lax.fori_loop`` step graph with the flat arrays as jit
ARGUMENTS (closure constants would bake them into the HLO and ship them
through the remote-compile hop — the round-4 bench-harness bug), and (c) the
two-endpoint slope timing with its mandatory both-graphs warmup, so the
floor-recheck suite (tools/recheck_floors.py) keeps a single methodology.
A warmup drift between hand-rolled copies already corrupted one tool's rep-0
readings once (exp_data_dtype_ab omitted the n=1 graph warmup; its remote
compile then landed inside the timed region and the slope went negative).

Used by exp_train_floor.py / exp_train_engine_ab.py / exp_data_dtype_ab.py;
tools/bench_step.py and tools/profile_step.py predate it and keep their own
multi-stage harnesses.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp


def flagship_cfg(**overrides):
    """The flagship measurement config: RF-243 dilated arch at 1024 channels,
    dropout 0.25 (the PARITY.md train-step numbers are quoted here)."""
    from videopose3d_tpu.models.temporal import TemporalModelConfig
    base = dict(num_joints_in=17, in_features=2, num_joints_out=17,
                filter_widths=(3, 3, 3, 3, 3), causal=False, dropout=0.25,
                channels=1024)
    base.update(overrides)
    return TemporalModelConfig(**base)


class TrainFixture:
    """Namespace holding the synthetic dataset, batch descriptors, model and
    optimizer state shared by every step graph of one tool run."""


def train_fixture(cfg, batch, seed=0, n_seqs=4, seq_len=3000):
    """Build the synthetic flagship training fixture.

    The dataset is margin-padded with baked flip copies (the production
    assembly path).  ``fx.ds`` is NOT uploaded — call ``fx.ds.to_device()``
    (or a variant) yourself so tools can A/B different uploads of the same
    host arrays.  The chunk-descriptor batch is random with flip bits set,
    matching tools/bench_step.py's shape.
    """
    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    from videopose3d_tpu.models.temporal import (init_temporal_model,
                                                 receptive_field)
    from videopose3d_tpu.train import make_optimizer

    fx = TrainFixture()
    rf = receptive_field(cfg)
    fx.pad = (rf - 1) // 2
    rng = np.random.default_rng(seed)
    poses_2d = [rng.standard_normal((seq_len, 17, 2)).astype(np.float32)
                for _ in range(n_seqs)]
    poses_3d = [rng.standard_normal((seq_len, 17, 3)).astype(np.float32)
                for _ in range(n_seqs)]
    perm17 = tuple(range(17))
    fx.ds = FlatSequenceDataset(
        poses_2d, poses_3d,
        margins=FlatSequenceDataset.training_margins(fx.pad, 0, 1),
        flip_perms=(perm17, perm17))

    meta = np.stack([
        rng.integers(0, n_seqs, batch),
        rng.integers(0, seq_len - 1, batch),
        np.zeros(batch, np.int64),
        rng.integers(0, 2, batch)], axis=1).astype(np.int32)
    meta[:, 2] = meta[:, 1] + 1
    fx.meta = jnp.asarray(meta)

    fx.params, fx.state = init_temporal_model(cfg, jax.random.PRNGKey(0))
    fx.optimizer = make_optimizer(1e-3)
    fx.opt_state = fx.optimizer.init(fx.params)
    fx.key = jax.random.PRNGKey(1)
    fx.momentum = jnp.float32(0.1)
    fx.assemble = functools.partial(
        assemble_chunked_batch_contiguous,
        pad=fx.pad, causal_shift=0, chunk_length=1,
        kps_flip_perm=perm17, joints_flip_perm=perm17,
        with_3d=True, with_cameras=False)
    return fx


def data_of(dev):
    """The flat-array jit-argument tuple of an uploaded dataset."""
    return (dev.flat_2d_padded, dev.flat_3d_padded, dev.base_2d, dev.base_3d)


def step_graph(cfg, fx, stage="step"):
    """Jitted n-iteration train graph over the fixture's assembly path.

    ``stage``: "fwd" (loss only), "fwdbwd" (adds value_and_grad + a
    grad-consuming reduce), "step" (adds the fused one-pass AMSGrad+apply —
    the production step).  ``n`` and the aug offsets are static; every
    distinct n compiles its own graph (see ``warm``).  Returns the final
    loss so callers can bitwise-compare trajectories across variants.
    """
    from videopose3d_tpu.models.temporal import forward_strided
    from videopose3d_tpu.train import fused_optimizer_apply

    def loss_of(p, b2, b3, k):
        pred, _ = forward_strided(cfg, p, fx.state, b2, train=True,
                                  momentum=fx.momentum, rng=k)
        return jnp.mean(jnp.linalg.norm(pred - b3, axis=-1))

    @functools.partial(jax.jit, static_argnums=(5, 6, 7))
    def run(params, opt_state, data, meta, key, n, aug2, aug3):
        def body(i, carry):
            params, opt_state, acc = carry
            # Data-dependent no-op so XLA cannot hoist the assembly+step out
            # of the loop: the descriptors depend on the running loss.
            meta_i = meta + (acc * 0).astype(jnp.int32)
            flat_2d, flat_3d, base_2d, base_3d = data
            _, b3, b2 = fx.assemble(flat_2d, flat_3d, None, base_2d, base_3d,
                                    meta_i, aug_offset_2d=aug2,
                                    aug_offset_3d=aug3)
            k = jax.random.fold_in(key, i)
            if stage == "fwd":
                return params, opt_state, loss_of(params, b2, b3, k)
            loss, grads = jax.value_and_grad(loss_of)(params, b2, b3, k)
            if stage == "fwdbwd":
                gsum = sum(jnp.sum(g) for g in
                           jax.tree_util.tree_leaves(grads))
                return params, opt_state, loss + gsum * 1e-30
            params, opt_state = fused_optimizer_apply(
                fx.optimizer, grads, opt_state, params)
            return params, opt_state, loss
        _, _, acc = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return acc

    return run


def run_graph(run, fx, dev, n):
    """Execute one graph to completion (the float() forces execution through
    the relay — block_until_ready on repeated identical calls is unreliable
    there, see CLAUDE.md)."""
    return float(run(fx.params, fx.opt_state, data_of(dev), fx.meta, fx.key,
                     n, dev.aug_offset_2d, dev.aug_offset_3d))


def warm(run, fx, dev, iters):
    """Compile BOTH static-n endpoint graphs (n=1 and n=iters).  Mandatory
    before ``timed_ms_per_step``: n is static, so the n=1 endpoint is its own
    graph — skipping this puts its minutes-long remote compile inside the
    first timed region and the slope goes hugely negative."""
    for n in (1, iters):
        run_graph(run, fx, dev, n)


def timed_ms_per_step(run, fx, dev, iters):
    """Latency-cancelled ms/step: slope between the n=1 and n=iters
    endpoints (both already warmed), cancelling the ~30 ms relay round-trip
    that dominates any single call."""
    t0 = time.perf_counter()
    run_graph(run, fx, dev, 1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_graph(run, fx, dev, iters)
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1e3
