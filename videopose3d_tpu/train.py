"""Training engine: jitted train steps over the on-device data pipeline.

Capability parity target: the training half of ``/root/reference/run.py`` —
supervised loop (:399-420), semi-supervised loop (:319-398), Adam(amsgrad)
optimizer (:252-264), exponential lr decay (:583-587) and BatchNorm momentum decay
(:589-593).

TPU-first design
----------------
One jitted step fuses *everything*: batch assembly (gathers over the HBM-resident
flat dataset), horizontal-flip augmentation, root-centering, the strided
forward/backward, the optimizer update.  The only per-step host->device traffic is
a ``(B, 4)`` int32 chunk-descriptor array (vs. the reference re-uploading the full
float batch each step, ``run.py:402-406``).  Learning rate and BatchNorm momentum
are traced scalars, so the per-epoch schedules never retrace.

Data parallelism: pass a ``Mesh`` and the step is jitted with the batch axis
sharded over ``data``; everything else replicated.  XLA inserts the gradient and
BatchNorm-statistics all-reduces over ICI (see ``parallel/mesh.py``).

Static-shape note: the final partial batch of each epoch is padded with repeated
rows; losses mask them out.  BatchNorm batch statistics do include the padded rows
(the reference instead runs a smaller final batch) — a one-batch-per-epoch
stochastic difference with no measurable effect, documented here for the record.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from videopose3d_tpu.data.generators import assemble_chunked_batch
from videopose3d_tpu.models.temporal import (
    TemporalModelConfig,
    forward_dilated,
    forward_strided,
)
from videopose3d_tpu.ops.camera import project_to_2d, project_to_2d_linear


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    """Schedule / loss-composition hyperparameters
    (CLI parity: ``/root/reference/common/arguments.py:35-59``)."""

    batch_size: int              # chunks per step (= --batch-size // --stride)
    chunk_length: int            # --stride
    pad: int
    causal_shift: int
    learning_rate: float = 1e-3
    lr_decay: float = 0.95
    epochs: int = 60
    initial_momentum: float = 0.1
    final_momentum: float = 0.001
    use_strided: bool = True     # TemporalModelOptimized1f selection (run.py:172-175)
    # Semi-supervised terms (run.py:319-398):
    warmup: int = 1
    bone_length_term: bool = True
    no_proj: bool = False
    linear_projection: bool = False
    # 2D-window batch-assembly copy engine: "auto" uses the Pallas DMA-ring
    # gather (ops/pallas/gather_rows.py, bitwise-equal) when the dataset was
    # uploaded with to_device(flatten_2d=True) on a single TPU device, and
    # the XLA row gather otherwise.  "pallas_interpret" is for CPU tests.
    gather_impl: str = "auto"

    def __post_init__(self):
        if self.gather_impl not in ("auto", "xla", "pallas",
                                    "pallas_interpret"):
            raise ValueError(
                f"gather_impl={self.gather_impl!r}: must be one of "
                "'auto', 'xla', 'pallas', 'pallas_interpret'")
        if self.use_strided and self.chunk_length != 1:
            # The strided form computes exactly one output frame per chunk
            # (run.py:172-175 only selects TemporalModelOptimized1f at
            # stride 1); longer chunks need the dilated form.
            raise ValueError(
                "use_strided=True requires chunk_length == 1 "
                f"(got {self.chunk_length}); pass use_strided=False "
                "to train with the dilated form")


def bn_momentum_for_epoch(cfg: TrainLoopConfig, epoch: int) -> float:
    """Exponential BatchNorm momentum decay 0.1 -> 0.001
    (parity: ``run.py:589-591``, evaluated at epoch+1 as the reference does)."""
    return cfg.initial_momentum * float(np.exp(
        -(epoch + 1) / cfg.epochs
        * np.log(cfg.initial_momentum / cfg.final_momentum)))


class _TorchAmsgradState(NamedTuple):
    count: jnp.ndarray
    m: Any
    v: Any
    vmax: Any


# Single source of truth for the AMSGrad hyperparameters: both the optax
# transformation and the fused one-pass apply below read these, so they can
# never drift apart (torch.optim.Adam defaults, run.py:252-253).
AMSGRAD_B1 = 0.9
AMSGRAD_B2 = 0.999
AMSGRAD_EPS = 1e-8


def scale_by_torch_amsgrad(b1: float = AMSGRAD_B1, b2: float = AMSGRAD_B2,
                           eps: float = AMSGRAD_EPS) -> optax.GradientTransformation:
    """torch.optim.Adam(amsgrad=True) semantics, exactly.

    optax's ``amsgrad`` differs from torch in where the bias correction and
    ``eps`` enter the denominator; the deltas are tiny per step but visible in
    the training trajectory by step 3.  Torch (the reference's optimizer,
    ``run.py:252-253``) computes::

        step = lr * (m_t / (1-b1^t)) / (sqrt(max(vmax, v_t)) / sqrt(1-b2^t) + eps)

    Verified step-for-step against torch in tests/test_train_parity_torch.py.
    """

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return _TorchAmsgradState(count=jnp.zeros((), jnp.int32),
                                  m=zeros(), v=zeros(), vmax=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, updates)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, updates)
        vmax = jax.tree_util.tree_map(jnp.maximum, state.vmax, v)
        bc1 = 1 - jnp.power(b1, count.astype(jnp.float32))
        bc2_sqrt = jnp.sqrt(1 - jnp.power(b2, count.astype(jnp.float32)))
        out = jax.tree_util.tree_map(
            lambda m_, vm: (m_ / bc1) / (jnp.sqrt(vm) / bc2_sqrt + eps),
            m, vmax)
        return out, _TorchAmsgradState(count=count, m=m, v=v, vmax=vmax)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """Adam with AMSGrad (torch-exact), lr adjustable per epoch without
    retracing (parity: ``run.py:252-253``, ``:264``, ``:583-587``)."""

    def build(learning_rate):
        return optax.chain(scale_by_torch_amsgrad(),
                           optax.scale(-learning_rate))

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def fused_optimizer_apply(optimizer, grads, opt_state, params,
                          b1: float = AMSGRAD_B1, b2: float = AMSGRAD_B2,
                          eps: float = AMSGRAD_EPS):
    """One-pass AMSGrad update + apply: numerically identical (same float ops
    in the same order) to ``optimizer.update`` + ``optax.apply_updates``, but
    each parameter leaf's (m, v, vmax, param) are read and written in a
    single fused elementwise kernel.

    The chained form (scale_by_torch_amsgrad -> scale(-lr) -> apply_updates)
    measured ~2.5 ms of the 13.4 ms train step at B=1024/RF=243 — roughly 3x
    the one-pass HBM traffic of the optimizer state (~0.6 GB); XLA does not
    fuse across the three tree_maps' output boundaries.

    Returns (new_params, new_opt_state) with the exact ``make_optimizer``
    state pytree (checkpoint-compatible; falls back to the generic path for
    unrecognized optimizer states).  Callers that built the transformation
    with non-default betas/eps must pass the same values here — the state
    does not carry them (module constants keep the two default sets in
    lockstep).
    """
    inner = getattr(opt_state, "inner_state", None)
    if not (inner and isinstance(inner[0], _TorchAmsgradState)):
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state

    lr = opt_state.hyperparams["learning_rate"]
    ams: _TorchAmsgradState = inner[0]
    count = ams.count + 1
    bc1 = 1 - jnp.power(b1, count.astype(jnp.float32))
    bc2_sqrt = jnp.sqrt(1 - jnp.power(b2, count.astype(jnp.float32)))

    def leaf(g, m, v, vmax, p):
        m_ = b1 * m + (1 - b1) * g
        v_ = b2 * v + (1 - b2) * g * g
        vmax_ = jnp.maximum(vmax, v_)
        out = (m_ / bc1) / (jnp.sqrt(vmax_) / bc2_sqrt + eps)
        return m_, v_, vmax_, p + (-lr) * out

    flat_g, treedef = jax.tree_util.tree_flatten(grads)
    flat_m = treedef.flatten_up_to(ams.m)
    flat_v = treedef.flatten_up_to(ams.v)
    flat_vmax = treedef.flatten_up_to(ams.vmax)
    flat_p = treedef.flatten_up_to(params)
    outs = [leaf(*args) for args in zip(flat_g, flat_m, flat_v, flat_vmax,
                                        flat_p)]
    unflatten = treedef.unflatten
    new_ams = _TorchAmsgradState(
        count=count,
        m=unflatten([o[0] for o in outs]),
        v=unflatten([o[1] for o in outs]),
        vmax=unflatten([o[2] for o in outs]))
    new_params = unflatten([o[3] for o in outs])
    new_opt_state = opt_state._replace(
        # The inject_hyperparams wrapper keeps its own step count.
        count=opt_state.count + 1,
        inner_state=(new_ams,) + tuple(inner[1:]))
    return new_params, new_opt_state


def _feed(mesh, host, *, batch_axis: Optional[int] = None):
    """Host->device feed for a per-step jit input (descriptors, valid counts,
    momentum).  Single-process: plain ``asarray`` — jit reshards to the
    declared in_sharding.  Multi-host: build the global array explicitly, each
    process materializing only its addressable shards (no cross-process
    resharding of process-local arrays on the step path;
    ``parallel/mesh.py:host_array_to_global``).

    ``batch_axis``: which axis of ``host`` is sharded over the mesh's data
    axis (None = fully replicated) — must match the trainer's in_shardings.
    """
    if mesh is not None and jax.process_count() > 1:
        from jax.sharding import PartitionSpec
        from videopose3d_tpu.parallel.mesh import host_array_to_global
        if batch_axis is None:
            spec = PartitionSpec()
        else:
            axes = [None] * batch_axis + [mesh.axis_names[0]]
            spec = PartitionSpec(*axes)
        return host_array_to_global(np.asarray(host), mesh, spec)
    return jnp.asarray(host)


def _masked_sample_mean(per_sample, mask):
    """Mean over valid samples of per-sample scalars. mask: (B,) float."""
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _mpjpe_per_sample(pred, target):
    """(B,) per-sample MPJPE (mean over frames and joints)."""
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1), axis=(1, 2))


def _scan_segments(steps: int, scan_chunk: int):
    """Yield (lo, hi) step ranges splitting an epoch scan into programs of at
    most ``scan_chunk`` steps (0/None = the whole epoch as one program).  All
    segments but the last have exactly ``scan_chunk`` steps, so at most two
    distinct graph shapes ever compile."""
    if not scan_chunk or scan_chunk <= 0 or scan_chunk >= steps:
        yield 0, steps
        return
    for lo in range(0, steps, scan_chunk):
        yield lo, min(lo + scan_chunk, steps)


def _check_margins(dev, loop):
    """Fail fast when the dataset's baked margins don't cover this loop's
    windows: ``dynamic_slice`` clamps out-of-range starts, so a too-small
    margin would silently feed temporally shifted 2D windows misaligned with
    their 3D targets instead of erroring."""
    if not dev.has_contiguous or getattr(dev, "margins", None) is None:
        return
    from videopose3d_tpu.data.generators import FlatSequenceDataset
    need = FlatSequenceDataset.training_margins(
        loop.pad, loop.causal_shift, loop.chunk_length)
    if any(have < want for have, want in zip(dev.margins, need)):
        raise ValueError(
            f"dataset margins {dev.margins} do not cover the training windows "
            f"{need} required by pad={loop.pad}, "
            f"causal_shift={loop.causal_shift}, "
            f"chunk_length={loop.chunk_length}; rebuild the FlatSequenceDataset "
            "with FlatSequenceDataset.training_margins(...) for this model")


def _device_data_dict(dev, with_cameras=False):
    """Extract the device arrays the batch-assembly path needs.  Prefers the
    contiguous fast path (margin-padded arrays) when the dataset was built
    with margins.  Shared by both trainers."""
    # The dict's key set is part of the jit cache key, so the presence of
    # "base_2d" (vs "seq_bounds") statically selects the assembly path.
    if dev.has_contiguous:
        d = {"flat_2d": dev.flat_2d_padded, "flat_3d": dev.flat_3d_padded,
             "base_2d": dev.base_2d, "base_3d": dev.base_3d}
    else:
        d = {"flat_2d": dev.flat_2d, "flat_3d": dev.flat_3d,
             "seq_bounds": dev.seq_bounds}
    if with_cameras:
        d["cameras"] = dev.cameras
    return {k: v for k, v in d.items() if v is not None}


def _assemble_batch(loop, kps_flip_perm, joints_flip_perm, data, meta, *,
                    with_3d=True, with_cameras=False, aug=(0, 0),
                    gather="xla", joint_axis_2d=False):
    """On-device chunked-batch assembly from descriptors.  Shared by both
    trainers (the semi-supervised one assembles labeled and unlabeled halves
    with the same geometry)."""
    common = dict(pad=loop.pad, causal_shift=loop.causal_shift,
                  chunk_length=loop.chunk_length,
                  kps_flip_perm=kps_flip_perm,
                  joints_flip_perm=joints_flip_perm,
                  with_3d=with_3d, with_cameras=with_cameras)
    if isinstance(gather, tuple):
        gather, cols_2d, gather_3d, cols_3d = gather
    else:
        cols_2d, gather_3d, cols_3d = 0, "xla", 0
    if "base_2d" in data:
        from videopose3d_tpu.data.generators import (
            assemble_chunked_batch_contiguous)
        return assemble_chunked_batch_contiguous(
            data["flat_2d"], data.get("flat_3d"), data.get("cameras"),
            data["base_2d"], data.get("base_3d"), meta,
            aug_offset_2d=aug[0], aug_offset_3d=aug[1], gather_impl=gather,
            cols_2d=cols_2d, gather_impl_3d=gather_3d, cols_3d=cols_3d,
            joint_axis_2d=joint_axis_2d, **common)
    return assemble_chunked_batch(
        data["flat_2d"], data.get("flat_3d"), data.get("cameras"),
        data["seq_bounds"], meta, **common)


def _resolve_gather(loop_cfg, mesh, dev):
    """Resolve the configured ``gather_impl`` against an uploaded dataset into
    the static ``(impl_2d, cols_2d, impl_3d, cols_3d)`` spec the step graphs
    key on.

    The Pallas DMA gather needs a rank-2 flattened stream with its DMA tail
    margin and an unsharded (mesh-free) step; on real TPU hardware it
    additionally needs the 128-lane-padded stream (``lane_pad_*`` — Mosaic
    only DMAs whole lane tiles).  "auto" falls back to "xla" per stream when
    any of that is missing.  The 2D side keeps strict forced semantics
    (forcing pallas on an ineligible 2D stream raises); the 3D side is
    opt-in via ``to_device(flatten_3d=True)`` and silently stays on "xla"
    otherwise, so forcing pallas on the common 2D-only-flattened datasets
    keeps working."""
    req = loop_cfg.gather_impl
    cols2 = int(getattr(dev, "cols_2d", None) or 0)
    cols3 = int(getattr(dev, "cols_3d", None) or 0)
    if req == "xla":
        return ("xla", cols2, "xla", cols3)

    def eligible(flat, margin):
        return (flat is not None and flat.ndim == 2 and margin >= 16
                and mesh is None)

    def on_tpu(flat):
        try:
            return next(iter(flat.devices())).platform == "tpu"
        except (AttributeError, TypeError):
            return False

    flat2 = getattr(dev, "flat_2d_padded", None)
    el2 = eligible(flat2, getattr(dev, "gather_margin_2d", 0))
    ln2 = el2 and flat2.shape[1] % 128 == 0
    if req in ("pallas", "pallas_interpret"):
        if not el2 or (req == "pallas" and not ln2):
            raise ValueError(
                f"gather_impl={req!r} needs the flattened contiguous "
                "stream (FlatSequenceDataset.to_device(flatten_2d=True"
                + (", lane_pad_2d=True)" if req == "pallas" else ")")
                + ", which carries the DMA tail margin) and mesh=None")
        impl2 = req
    else:
        impl2 = "pallas" if ln2 and on_tpu(flat2) else "xla"

    flat3 = getattr(dev, "flat_3d_padded", None)
    el3 = eligible(flat3, getattr(dev, "gather_margin_3d", 0))
    ln3 = el3 and flat3.shape[1] % 128 == 0
    if req == "pallas_interpret" and el3:
        impl3 = "pallas_interpret"
    elif ln3 and (req == "pallas" or on_tpu(flat3)):
        impl3 = "pallas"
    else:
        impl3 = "xla"
    return (impl2, cols2, impl3, cols3)


class SupervisedTrainer:
    """Owns the jitted supervised train step.

    Parity: ``run.py:399-420``.  Assemble + forward(strided) + masked MPJPE +
    Adam(amsgrad) update in one XLA computation.
    """

    def __init__(self, model_cfg: TemporalModelConfig, loop_cfg: TrainLoopConfig,
                 kps_flip_perm, joints_flip_perm, mesh=None):
        self.model_cfg = model_cfg
        self.loop_cfg = loop_cfg
        self.kps_flip_perm = tuple(int(i) for i in kps_flip_perm)
        self.joints_flip_perm = tuple(int(i) for i in joints_flip_perm)
        self.optimizer = make_optimizer(loop_cfg.learning_rate)
        self.mesh = mesh

        jit_kwargs = {"donate_argnums": (0, 1, 2, 3),
                      "static_argnums": (8, 9)}
        epoch_kwargs = {"donate_argnums": (0, 1, 2, 3),
                        "static_argnums": (8, 9)}
        if mesh is not None:
            from videopose3d_tpu.parallel.mesh import batch_sharding, replicated_sharding
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = replicated_sharding(mesh)
            bsh = batch_sharding(mesh)
            jit_kwargs["in_shardings"] = (
                rep, rep, rep, rep,          # params, state, opt_state, rng
                rep,                         # data dict (replicated prefix)
                bsh, rep, rep,               # meta, n_valid, momentum
            )
            # Epoch metas: (steps, B, 4) sharded on the batch axis (axis 1).
            meta_sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
            epoch_kwargs["in_shardings"] = (
                rep, rep, rep, rep,
                rep,
                meta_sh, rep, rep,
            )
        self._step = jax.jit(self._step_impl, **jit_kwargs)
        self._epoch = jax.jit(self._epoch_impl, **epoch_kwargs)

    def init_optimizer(self, params):
        return self.optimizer.init(params)

    def _gather_for(self, dev):
        return _resolve_gather(self.loop_cfg, self.mesh, dev)

    def _step_core(self, params, state, opt_state, rng, data, meta, n_valid,
                   momentum, aug=(0, 0), gather="xla"):
        cfg, loop = self.model_cfg, self.loop_cfg
        _, batch_3d, batch_2d = _assemble_batch(self.loop_cfg, self.kps_flip_perm,
                                        self.joints_flip_perm, data, meta, aug=aug,
                                        gather=gather)

        # Root-center: zero the hip, trajectory handled separately (run.py:407).
        batch_3d = batch_3d.at[:, :, 0].set(0.0)
        mask = (jnp.arange(meta.shape[0]) < n_valid).astype(jnp.float32)

        rng, dropout_rng = jax.random.split(rng)

        def loss_fn(p):
            fwd = forward_strided if loop.use_strided else forward_dilated
            pred, new_state = fwd(cfg, p, state, batch_2d, train=True,
                                  momentum=momentum, rng=dropout_rng)
            loss = _masked_sample_mean(_mpjpe_per_sample(pred, batch_3d), mask)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt_state = fused_optimizer_apply(
            self.optimizer, grads, opt_state, params)
        return new_params, new_state, new_opt_state, rng, loss

    def _step_impl(self, params, state, opt_state, rng, data, meta, n_valid,
                   momentum, aug, gather="xla"):
        return self._step_core(params, state, opt_state, rng, data, meta,
                               n_valid, momentum, aug, gather)

    def _epoch_impl(self, params, state, opt_state, rng, data, metas, n_valids,
                    momentum, aug, gather="xla"):
        """A whole epoch as one XLA program: lax.scan over the per-step chunk
        descriptors.  Removes all per-step host dispatch (the TPU-native answer
        to the reference's Python hot loop, run.py:401-420)."""

        def body(carry, xs):
            params, state, opt_state, rng = carry
            meta, n_valid = xs
            params, state, opt_state, rng, loss = self._step_core(
                params, state, opt_state, rng, data, meta, n_valid, momentum,
                aug, gather)
            return (params, state, opt_state, rng), loss

        (params, state, opt_state, rng), losses = jax.lax.scan(
            body, (params, state, opt_state, rng), (metas, n_valids))
        return params, state, opt_state, rng, losses

    def run_epoch(self, params, state, opt_state, rng, dev, metas, n_valids,
                  momentum, scan_chunk: int = 0):
        """Run one epoch in a single device program.

        Args:
          metas: (steps, B, 4) int32 chunk descriptors for every step.
          n_valids: (steps,) int32 valid-row counts.
          scan_chunk: if > 0, split the epoch scan into device programs of at
            most this many steps (plus one remainder-length program).  The
            scan is sequential so chunking is bit-identical to one long scan;
            it bounds compile time/memory at very long epochs (and works
            around a tunneled-TPU worker fault observed at ~3000-step f32
            scans).  At most two distinct graph shapes compile.

        Returns:
          (params, state, opt_state, rng, (steps,) per-step losses).
        """
        _check_margins(dev, self.loop_cfg)
        data = _device_data_dict(dev)
        aug = (dev.aug_offset_2d, dev.aug_offset_3d)
        gather = self._gather_for(dev)
        n_valids = np.asarray(n_valids, np.int32)
        losses = []
        for lo, hi in _scan_segments(metas.shape[0], scan_chunk):
            params, state, opt_state, rng, seg_losses = self._epoch(
                params, state, opt_state, rng, data,
                _feed(self.mesh, metas[lo:hi], batch_axis=1),
                _feed(self.mesh, n_valids[lo:hi]),
                _feed(self.mesh, np.float32(momentum)), aug, gather)
            losses.append(seg_losses)
        return (params, state, opt_state, rng,
                losses[0] if len(losses) == 1 else jnp.concatenate(losses))

    def step(self, params, state, opt_state, rng, dev, meta, n_valid, momentum):
        """One training step.  ``dev``: DeviceArrays for the labeled set."""
        _check_margins(dev, self.loop_cfg)
        return self._step(params, state, opt_state, rng, _device_data_dict(dev),
                          _feed(self.mesh, meta, batch_axis=0),
                          _feed(self.mesh, np.asarray(n_valid, np.int32)),
                          _feed(self.mesh, np.float32(momentum)),
                          (dev.aug_offset_2d, dev.aug_offset_3d),
                          self._gather_for(dev))


class SemiSupervisedTrainer:
    """Jitted semi-supervised step: pose model + trajectory model, joint optimizer.

    Loss composition parity (``run.py:319-398``):
      * supervised MPJPE on the labeled split of the concatenated batch;
      * inverse-depth-weighted trajectory MPJPE on the labeled split;
      * after ``warmup`` epochs: 2D reconstruction MPJPE of
        ``project(pose + traj, cam)`` against the input keypoints on the unlabeled
        split (differentiable distortion projection inside the graph), and a
        bone-length penalty |mean labeled bones - mean unlabeled bones|.

    Two step graphs are compiled: a warmup one (labeled batch only) and the full
    one (concatenated batch), mirroring the reference's ``skip`` branch.
    """

    def __init__(self, model_cfg: TemporalModelConfig, traj_cfg: TemporalModelConfig,
                 loop_cfg: TrainLoopConfig, kps_flip_perm, joints_flip_perm,
                 skeleton_parents, mesh=None):
        self.model_cfg = model_cfg
        self.traj_cfg = traj_cfg
        self.loop_cfg = loop_cfg
        self.kps_flip_perm = tuple(int(i) for i in kps_flip_perm)
        self.joints_flip_perm = tuple(int(i) for i in joints_flip_perm)
        self.parents = tuple(int(p) for p in skeleton_parents)
        self.optimizer = make_optimizer(loop_cfg.learning_rate)
        self.mesh = mesh

        jit_kwargs = {"donate_argnums": (0, 1, 2),
                      "static_argnums": (11, 12, 13)}
        epoch_kwargs = {"donate_argnums": (0, 1, 2),
                        "static_argnums": (11, 12, 13)}
        if mesh is not None:
            from videopose3d_tpu.parallel.mesh import batch_sharding, replicated_sharding
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = replicated_sharding(mesh)
            bsh = batch_sharding(mesh)
            jit_kwargs["in_shardings"] = (
                rep, rep, rep, rep,           # params, states, opt_state, rng
                rep, rep,                     # data, data_semi (dict prefixes)
                bsh, rep, bsh, rep, rep,      # meta, n_valid, meta_semi, n_valid_semi, momentum
            )                                 # (skip is static)
            meta_sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
            epoch_kwargs["in_shardings"] = (
                rep, rep, rep, rep,
                rep, rep,
                meta_sh, rep, meta_sh, rep, rep,
            )
        self._step = jax.jit(self._step_impl, **jit_kwargs)
        self._epoch = jax.jit(self._epoch_impl, **epoch_kwargs)

    def init_optimizer(self, params):
        """``params`` = {"pos": ..., "traj": ...} — one optimizer over both models
        (parity: ``run.py:252-253``)."""
        return self.optimizer.init(params)

    def _step_impl(self, params, states, opt_state, rng, data, data_semi,
                   meta, n_valid, meta_semi, n_valid_semi, momentum, skip: bool,
                   augs=((0, 0), (0, 0)), gathers=("xla", "xla")):
        cfg, tcfg, loop = self.model_cfg, self.traj_cfg, self.loop_cfg

        # joint_axis_2d: both halves of the 2D concat must keep (B, T, J, F)
        # — the unlabeled keypoints double as the reprojection-loss target.
        _, batch_3d, batch_2d = _assemble_batch(self.loop_cfg, self.kps_flip_perm,
                                        self.joints_flip_perm, data, meta,
                                        aug=augs[0], gather=gathers[0],
                                        joint_axis_2d=True)

        inputs_traj = batch_3d[:, :, :1]                      # before root-zeroing
        batch_3d = batch_3d.at[:, :, 0].set(0.0)
        b_l = meta.shape[0]
        mask_l = (jnp.arange(b_l) < n_valid).astype(jnp.float32)

        if not skip:
            cam_semi, _, batch_2d_semi = _assemble_batch(
                self.loop_cfg, self.kps_flip_perm, self.joints_flip_perm,
                data_semi, meta_semi, with_3d=False, with_cameras=True,
                aug=augs[1], gather=gathers[1], joint_axis_2d=True)
            inputs_2d_cat = jnp.concatenate([batch_2d, batch_2d_semi], axis=0)
            mask_u = (jnp.arange(meta_semi.shape[0]) < n_valid_semi).astype(jnp.float32)
        else:
            inputs_2d_cat = batch_2d
            mask_u = None

        rng, drop_pos, drop_traj = jax.random.split(rng, 3)

        def loss_fn(p):
            fwd = forward_strided if loop.use_strided else forward_dilated
            pred_pos_cat, new_state_pos = fwd(
                cfg, p["pos"], states["pos"], inputs_2d_cat, train=True,
                momentum=momentum, rng=drop_pos)
            pred_traj_cat, new_state_traj = fwd(
                tcfg, p["traj"], states["traj"], inputs_2d_cat, train=True,
                momentum=momentum, rng=drop_traj)

            # Supervised 3D loss on the labeled split (run.py:352).
            loss_pos = _masked_sample_mean(
                _mpjpe_per_sample(pred_pos_cat[:b_l], batch_3d), mask_l)

            # Inverse-depth-weighted trajectory loss (run.py:358-360).
            w = 1.0 / inputs_traj[..., 2]                      # (B, T, 1)
            dist_traj = jnp.linalg.norm(
                pred_traj_cat[:b_l] - inputs_traj, axis=-1)    # (B, T, 1)
            loss_traj = _masked_sample_mean(
                jnp.mean(w * dist_traj, axis=(1, 2)), mask_l)

            total = loss_pos + loss_traj
            loss_recon = jnp.float32(0.0)

            if not skip:
                pred_semi = pred_pos_cat[b_l:]
                if loop.pad > 0:
                    target_semi = batch_2d_semi[:, loop.pad:-loop.pad, :, :2]
                else:
                    target_semi = batch_2d_semi[..., :2]
                project = (project_to_2d_linear if loop.linear_projection
                           else project_to_2d)
                reconstruction = project(pred_semi + pred_traj_cat[b_l:], cam_semi)
                loss_recon = _masked_sample_mean(
                    _mpjpe_per_sample(reconstruction, target_semi), mask_u)
                if not loop.no_proj:
                    total = total + loss_recon

                if loop.bone_length_term:
                    parents = jnp.asarray(np.array(self.parents[1:], np.int32))
                    dists = (pred_pos_cat[:, :, 1:]
                             - pred_pos_cat[:, :, parents])
                    bones = jnp.mean(jnp.linalg.norm(dists, axis=-1), axis=1)  # (B, J-1)
                    mean_l = (jnp.sum(bones[:b_l] * mask_l[:, None], axis=0)
                              / jnp.maximum(jnp.sum(mask_l), 1.0))
                    mean_u = (jnp.sum(bones[b_l:] * mask_u[:, None], axis=0)
                              / jnp.maximum(jnp.sum(mask_u), 1.0))
                    total = total + jnp.mean(jnp.abs(mean_l - mean_u))

            new_states = {"pos": new_state_pos, "traj": new_state_traj}
            return total, (new_states, loss_pos, loss_traj, loss_recon)

        ((loss_total, (new_states, loss_pos, loss_traj, loss_recon)), grads) = (
            jax.value_and_grad(loss_fn, has_aux=True)(params))
        new_params, new_opt_state = fused_optimizer_apply(
            self.optimizer, grads, opt_state, params)
        return (new_params, new_states, new_opt_state, rng,
                loss_pos, loss_traj, loss_recon, loss_total)

    def step(self, params, states, opt_state, rng, dev, dev_semi,
             meta, n_valid, meta_semi, n_valid_semi, momentum, skip: bool):
        _check_margins(dev, self.loop_cfg)
        _check_margins(dev_semi, self.loop_cfg)
        return self._step(
            params, states, opt_state, rng,
            _device_data_dict(dev), _device_data_dict(dev_semi, with_cameras=True),
            _feed(self.mesh, meta, batch_axis=0),
            _feed(self.mesh, np.asarray(n_valid, np.int32)),
            _feed(self.mesh, meta_semi, batch_axis=0),
            _feed(self.mesh, np.asarray(n_valid_semi, np.int32)),
            _feed(self.mesh, np.float32(momentum)), bool(skip),
            ((dev.aug_offset_2d, dev.aug_offset_3d),
             (dev_semi.aug_offset_2d, dev_semi.aug_offset_3d)),
            (_resolve_gather(self.loop_cfg, self.mesh, dev),
             _resolve_gather(self.loop_cfg, self.mesh, dev_semi)))

    def _epoch_impl(self, params, states, opt_state, rng, data, data_semi,
                    metas, n_valids, metas_semi, n_valids_semi, momentum,
                    skip: bool, augs=((0, 0), (0, 0)),
                    gathers=("xla", "xla")):
        """Whole semi-supervised epoch as one XLA scan (see
        SupervisedTrainer._epoch_impl)."""

        def body(carry, xs):
            params, states, opt_state, rng = carry
            meta, n_valid, meta_semi, n_valid_semi = xs
            (params, states, opt_state, rng,
             loss_pos, loss_traj, loss_recon, loss_total) = self._step_impl(
                params, states, opt_state, rng, data, data_semi,
                meta, n_valid, meta_semi, n_valid_semi, momentum, skip, augs,
                gathers)
            return ((params, states, opt_state, rng),
                    (loss_pos, loss_traj, loss_recon, loss_total))

        (params, states, opt_state, rng), losses = jax.lax.scan(
            body, (params, states, opt_state, rng),
            (metas, n_valids, metas_semi, n_valids_semi))
        return params, states, opt_state, rng, losses

    def run_epoch(self, params, states, opt_state, rng, dev, dev_semi,
                  metas, n_valids, metas_semi, n_valids_semi, momentum,
                  skip: bool, scan_chunk: int = 0):
        """One semi-supervised epoch in a single device program.

        ``scan_chunk`` splits the scan into bounded-length device programs
        exactly like :meth:`SupervisedTrainer.run_epoch` (bit-identical).

        Returns (params, states, opt_state, rng, (loss_pos, loss_traj,
        loss_recon, loss_total) per-step vectors)."""
        _check_margins(dev, self.loop_cfg)
        _check_margins(dev_semi, self.loop_cfg)
        data = _device_data_dict(dev)
        data_semi = _device_data_dict(dev_semi, with_cameras=True)
        aug = ((dev.aug_offset_2d, dev.aug_offset_3d),
               (dev_semi.aug_offset_2d, dev_semi.aug_offset_3d))
        gathers = (_resolve_gather(self.loop_cfg, self.mesh, dev),
                   _resolve_gather(self.loop_cfg, self.mesh, dev_semi))
        n_valids = np.asarray(n_valids, np.int32)
        n_valids_semi = np.asarray(n_valids_semi, np.int32)
        seg_losses = []
        for lo, hi in _scan_segments(metas.shape[0], scan_chunk):
            params, states, opt_state, rng, losses = self._epoch(
                params, states, opt_state, rng, data, data_semi,
                _feed(self.mesh, metas[lo:hi], batch_axis=1),
                _feed(self.mesh, n_valids[lo:hi]),
                _feed(self.mesh, metas_semi[lo:hi], batch_axis=1),
                _feed(self.mesh, n_valids_semi[lo:hi]),
                _feed(self.mesh, np.float32(momentum)), bool(skip), aug,
                gathers)
            seg_losses.append(losses)
        if len(seg_losses) == 1:
            return params, states, opt_state, rng, seg_losses[0]
        joined = tuple(jnp.concatenate([s[i] for s in seg_losses])
                       for i in range(len(seg_losses[0])))
        return params, states, opt_state, rng, joined
