"""Evaluation: whole-sequence inference with test-time augmentation and the four
protocols (MPJPE / P-MPJPE / N-MPJPE / MPJVE).

Parity target: ``/root/reference/run.py:652-721`` (``evaluate``) and the action-wise
reporting at ``:784-862``.

TPU notes: each video runs through the dilated model as one (1 or 2, T, J, C)
tensor; lengths are bucketed by the ``UnchunkedBatcher`` so XLA compiles O(few)
graph variants instead of one per video.  The TTA un-flip + average runs on device;
Procrustes (P2) and velocity metrics run on host exactly like the reference
(``run.py:698-704``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videopose3d_tpu.models.temporal import TemporalModelConfig, forward_dilated
from videopose3d_tpu.ops.losses import (mpjpe_np, n_mpjpe_np, p_mpjpe,
    mean_velocity_error)


class Evaluator:
    """Jitted whole-sequence inference, cached per (bucketed) input length.

    Engines:
      * ``"xla"`` (default) — metric-grade: full-precision matmuls, protocol
        errors reported to 0.1 mm.
      * ``"fused"`` — the Pallas fused residual-block kernel at the model's
        compute dtype (~15% faster at bf16).
      * ``"int8"`` — w8a8 serving kernels (2x MXU throughput + half the HBM
        traffic).  Quantization scales are calibrated from the first predicted
        batch (representative eval data); call :meth:`reset_quantization`
        after swapping weights.  mm-level accuracy vs bf16 — bulk serving, not
        metric evaluation.
    """

    def __init__(self, model_cfg: TemporalModelConfig,
                 joints_flip_perm: Optional[np.ndarray] = None,
                 fused: bool = False, engine: Optional[str] = None):
        self.engine = engine or ("fused" if fused else "xla")
        if self.engine not in ("xla", "fused", "int8"):
            raise ValueError(f"unknown engine {self.engine!r}")
        if self.engine == "xla" and model_cfg.compute_dtype != "float32":
            # Metric-grade promise: weights are stored f32, so evaluate in f32
            # even when the model was configured with a bf16 training compute
            # dtype (the cast in _conv_matmul would otherwise defeat the
            # default_matmul_precision("highest") guard below).
            import dataclasses
            model_cfg = dataclasses.replace(model_cfg, compute_dtype="float32")
        self.model_cfg = model_cfg
        self.joints_flip_perm = (None if joints_flip_perm is None
                                 else tuple(int(i) for i in joints_flip_perm))
        self._infer = jax.jit(
            self._infer_impl, static_argnames=("augment",))
        self._infer_q = jax.jit(
            self._infer_int8_impl, static_argnames=("augment",))
        self._q = None
        self._q_key = None
        self._q_ref = None
        self._calibration_batch = None
        # Per-device copies of the weights (or quantized-weights) pytree for
        # round-robin dispatch over local devices:
        # {device: (weights_key, placed_tree, keyed_source_tree)}.  The third
        # element deliberately holds a strong ref to the source tree so the
        # id()-tuple key cannot be recycled by gc into a false hit (it also
        # pins the previous weights until the device is next touched — an
        # accepted cost, see _on_device).
        self._dev_cache = {}
        # Stable identities for fused inference+loss programs: these close
        # over self only, so DeviceEvalSet's jit cache keys stay valid across
        # epochs (fresh lambdas per call would retrace every epoch).
        self._raw_infer = lambda w, b: self._infer_impl(w[0], w[1], b,
                                                        augment=False)
        self._raw_infer_q = lambda q, b: self._infer_int8_impl(q, b,
                                                               augment=False)

    def _tta_merge(self, pred, augment: bool):
        if not augment:
            return pred
        # Undo flipping on row 1 and average (parity: run.py:675-680).
        flipped = pred[1]
        flipped = flipped.at[..., 0].multiply(-1.0)
        if self.joints_flip_perm is not None:
            perm = jnp.asarray(np.array(self.joints_flip_perm, np.int32))
            flipped = flipped[:, perm]
        return (pred[0] + flipped)[None] * 0.5

    def _infer_impl(self, params, state, batch_2d, *, augment: bool):
        if self.engine == "fused":
            from videopose3d_tpu.models.temporal import forward_dilated_fused
            pred = forward_dilated_fused(self.model_cfg, params, state,
                                         batch_2d, t_tile=512)
        else:
            # Full-precision MXU matmuls for metric-grade inference.
            with jax.default_matmul_precision("highest"):
                pred, _ = forward_dilated(self.model_cfg, params, state,
                                          batch_2d, train=False)
        return self._tta_merge(pred, augment)

    def _infer_int8_impl(self, q, batch_2d, *, augment: bool):
        from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
            forward_dilated_int8)
        pred = forward_dilated_int8(self.model_cfg, q, batch_2d, t_tile=512)
        return self._tta_merge(pred, augment)

    def reset_quantization(self):
        self._q = None
        self._q_key = None
        self._q_ref = None
        self._dev_cache = {}

    def set_calibration(self, batch_2d) -> None:
        """Designate fixed calibration data for int8 activation scales.

        Without this, scales calibrate from whichever batch happens to be
        predicted first after a weight change — deterministic for the runner's
        fixed batcher order, but call-order-dependent for ad-hoc callers.

        Accepts one (B, T, J, C) batch or a LIST of batches (ragged T / B
        allowed): a list is flattened to one long time axis so the calibrated
        per-channel ranges cover several clips.  Coverage matters for trained
        models — ReLU channels silent on one clip can fire on another (see
        ``quantize_temporal_model``)."""
        if isinstance(batch_2d, (list, tuple)):
            flat = [np.asarray(b, np.float32).reshape(
                (1, -1) + np.asarray(b).shape[-2:]) for b in batch_2d]
            batch_2d = np.concatenate(flat, axis=1)
        self._calibration_batch = jnp.asarray(batch_2d)
        self.reset_quantization()

    @staticmethod
    def _weights_key(params, state):
        """Cache key for the quantized-weights pytree: the identity of every
        leaf buffer.  Replacing any leaf (or the tree) triggers
        requantization; only in-place mutation of a leaf's *contents* (numpy
        arrays mutated under the same object — jax arrays are immutable) is
        undetectable, which callers must signal via reset_quantization()."""
        return tuple(map(id, jax.tree_util.tree_leaves((params, state))))

    def _on_device(self, tree, key, device):
        """Cached per-device copy of a weights pytree (keyed by the weight
        buffers' identities, so a weight swap invalidates every device)."""
        hit = self._dev_cache.get(device)
        if hit is not None and hit[0] == key:
            return hit[1]
        placed = jax.device_put(tree, device)
        # Hold the keyed tree too: the id()-tuple key is only sound while
        # the original leaves stay alive (a gc'd tree could recycle ids
        # into a false hit — the same guard ``_q_ref`` gives the quantized
        # path; for f32 the keyed tree IS the weights, so keep it here).
        self._dev_cache[device] = (key, placed, tree)
        return placed

    def predict_async(self, params, state, batch_2d, augment: bool,
                      device=None):
        """Dispatch inference WITHOUT fetching: returns the prediction as an
        un-fetched device array (same shape contract as :meth:`predict`).

        Callers that queue several videos before touching any result overlap
        device compute with host-side metric work (JAX async dispatch) and —
        with ``device`` cycling over ``jax.local_devices()`` — spread the
        eval epoch across every chip the process owns instead of just one
        (the train step scales with DP; per-video eval otherwise does not).
        """
        # On a multi-host pod the trained weights arrive as pod-global
        # replicated arrays; evaluation is a per-process local computation
        # (every process evaluates the full set redundantly, mirroring the
        # reference's single-device eval, run.py:424-549), so take this
        # process's local replica (zero-copy; no-op single-process).
        from videopose3d_tpu.parallel import local_replica
        params, state = local_replica((params, state))
        if self.engine == "int8":
            key = self._weights_key(params, state)
            if self._q is None or self._q_key != key:
                # Requantize whenever different weight buffers arrive — the
                # cached scales would otherwise silently serve stale weights.
                from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
                    quantize_temporal_model)
                calib = (jnp.asarray(batch_2d)
                         if self._calibration_batch is None
                         else self._calibration_batch)
                self._q = quantize_temporal_model(
                    self.model_cfg, params, state, calib)
                self._q_key = key
                # Strong reference: keeps the keyed leaf buffers alive so a
                # gc'd tree can't recycle ids into a false cache hit.
                self._q_ref = (params, state)
                self._dev_cache = {}
            q = (self._q if device is None
                 else self._on_device(self._q, self._q_key, device))
            batch_2d = (jnp.asarray(batch_2d) if device is None
                        else jax.device_put(np.asarray(batch_2d), device))
            return self._infer_q(q, batch_2d, augment=augment)
        if device is None:
            batch_2d = jnp.asarray(batch_2d)
        else:
            key = self._weights_key(params, state)
            params, state = self._on_device((params, state), key, device)
            batch_2d = jax.device_put(np.asarray(batch_2d), device)
        return self._infer(params, state, batch_2d, augment=augment)

    def predict(self, params, state, batch_2d, augment: bool) -> np.ndarray:
        """(rows, T_in, J, C) padded keypoints -> (1, T_out, J_out, 3) poses."""
        return np.asarray(self.predict_async(params, state, batch_2d,
                                             augment))

    def infer_fn_and_weights(self, params, state, calib_batch=None):
        """(raw traceable ``fn(weights, batch_2d) -> pred``, weights tree,
        cache key) for building fused inference+loss device programs
        (:class:`DeviceEvalSet`).  Engine-aware: for int8 the weights tree is
        the quantized pytree, calibrated from ``set_calibration`` data or
        ``calib_batch`` (the caller's first batch — same fallback as
        :meth:`predict`)."""
        from videopose3d_tpu.parallel import local_replica
        params, state = local_replica((params, state))
        if self.engine == "int8":
            key = self._weights_key(params, state)
            if self._q is None or self._q_key != key:
                calib = (self._calibration_batch
                         if self._calibration_batch is not None
                         else calib_batch)
                if calib is None:
                    raise ValueError(
                        "int8 loss programs need set_calibration() or a "
                        "calib_batch (no batch has established scales)")
                from videopose3d_tpu.ops.pallas.temporal_block_int8 import (
                    quantize_temporal_model)
                self._q = quantize_temporal_model(
                    self.model_cfg, params, state, calib)
                self._q_key = key
                self._q_ref = (params, state)
                self._dev_cache = {}
            return self._raw_infer_q, self._q, self._q_key
        key = self._weights_key(params, state)
        return self._raw_infer, (params, state), key

    def weights_on_device(self, weights, key, device):
        """Public alias of the per-device weights cache (see ``_on_device``)."""
        if device is None:
            return weights
        return self._on_device(weights, key, device)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _device_losses_step(fns, pattern, pad, acc, w, wt, arrays):
    """acc (3,) += n * [mpjpe, traj mpjpe, 2D reconstruction mpjpe].

    Module-level (not a per-instance jit) so the fused inference+loss
    program for a given (infer fns, pattern, pad, bucket shape) compiles
    ONCE even when several :class:`DeviceEvalSet` instances share it — the
    runner keeps three (test/train/semi) whose videos land in the same
    buckets, and through the remote-compile tunnel each duplicate compile
    costs minutes."""
    from videopose3d_tpu.ops.camera import project_to_2d
    from videopose3d_tpu.ops.losses import mpjpe
    ev_fn, traj_fn = fns
    has_target, has_traj, has_cam = pattern
    batch_2d = arrays["batch_2d"]
    n = arrays["n"]
    pred = ev_fn(w, batch_2d)
    mask = (jnp.arange(pred.shape[1]) < n)[None]
    zero = jnp.float32(0.0)
    l3d = (mpjpe(pred, arrays["target"], mask=mask) if has_target
           else zero)
    ltraj = zero
    lrecon = zero
    # Gate on (has_target or has_cam) too: a video with neither a 3D target
    # nor a camera would leave both traj losses zero, so the trajectory
    # forward would be a wasted full inference.
    if has_traj and (has_target or has_cam):
        pred_traj = traj_fn(wt, batch_2d)
        if has_target:
            ltraj = mpjpe(pred_traj, arrays["traj_target"], mask=mask)
        if has_cam:
            t_out = pred.shape[1]
            t2d = jax.lax.dynamic_slice_in_dim(
                batch_2d[:1, :, :, :2], pad, t_out, axis=1)
            recon = project_to_2d(pred + pred_traj, arrays["cam"])
            lrecon = mpjpe(recon, t2d, mask=mask)
    return acc + n * jnp.stack([l3d, ltraj, lrecon])


class DeviceEvalSet:
    """Device-resident per-epoch evaluation with on-device losses.

    The reference's per-epoch eval keeps predictions AND targets on the GPU
    and only brings scalar losses to host (``run.py:424-549``); the original
    TPU port instead fetched every prediction (110 MB/epoch at H36M scale —
    harmless on an attached chip, ~11 s through a 10 MB/s dispatch relay).
    This class restores the reference's shape: every video's padded 2D input,
    zero-padded root-zeroed 3D target (and trajectory target / camera for the
    semi-supervised losses) is uploaded ONCE at construction; each epoch runs
    one fused inference+masked-loss program per video (round-robin over
    ``devices``), accumulates frame-weighted loss sums in a per-device (3,)
    carry, and fetches only those carries.

    Numerics: identical math to the host path except the frame-weighted sum
    accumulates in device f32 instead of host f64 (sub-1e-6 relative at
    dataset scale; the per-video losses were f32 either way).
    """

    def __init__(self, batcher, *, pad: int = 0, with_traj: bool = False,
                 shard=None, devices=None):
        self.pad = pad
        self.with_traj = with_traj
        self.shard = shard
        self.devices = list(devices) if devices else [None]
        self._videos = []
        self.n_frames = 0
        for seq_i, (cam, batch_3d, batch_2d, n) in enumerate(
                batcher.next_epoch()):
            if shard is not None and seq_i % shard[1] != shard[0]:
                continue
            di = len(self._videos) % len(self.devices)
            dev = self.devices[di]

            def put(a):
                a = np.ascontiguousarray(a, np.float32)
                return (jnp.asarray(a) if dev is None
                        else jax.device_put(a, dev))

            t_out = batch_2d.shape[1] - 2 * pad
            arrays = {"batch_2d": put(batch_2d[:1]),
                      "n": put(np.float32(n))}
            if batch_3d is not None:
                tgt = np.zeros((1, t_out) + batch_3d.shape[2:], np.float32)
                tgt[0, :n] = batch_3d[0]
                if with_traj:
                    arrays["traj_target"] = put(tgt[:, :, :1])
                tgt[:, :, 0] = 0.0
                arrays["target"] = put(tgt)
            if with_traj and cam is not None:
                arrays["cam"] = put(np.asarray(cam)[:1])
            self._videos.append((di, arrays))
            self.n_frames += n

    def losses(self, evaluator, params, state, *, traj_evaluator=None,
               traj_params=None, traj_state=None):
        """One epoch of frame-weighted eval losses.

        Returns (loss_3d, loss_traj, loss_2d, n_total) exactly like the host
        helper; on a pod the partial sums are all-gathered so every process
        returns identical totals."""
        if not self._videos:
            # Empty shard (more pod processes than eval videos, or an action
            # subset that left this round-robin slot empty): skip building
            # the inference programs entirely — the int8 engine would raise
            # for want of calibration data on THIS process only, leaving the
            # others blocked in the pod all-gather below.
            return self._reduce(np.zeros((3,), np.float64))
        calib = self._videos[0][1]["batch_2d"]
        ev_fn, w, w_key = evaluator.infer_fn_and_weights(params, state,
                                                         calib_batch=calib)
        traj_fn, wt, wt_key = (traj_evaluator.infer_fn_and_weights(
            traj_params, traj_state, calib_batch=calib)
            if traj_evaluator is not None else (None, (), None))
        accs = [None] * len(self.devices)
        for di, arrays in self._videos:
            dev = self.devices[di]
            if accs[di] is None:
                z = np.zeros((3,), np.float32)
                accs[di] = (jnp.asarray(z) if dev is None
                            else jax.device_put(z, dev))
            w_d = evaluator.weights_on_device(w, w_key, dev)
            wt_d = (traj_evaluator.weights_on_device(wt, wt_key, dev)
                    if traj_evaluator is not None else ())
            pattern = ("target" in arrays,
                       traj_evaluator is not None,
                       "cam" in arrays)
            accs[di] = _device_losses_step((ev_fn, traj_fn), pattern,
                                           self.pad, accs[di],
                                           w_d, wt_d, arrays)
        total = np.zeros((3,), np.float64)
        for acc in accs:
            if acc is not None:
                total += np.asarray(acc, np.float64)
        return self._reduce(total)

    def _reduce(self, total):
        """Pod all-gather of the partial (3,) loss sums + frame-weighted
        normalization — shared by the populated and empty-shard paths so
        every process always reaches the collective."""
        n_total = self.n_frames
        if self.shard is not None and self.shard[1] > 1:
            from jax.experimental import multihost_utils
            parts = multihost_utils.process_allgather(
                np.concatenate([total, [np.float64(n_total)]]).astype(
                    np.float64))
            summed = np.asarray(parts).sum(axis=0)
            total, n_total = summed[:3], int(round(summed[3]))
        if n_total == 0:
            return 0.0, 0.0, 0.0, 0
        return (total[0] / n_total, total[1] / n_total, total[2] / n_total,
                n_total)


def evaluate(evaluator: Evaluator, params, state, batcher, *,
             action: Optional[str] = None, return_predictions: bool = False,
             verbose: bool = True,
             devices=None) -> Tuple[float, float, float, float]:
    """Run the four protocols over a batcher of whole videos.

    Parity: ``run.py:652-721``.  Errors are frame-weighted means, reported in mm.
    With ``return_predictions`` the first video's prediction array (camera space)
    is returned instead, as the reference does for rendering.

    ``devices``: optional list of local devices to round-robin the videos
    over (numerically invisible — every video runs the same program).
    Dispatch is two-phase either way: a bounded queue of videos is in flight
    before the first fetch, overlapping device compute (and any dispatch
    relay latency) with the host-side Procrustes/velocity work.
    """
    epoch_loss_3d_pos = 0.0
    epoch_loss_3d_pos_procrustes = 0.0
    epoch_loss_3d_pos_scale = 0.0
    epoch_loss_3d_vel = 0.0
    n_total = 0
    devs = list(devices) if devices else [None]
    in_flight = max(16, 8 * len(devs))
    pending = []

    def consume(item):
        nonlocal epoch_loss_3d_pos, epoch_loss_3d_pos_procrustes, \
            epoch_loss_3d_pos_scale, epoch_loss_3d_vel, n_total
        batch_3d, n_frames, pred = item
        pred = np.asarray(pred)[:, :n_frames]
        target = np.asarray(batch_3d[:1], np.float32).copy()
        target[:, :, 0] = 0.0

        # Protocols 1/3 on host numpy from the already-fetched predictions:
        # a device dispatch per video would serialize evaluation on the
        # dispatch latency (the predictions must come to host anyway for the
        # Procrustes/velocity protocols, exactly like the reference,
        # run.py:698-704).
        e1 = mpjpe_np(pred, target)
        e3 = n_mpjpe_np(pred, target)

        pred_flat = pred.reshape(-1, pred.shape[-2], pred.shape[-1])
        target_flat = target.reshape(-1, target.shape[-2], target.shape[-1])
        e2 = float(p_mpjpe(pred_flat, target_flat))
        ev = float(mean_velocity_error(pred_flat, target_flat))

        n = target.shape[0] * target.shape[1]
        epoch_loss_3d_pos += n * e1
        epoch_loss_3d_pos_scale += n * e3
        epoch_loss_3d_pos_procrustes += n * e2
        epoch_loss_3d_vel += n * ev
        n_total += n

    for seq_i, (_, batch_3d, batch_2d, n_frames) in enumerate(
            batcher.next_epoch()):
        pred = evaluator.predict_async(params, state, batch_2d,
                                       augment=batcher.augment_enabled(),
                                       device=devs[seq_i % len(devs)])
        if return_predictions:
            return np.asarray(pred)[:, :n_frames][0]
        pending.append((batch_3d, n_frames, pred))
        if len(pending) >= in_flight:
            consume(pending.pop(0))
    while pending:
        consume(pending.pop(0))

    if n_total == 0:
        raise ValueError(
            "no frames to evaluate (every sequence was empty after "
            "downsampling)")
    e1 = epoch_loss_3d_pos / n_total * 1000
    e2 = epoch_loss_3d_pos_procrustes / n_total * 1000
    e3 = epoch_loss_3d_pos_scale / n_total * 1000
    ev = epoch_loss_3d_vel / n_total * 1000

    if verbose:
        print("----------" if action is None else "----" + action + "----")
        print("Test time augmentation:", batcher.augment_enabled())
        print("Protocol #1 Error (MPJPE):", e1, "mm")
        print("Protocol #2 Error (P-MPJPE):", e2, "mm")
        print("Protocol #3 Error (N-MPJPE):", e3, "mm")
        print("Velocity Error (MPJVE):", ev, "mm")
        print("----------")
    return e1, e2, e3, ev


def evaluate_actionwise(evaluator: Evaluator, params, state, all_actions: Dict,
                        make_batcher, *, action_filter=None, verbose=True,
                        devices=None):
    """Action-wise evaluation + averages (parity: ``run.py:825-854``).

    Args:
      all_actions: {action_name: [(subject, action), ...]}.
      make_batcher: callable mapping a list of (subject, action) pairs to an
        UnchunkedBatcher (the CLI layer supplies dataset access).
      devices: optional local devices to round-robin videos over (see
        :func:`evaluate`).
    """
    errors_p1, errors_p2, errors_p3, errors_vel = [], [], [], []
    for action_key in all_actions.keys():
        if action_filter is not None:
            if not any(action_key.startswith(a) for a in action_filter):
                continue
        batcher = make_batcher(all_actions[action_key])
        e1, e2, e3, ev = evaluate(evaluator, params, state, batcher,
                                  action=action_key, verbose=verbose,
                                  devices=devices)
        errors_p1.append(e1)
        errors_p2.append(e2)
        errors_p3.append(e3)
        errors_vel.append(ev)

    if verbose:
        print("Protocol #1   (MPJPE) action-wise average:",
              round(float(np.mean(errors_p1)), 1), "mm")
        print("Protocol #2 (P-MPJPE) action-wise average:",
              round(float(np.mean(errors_p2)), 1), "mm")
        print("Protocol #3 (N-MPJPE) action-wise average:",
              round(float(np.mean(errors_p3)), 1), "mm")
        print("Velocity      (MPJVE) action-wise average:",
              round(float(np.mean(errors_vel)), 2), "mm")
    return (float(np.mean(errors_p1)), float(np.mean(errors_p2)),
            float(np.mean(errors_p3)), float(np.mean(errors_vel)))
