"""End-to-end driver: data prep -> model build -> train/resume -> evaluate/render.

Capability parity target: ``/root/reference/run.py`` (861 lines) — same CLI, same
four modes (train, resume, evaluate, render), same printed epoch lines and
protocol reports, same checkpoint payload semantics.

TPU-first differences (see SURVEY.md §7):
  * the training step is one jitted XLA computation over device-resident data
    (no per-step host uploads, ``run.py:402-406`` eliminated);
  * the optimized strided model and the dilated eval model share one parameter
    pytree, so the per-epoch ``state_dict`` copy (``run.py:426``) disappears;
  * data parallelism over all local devices via GSPMD mesh sharding (opt out with
    ``--no-mesh``).
"""

from __future__ import annotations

import os
from time import time

import numpy as np

import jax
import jax.numpy as jnp

from videopose3d_tpu.arguments import parse_args
from videopose3d_tpu.checkpoint import (AsyncCheckpointer, save_checkpoint,
    load_checkpoint)
from videopose3d_tpu.data.generators import (
    FlatSequenceDataset, ChunkedPairSampler, UnchunkedBatcher)
from videopose3d_tpu.evaluate import (Evaluator, evaluate,
    evaluate_actionwise)
from videopose3d_tpu.models.convert import (
    params_from_torch_state_dict, params_to_torch_state_dict)
from videopose3d_tpu.models.temporal import (
    TemporalModelConfig, init_temporal_model, receptive_field, param_count)
from videopose3d_tpu.ops.camera import (
    normalize_screen_coordinates, world_to_camera, camera_to_world,
    image_coordinates, project_to_2d)
from videopose3d_tpu.ops.losses import mpjpe_np
from videopose3d_tpu.train import (
    TrainLoopConfig, SupervisedTrainer, SemiSupervisedTrainer,
    bn_momentum_for_epoch, set_learning_rate)
from videopose3d_tpu.utils import deterministic_random


# ---------------------------------------------------------------------------
# Data loading / preparation (parity: run.py:37-97)
# ---------------------------------------------------------------------------


def load_dataset(args):
    print("Loading dataset...")
    dataset_path = os.path.join(args.data_dir, "data_3d_" + args.dataset + ".npz")
    if args.dataset == "h36m":
        from videopose3d_tpu.datasets.h36m import Human36mDataset
        return Human36mDataset(dataset_path)
    elif args.dataset.startswith("humaneva"):
        from videopose3d_tpu.datasets.humaneva import HumanEvaDataset
        return HumanEvaDataset(dataset_path)
    elif args.dataset.startswith("custom"):
        from videopose3d_tpu.datasets.custom import CustomDataset
        return CustomDataset(os.path.join(
            args.data_dir, "data_2d_" + args.dataset + "_" + args.keypoints + ".npz"))
    raise KeyError("Invalid dataset")


def prepare_dataset_3d(dataset):
    """World->camera transform + root-relativization, keeping the global
    trajectory in joint 0 (parity: run.py:52-62)."""
    print("Preparing data...")
    for subject in dataset.subjects():
        for action in dataset[subject].keys():
            anim = dataset[subject][action]
            if "positions" in anim:
                positions_3d = []
                for cam in anim["cameras"]:
                    pos_3d = np.array(world_to_camera(
                        anim["positions"], R=cam["orientation"],
                        t=cam["translation"]))
                    pos_3d[:, 1:] -= pos_3d[:, :1]
                    positions_3d.append(pos_3d)
                anim["positions_3d"] = positions_3d


def _align_detections_with_mocap(dataset, detections):
    """Every mocap (subject, action, camera) must have a detection stream at
    least as long as its mocap stream; surplus detection frames (some H36M
    videos run past the mocap) are trimmed off in place."""
    for subject in dataset.subjects():
        if subject not in detections:
            raise KeyError(f"no 2D detections for subject {subject}")
        for action, anim in dataset[subject].items():
            if action not in detections[subject]:
                raise KeyError(f"no 2D detections for {subject}/{action}")
            if "positions_3d" not in anim:
                continue
            cams = detections[subject][action]
            if len(cams) != len(anim["positions_3d"]):
                raise ValueError(f"{subject}/{action}: {len(cams)} detection "
                                 f"cameras vs {len(anim['positions_3d'])} "
                                 "mocap cameras")
            for ci, mocap in enumerate(anim["positions_3d"]):
                if len(cams[ci]) < len(mocap):
                    raise ValueError(
                        f"{subject}/{action} cam {ci}: detection stream "
                        f"shorter than mocap ({len(cams[ci])} < {len(mocap)})")
                cams[ci] = cams[ci][:len(mocap)]


def _to_normalized_screen(dataset, detections):
    """Map pixel keypoints to aspect-preserving unit screen coordinates, in
    place (confidence columns beyond (x, y) pass through untouched)."""
    for subject, actions in detections.items():
        for cams in actions.values():
            for ci, kps in enumerate(cams):
                cam = dataset.cameras()[subject][ci]
                kps[..., :2] = np.asarray(normalize_screen_coordinates(
                    kps[..., :2], w=cam["res_w"], h=cam["res_h"]))


def load_2d_detections(args, dataset):
    """Load the 2D keypoint archive, trim to mocap length, normalize screen
    coordinates (behavior parity: run.py:64-97)."""
    print("Loading 2D detections...")
    archive = np.load(
        os.path.join(args.data_dir,
                     f"data_2d_{args.dataset}_{args.keypoints}.npz"),
        allow_pickle=True)
    keypoints_metadata = archive["metadata"].item()
    kps_left, kps_right = (list(side) for side in
                           keypoints_metadata["keypoints_symmetry"])
    detections = archive["positions_2d"].item()
    _align_detections_with_mocap(dataset, detections)
    _to_normalized_screen(dataset, detections)
    return detections, keypoints_metadata, kps_left, kps_right


def _subsample_sequences(seqs_2d, seqs_3d, step: int, subset: float):
    """Temporal downsampling by ``step``; with ``subset`` < 1 additionally keep
    one deterministic contiguous window per sequence (seeded by the sequence
    length, matching the reference's reproducible --subset selection,
    run.py:148-154)."""
    if subset < 1:
        for i, seq in enumerate(seqs_2d):
            kept = int(round(len(seq) // step * subset) * step)
            start = deterministic_random(0, len(seq) - kept + 1, str(len(seq)))
            window = slice(start, start + kept, step)
            seqs_2d[i] = seq[window]
            if seqs_3d is not None:
                seqs_3d[i] = seqs_3d[i][window]
    elif step > 1:
        seqs_2d[:] = [s[::step] for s in seqs_2d]
        if seqs_3d is not None:
            seqs_3d[:] = [s[::step] for s in seqs_3d]


def fetch(args, dataset, keypoints, subjects, action_filter=None, subset=1,
          parse_3d_poses=True):
    """Gather per-(subject, action, camera) sequences (behavior parity:
    run.py:110-163).  Returns (intrinsics | None, poses_3d | None, poses_2d),
    one list entry per camera view."""
    seqs_2d, seqs_3d, intrinsics = [], [], []
    for subject in subjects:
        for action, kp_cams in keypoints[subject].items():
            if action_filter is not None and not any(
                    action.startswith(a) for a in action_filter):
                continue

            seqs_2d.extend(kp_cams)

            subject_cams = dataset.cameras().get(subject)
            if subject_cams is not None:
                if len(subject_cams) != len(kp_cams):
                    raise ValueError(f"{subject}/{action}: camera count "
                                     "mismatch vs detections")
                intrinsics.extend(c["intrinsic"] for c in subject_cams
                                  if "intrinsic" in c)

            if parse_3d_poses and "positions_3d" in dataset[subject][action]:
                gt_cams = dataset[subject][action]["positions_3d"]
                if len(gt_cams) != len(kp_cams):
                    raise ValueError(f"{subject}/{action}: camera count "
                                     "mismatch vs mocap")
                seqs_3d.extend(gt_cams)

    seqs_3d = seqs_3d or None
    _subsample_sequences(seqs_2d, seqs_3d, args.downsample, subset)
    return (intrinsics or None), seqs_3d, seqs_2d


# ---------------------------------------------------------------------------
# Checkpoint interop
# ---------------------------------------------------------------------------


def load_any_checkpoint(path):
    """Load our pickle checkpoints, orbax checkpoint directories, or reference
    torch ``.bin`` files, returning state dicts as numpy arrays."""
    if (os.path.isdir(path) or os.path.isdir(path + ".old")
            or os.path.isdir(path + ".new")):
        # The .new/.old directories are the crash-recovery windows of the
        # orbax atomic-replace save; load_checkpoint_orbax prefers a
        # finalized .new (interrupted swap) and falls back to .old.
        from videopose3d_tpu.checkpoint import load_checkpoint_orbax
        return load_checkpoint_orbax(path)
    pickle_err = None
    try:
        chk = load_checkpoint(path)
        if isinstance(chk, dict) and "model_pos" in chk:
            return chk
    except FileNotFoundError:
        raise
    except Exception as e:
        pickle_err = e
    try:
        import torch  # CPU torch, for reading reference checkpoints only
        chk = torch.load(path, map_location="cpu", weights_only=False)
    except Exception as torch_err:
        if pickle_err is not None:
            # Surface the native-format failure too — a corrupted pickle would
            # otherwise masquerade as a torch-format error.
            raise RuntimeError(
                f"could not load checkpoint {path!r}: not a readable native "
                f"checkpoint ({pickle_err!r}) nor a torch .bin "
                f"({torch_err!r})") from torch_err
        raise
    out = dict(chk)
    for key in ("model_pos", "model_traj"):
        if out.get(key) is not None:
            out[key] = {k: np.asarray(v) for k, v in out[key].items()}
    out["optimizer"] = None  # torch optimizer state is not portable
    return out


def _flip_perm_from_lists(num, left, right):
    perm = np.arange(num)
    perm[list(left)] = list(right)
    perm[list(right)] = list(left)
    return perm


# ---------------------------------------------------------------------------
# Per-epoch evaluation losses (parity: run.py:424-549)
# ---------------------------------------------------------------------------


def _eval_batcher(args, pad, causal_shift, kps_perm, joints_perm,
                  cameras, poses_3d, poses_2d, *, augment=False):
    """Whole-sequence eval batcher with the CLI's bucketing options applied
    (one construction point for all five eval/render call sites)."""
    return UnchunkedBatcher(
        cameras, poses_3d, poses_2d, pad=pad, causal_shift=causal_shift,
        augment=augment, kps_flip_perm=kps_perm, joints_flip_perm=joints_perm,
        bucket=args.eval_bucket, bucket_pow2=args.eval_bucket_pow2)


def _eval_device_list(args):
    """Local devices to round-robin evaluation videos over.

    ``--eval-devices 0`` (auto, default): all local devices on accelerator
    platforms, one on CPU (virtual CPU devices share the same cores, so
    fanning out only multiplies compiles).  Returns None when a single device
    is selected (plain default-device dispatch, no device_put copies)."""
    local = jax.local_devices()
    n = int(getattr(args, "eval_devices", 0) or 0)
    if n <= 0:
        n = len(local) if local[0].platform != "cpu" else 1
    n = min(n, len(local))
    return local[:n] if n > 1 else None


def _epoch_eval_losses(evaluator, params, state, batcher, *, traj_evaluator=None,
                       traj_params=None, traj_state=None, pad=0, shard=None,
                       devices=None):
    """Frame-weighted MPJPE (and, when trajectory evaluation is requested, the
    trajectory MPJPE and 2D reconstruction loss) over whole sequences, eval mode,
    no TTA.

    Since round 4 the runner's epoch loop computes these losses on device
    (:class:`videopose3d_tpu.evaluate.DeviceEvalSet`); this host-side helper
    is retained as the independent parity ORACLE the DeviceEvalSet equality
    tests compare against (`tests/test_eval_devices.py`) — keep its
    semantics in lockstep with the device path.

    ``shard=(process_index, process_count)`` splits the videos round-robin
    across pod processes and all-gathers the partial frame-weighted sums —
    the per-epoch eval is per-process work that does NOT scale with DP
    (measured: ~5.2 s device/epoch at H36M scale vs a train epoch that
    divides by the pod size), so on a pod it must shard or it becomes the
    sweep bottleneck.  Every process returns identical totals.

    ``devices``: optional local devices to round-robin this process's videos
    over (numerically invisible).  Dispatch is two-phase regardless: a
    bounded number of videos stays in flight before the first fetch, so
    device compute and dispatch latency overlap the host metric work."""
    loss_3d = 0.0
    loss_traj = 0.0
    loss_2d = 0.0
    n_total = 0
    devs = list(devices) if devices else [None]
    in_flight = max(16, 8 * len(devs))
    pending = []

    def consume(item):
        nonlocal loss_3d, loss_traj, loss_2d, n_total
        cam, batch_3d, batch_2d, n_frames, pred, pred_traj = item
        pred = np.asarray(pred)[:, :n_frames]
        n = 1 * n_frames
        if batch_3d is not None:
            target = np.asarray(batch_3d, np.float32).copy()
            traj_target = target[:, :, :1].copy()
            target[:, :, 0] = 0.0
            loss_3d += n * mpjpe_np(pred, target)
        if pred_traj is not None:
            pred_traj = np.asarray(pred_traj)[:, :n_frames]
            if batch_3d is not None:
                loss_traj += n * mpjpe_np(pred_traj, traj_target)
            if cam is not None:
                target_2d = batch_2d[:1, pad:pad + n_frames, :, :2] if pad > 0 \
                    else batch_2d[:1, :n_frames, :, :2]
                # numpy inputs keep the projection on host (camera.py dispatch).
                recon = project_to_2d(
                    np.asarray(pred + pred_traj), np.asarray(cam[:1]))
                loss_2d += n * mpjpe_np(recon, target_2d)
        n_total += n

    k = 0
    for seq_i, (cam, batch_3d, batch_2d, n_frames) in enumerate(
            batcher.next_epoch()):
        if shard is not None and seq_i % shard[1] != shard[0]:
            continue
        d = devs[k % len(devs)]
        k += 1
        pred = evaluator.predict_async(params, state, batch_2d,
                                       augment=False, device=d)
        pred_traj = (traj_evaluator.predict_async(
                         traj_params, traj_state, batch_2d, augment=False,
                         device=d)
                     if traj_evaluator is not None else None)
        pending.append((cam, batch_3d, batch_2d, n_frames, pred, pred_traj))
        if len(pending) >= in_flight:
            consume(pending.pop(0))
    while pending:
        consume(pending.pop(0))
    if shard is not None and shard[1] > 1:
        # Pod-wide totals: every process contributes its round-robin share
        # and the frame-weighted sums combine exactly (f64 partial sums).
        from jax.experimental import multihost_utils
        parts = multihost_utils.process_allgather(
            np.asarray([loss_3d, loss_traj, loss_2d, float(n_total)],
                       np.float64))
        loss_3d, loss_traj, loss_2d, nt = np.asarray(parts).sum(axis=0)
        n_total = int(round(nt))
    if n_total == 0:
        return 0.0, 0.0, 0.0, 0
    return loss_3d / n_total, loss_traj / n_total, loss_2d / n_total, n_total


# ---------------------------------------------------------------------------
# Main
# ---------------------------------------------------------------------------


def main(argv=None):
    args = parse_args(argv)
    print(args)

    # Multi-host pod: join the jax distributed runtime BEFORE any API touches
    # a backend, so jax.devices() below is the global pod device set and the
    # data-parallel mesh spans every host (launcher env:
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; no-op
    # single-process).  The reference is single-device only (run.py:200-202).
    from videopose3d_tpu.parallel import initialize_distributed
    if initialize_distributed():
        from videopose3d_tpu.parallel import process_info
        info = process_info()
        print("INFO: distributed runtime: process %d/%d, %d local / %d global "
              "devices" % (info["process_index"], info["process_count"],
                           info["local_device_count"],
                           info["global_device_count"]))

    # Dropout-mask PRNG: the TPU hardware generator roughly halves train-step
    # time vs threefry at these mask volumes (~170M elements/step at RF 243).
    jax.config.update("jax_default_prng_impl", args.rng_impl)

    os.makedirs(args.checkpoint, exist_ok=True)
    if getattr(args, "checkpoint_format", "pickle") == "orbax":
        # Fail fast: background-thread save errors surface only at the NEXT
        # checkpoint epoch, which would silently discard a whole interval.
        from videopose3d_tpu.checkpoint import require_orbax
        require_orbax()

    dataset = load_dataset(args)
    prepare_dataset_3d(dataset)
    keypoints, keypoints_metadata, kps_left, kps_right = \
        load_2d_detections(args, dataset)
    joints_left = list(dataset.skeleton().joints_left())
    joints_right = list(dataset.skeleton().joints_right())

    subjects_train = args.subjects_train.split(",")
    subjects_semi = ([] if not args.subjects_unlabeled
                     else args.subjects_unlabeled.split(","))
    if not args.render:
        subjects_test = args.subjects_test.split(",")
    else:
        subjects_test = [args.viz_subject]

    semi_supervised = len(subjects_semi) > 0
    if semi_supervised and not dataset.supports_semi_supervised():
        raise RuntimeError(
            "Semi-supervised training is not implemented for this dataset")

    action_filter = None if args.actions == "*" else args.actions.split(",")
    if action_filter is not None:
        print("Selected actions:", action_filter)

    cameras_valid, poses_valid, poses_valid_2d = fetch(
        args, dataset, keypoints, subjects_test, action_filter)

    # --- model configs (parity: run.py:171-198) ---
    filter_widths = tuple(int(x) for x in args.architecture.split(","))
    num_kps = poses_valid_2d[0].shape[-2]
    in_features = poses_valid_2d[0].shape[-1]
    use_strided = (not args.disable_optimizations and not args.dense
                   and args.stride == 1)

    model_cfg = TemporalModelConfig(
        num_joints_in=num_kps, in_features=in_features,
        num_joints_out=dataset.skeleton().num_joints(),
        filter_widths=filter_widths, causal=args.causal, dropout=args.dropout,
        channels=args.channels, dense=args.dense,
        compute_dtype=args.compute_dtype, remat_blocks=args.remat,
        train_engine=args.train_engine)
    traj_cfg = TemporalModelConfig(
        num_joints_in=num_kps, in_features=in_features, num_joints_out=1,
        filter_widths=filter_widths, causal=args.causal, dropout=args.dropout,
        channels=args.channels, dense=args.dense,
        compute_dtype=args.compute_dtype, remat_blocks=args.remat)

    rf = receptive_field(model_cfg)
    print(f"INFO: Receptive field: {rf} frames")
    pad = (rf - 1) // 2
    if args.causal:
        print("INFO: Using causal convolutions")
        causal_shift = pad
    else:
        causal_shift = 0

    init_rng = jax.random.PRNGKey(args.seed)
    pos_rng, traj_rng, step_rng = jax.random.split(init_rng, 3)
    params, state = init_temporal_model(model_cfg, pos_rng)
    print("INFO: Trainable parameter count:", param_count(params))

    params_traj = state_traj = None

    kps_perm = _flip_perm_from_lists(num_kps, kps_left, kps_right)
    joints_perm = _flip_perm_from_lists(
        dataset.skeleton().num_joints(), joints_left, joints_right)

    # --- checkpoint load (parity: run.py:204-221) ---
    checkpoint = None
    if args.resume or args.evaluate:
        chk_filename = os.path.join(
            args.checkpoint, args.resume if args.resume else args.evaluate)
        print("Loading checkpoint", chk_filename)
        checkpoint = load_any_checkpoint(chk_filename)
        print("This model was trained for {} epochs".format(checkpoint["epoch"]))
        params, state = params_from_torch_state_dict(
            model_cfg, checkpoint["model_pos"])
        if args.evaluate and checkpoint.get("model_traj") is not None:
            params_traj, state_traj = params_from_torch_state_dict(
                traj_cfg, checkpoint["model_traj"])

    test_batcher = _eval_batcher(args, pad, causal_shift, kps_perm,
                                 joints_perm, cameras_valid, poses_valid,
                                 poses_valid_2d)
    print("INFO: Testing on {} frames".format(test_batcher.num_frames()))

    # Per-epoch eval during training must stay metric-grade (and int8
    # calibration would go stale as weights change); the serving engine
    # applies to evaluate/render-only runs.
    engine = args.serving_engine if args.evaluate else "xla"
    evaluator = Evaluator(model_cfg, joints_flip_perm=joints_perm,
                          engine=engine)
    traj_evaluator = Evaluator(traj_cfg, joints_flip_perm=None)

    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        from videopose3d_tpu.parallel import make_mesh, process_info
        mesh = make_mesh()
        info = process_info()
        extra = (f" ({info['process_count']} hosts)"
                 if info["process_count"] > 1 else "")
        print(f"INFO: Data-parallel mesh over {mesh.size} devices{extra}")

    if not args.evaluate:
        params, state, params_traj, state_traj = _train(
            args, dataset, keypoints, subjects_train, subjects_semi,
            action_filter, model_cfg, traj_cfg, params, state, step_rng,
            kps_perm, joints_perm, pad, causal_shift, use_strided,
            semi_supervised, evaluator, traj_evaluator, test_batcher,
            checkpoint, mesh, traj_rng)

    if args.render:
        _render(args, dataset, keypoints, keypoints_metadata, model_cfg, traj_cfg,
                params, state, params_traj, state_traj, evaluator,
                traj_evaluator, pad, causal_shift, kps_perm, joints_perm)
    else:
        print("Evaluating...")
        _final_evaluation(args, dataset, keypoints, subjects_test, action_filter,
                          params, state, evaluator, pad, causal_shift,
                          kps_perm, joints_perm)


# ---------------------------------------------------------------------------
# Training loop (parity: run.py:229-649)
# ---------------------------------------------------------------------------


def _train(args, dataset, keypoints, subjects_train, subjects_semi, action_filter,
           model_cfg, traj_cfg, params, state, step_rng, kps_perm, joints_perm,
           pad, causal_shift, use_strided, semi_supervised, evaluator,
           traj_evaluator, test_batcher, checkpoint, mesh, traj_rng):
    cameras_train, poses_train, poses_train_2d = fetch(
        args, dataset, keypoints, subjects_train, action_filter,
        subset=args.subset)

    lr = args.learning_rate
    loop_cfg = TrainLoopConfig(
        batch_size=args.batch_size // args.stride, chunk_length=args.stride,
        pad=pad, causal_shift=causal_shift, learning_rate=lr,
        lr_decay=args.lr_decay, epochs=args.epochs, use_strided=use_strided,
        warmup=args.warmup, bone_length_term=args.bone_length_term,
        no_proj=args.no_proj, linear_projection=args.linear_projection,
        gather_impl=args.gather_impl)

    rep_sharding = None
    if mesh is not None:
        from videopose3d_tpu.parallel import replicated_sharding, shard_batch_size
        rep_sharding = replicated_sharding(mesh)
        if loop_cfg.batch_size % mesh.size != 0:
            new_bs = shard_batch_size(loop_cfg.batch_size, mesh)
            print(f"INFO: rounding batch size {loop_cfg.batch_size} -> {new_bs} "
                  f"to divide across {mesh.size} devices")
            loop_cfg = TrainLoopConfig(**{
                **loop_cfg.__dict__, "batch_size": new_bs})

    margins = FlatSequenceDataset.training_margins(
        pad, causal_shift, loop_cfg.chunk_length)
    flip_perms = (kps_perm, joints_perm) if args.data_augmentation else None
    # Supervised batches feed the 2D stream only into the model, which
    # flattens (B, T, J, F) -> (B, T, J*F) anyway; storing it pre-flattened
    # removes a gather-output layout copy (see to_device docstring).  The
    # semi-supervised trainer restores the joint axis after the gather (its
    # unlabeled keypoints double as the reprojection-loss target), so its
    # streams are flattened only where that buys the Pallas DMA gather.
    # Lane-pad the flattened streams only where the DMA gather can actually
    # run (single-device TPU, not forced off): the pad grows the streams'
    # HBM footprints (34 -> 128 / 51 -> 128 lanes), so it is not uploaded
    # when the XLA gather would be used anyway.
    pallas_gather = (flip_perms is not None and args.gather_impl != "xla"
                     and mesh is None and jax.default_backend() == "tpu")
    flatten_2d = ((not semi_supervised and flip_perms is not None)
                  or pallas_gather)
    # The 3D target stream stays rank-3 / XLA-gathered: flattening it too
    # (to_device(flatten_3d=True) + gather_impl_3d) measured perf-NEUTRAL
    # (12.15 vs 12.25 ms/step, within same-day jitter) and NOT bitwise on
    # hardware — the relaid-out targets shift the loss-reduce tiling
    # (tools/exp_gather_step_ab.py pallas3d leg; same class as the taps-2d
    # negative result).  Single-row windows are already noise-level in XLA.
    dev = FlatSequenceDataset(
        poses_train_2d, poses_train, cameras_train,
        margins=margins, flip_perms=flip_perms).to_device(
            rep_sharding, flatten_2d=flatten_2d, lane_pad_2d=pallas_gather)
    sampler = ChunkedPairSampler(
        [p.shape[0] for p in poses_train_2d], loop_cfg.batch_size,
        loop_cfg.chunk_length, shuffle=True, augment=args.data_augmentation)
    train_eval_batcher = _eval_batcher(args, pad, causal_shift, kps_perm,
                                       joints_perm, cameras_train,
                                       poses_train, poses_train_2d)
    print("INFO: Training on {} frames".format(train_eval_batcher.num_frames()))

    epoch = 0
    params_traj = state_traj = None

    if semi_supervised:
        cameras_semi, _, poses_semi_2d = fetch(
            args, dataset, keypoints, subjects_semi, action_filter,
            parse_3d_poses=False)
        dev_semi = FlatSequenceDataset(
            poses_semi_2d, None, cameras_semi,
            margins=margins, flip_perms=flip_perms).to_device(
                rep_sharding, flatten_2d=pallas_gather,
                lane_pad_2d=pallas_gather)
        sampler_semi = ChunkedPairSampler(
            [p.shape[0] for p in poses_semi_2d], loop_cfg.batch_size,
            loop_cfg.chunk_length, shuffle=True, random_seed=4321,
            augment=args.data_augmentation, endless=True)
        semi_eval_batcher = _eval_batcher(args, pad, causal_shift, kps_perm,
                                          joints_perm, cameras_semi, None,
                                          poses_semi_2d)
        print("INFO: Semi-supervision on {} frames".format(
            semi_eval_batcher.num_frames()))

        params_traj, state_traj = init_temporal_model(traj_cfg, traj_rng)
        trainer = SemiSupervisedTrainer(
            model_cfg, traj_cfg, loop_cfg, kps_perm, joints_perm,
            dataset.skeleton().parents(), mesh=mesh)
        all_params = {"pos": params, "traj": params_traj}
        all_states = {"pos": state, "traj": state_traj}
        opt_state = trainer.init_optimizer(all_params)
    else:
        trainer = SupervisedTrainer(model_cfg, loop_cfg, kps_perm, joints_perm,
                                    mesh=mesh)
        opt_state = trainer.init_optimizer(params)
        all_params = all_states = None
        sampler_semi = None
        dev_semi = None
        semi_eval_batcher = None

    # Resume (parity: run.py:293-305).
    if args.resume and checkpoint is not None:
        # Coerce to Python scalars: the pickle payload stores 0-d numpy
        # arrays, which would (a) crash --metrics-log JSON serialization and
        # (b) be mutated in place by `epoch += 1` / `lr *= decay` while a
        # background checkpoint save still holds a reference to them.
        epoch = int(checkpoint["epoch"])
        lr = float(checkpoint["lr"])
        if checkpoint.get("optimizer") is not None:
            # Template-driven restore: reattaches optax state types that a
            # format round trip degraded (orbax: namedtuple -> dict).
            from videopose3d_tpu.checkpoint import restore_into
            opt_state = restore_into(opt_state, checkpoint["optimizer"])
            sampler.set_random_state(checkpoint["random_state"])
        else:
            print("WARNING: this checkpoint does not contain an optimizer state. "
                  "The optimizer will be reinitialized.")
        if semi_supervised:
            params_traj, state_traj = params_from_torch_state_dict(
                traj_cfg, checkpoint["model_traj"])
            all_params = {"pos": params, "traj": params_traj}
            all_states = {"pos": state, "traj": state_traj}
            if checkpoint.get("random_state_semi") is not None:
                sampler_semi.set_random_state(checkpoint["random_state_semi"])
            if checkpoint.get("stream_rng_semi") is not None:
                # Continuation-exact unlabeled stream (see payload note).
                sampler_semi.set_stream_state(
                    (int(checkpoint["stream_idx_semi"]),
                     checkpoint["stream_rng_semi"]))
        if checkpoint.get("step_rng") is not None:
            step_rng = jnp.asarray(checkpoint["step_rng"])
        opt_state = set_learning_rate(opt_state, lr)

    print("** Note: reported losses are averaged over all frames and test-time "
          "augmentation is not used here.")
    print("** The final evaluation will be carried out after the last training "
          "epoch.")

    losses_3d_train = []
    losses_3d_train_eval = []
    losses_3d_valid = []
    losses_traj_train = []
    losses_traj_train_eval = []
    losses_traj_valid = []
    losses_2d_train_unlabeled = []
    losses_2d_train_labeled_eval = []
    losses_2d_train_unlabeled_eval = []
    losses_2d_valid = []

    semi_iter = sampler_semi.next_epoch() if semi_supervised else None

    from videopose3d_tpu.profiling import device_trace, StepTimer, log_metrics_jsonl
    step_timer = StepTimer()
    first_epoch = epoch
    checkpointer = AsyncCheckpointer()

    # Device-resident per-epoch eval sets: batches upload once, the masked
    # losses run on device (like the reference's GPU-side eval losses,
    # run.py:424-549), and only per-device loss-sum carries come to host.
    # On a pod the videos shard round-robin across processes; within a
    # process they round-robin across local devices.
    eval_sets = None
    if not args.no_eval:
        from videopose3d_tpu.evaluate import DeviceEvalSet
        eval_shard = ((jax.process_index(), jax.process_count())
                      if jax.process_count() > 1 else None)
        eval_devs = _eval_device_list(args)
        eval_sets = {
            "test": DeviceEvalSet(test_batcher, pad=pad,
                                  with_traj=semi_supervised,
                                  shard=eval_shard, devices=eval_devs),
            "train": DeviceEvalSet(train_eval_batcher, pad=pad,
                                   with_traj=semi_supervised,
                                   shard=eval_shard, devices=eval_devs),
        }
        if semi_supervised:
            eval_sets["semi"] = DeviceEvalSet(
                semi_eval_batcher, pad=pad, with_traj=True,
                shard=eval_shard, devices=eval_devs)

    while epoch < args.epochs:
        start_time = time()
        momentum = bn_momentum_for_epoch(loop_cfg, epoch - 1)  # current epoch's BN momentum
        trace_ctx = device_trace(
            args.profile_dir if epoch == first_epoch else None)
        step_timer.reset()
        step_timer.start()

        epoch_losses = []
        epoch_losses_traj = []
        epoch_losses_2d = []
        epoch_n_valids = []
        epoch_n_valids_semi = []
        with trace_ctx:
            if semi_supervised:
                skip = epoch < args.warmup
                if args.scan_epoch:
                    metas, n_valids, metas_semi, n_valids_semi = [], [], [], []
                    for meta, n_valid in sampler.next_epoch():
                        meta_semi, n_valid_semi = next(semi_iter)
                        metas.append(meta)
                        n_valids.append(n_valid)
                        metas_semi.append(meta_semi)
                        n_valids_semi.append(n_valid_semi)
                    (all_params, all_states, opt_state, step_rng,
                     (l_pos, l_traj, l_recon, _l_total)) = trainer.run_epoch(
                        all_params, all_states, opt_state, step_rng, dev,
                        dev_semi, np.stack(metas), np.array(n_valids),
                        np.stack(metas_semi), np.array(n_valids_semi),
                        momentum, skip, scan_chunk=args.scan_chunk)
                    epoch_losses = list(np.asarray(l_pos))
                    epoch_losses_traj = list(np.asarray(l_traj))
                    epoch_losses_2d = list(np.asarray(l_recon))
                    epoch_n_valids = list(n_valids)
                    epoch_n_valids_semi = list(n_valids_semi)
                    step_timer.tick()
                else:
                    for meta, n_valid in sampler.next_epoch():
                        meta_semi, n_valid_semi = next(semi_iter)
                        (all_params, all_states, opt_state, step_rng,
                         loss_pos, loss_traj, loss_recon, _lt) = trainer.step(
                            all_params, all_states, opt_state, step_rng, dev,
                            dev_semi, meta, n_valid, meta_semi, n_valid_semi,
                            momentum, skip)
                        epoch_losses.append(loss_pos)
                        epoch_losses_traj.append(loss_traj)
                        epoch_losses_2d.append(loss_recon)
                        epoch_n_valids.append(n_valid)
                        epoch_n_valids_semi.append(n_valid_semi)
                        step_timer.tick()
                params, state = all_params["pos"], all_states["pos"]
                params_traj, state_traj = all_params["traj"], all_states["traj"]
                w = np.asarray(epoch_n_valids, np.float64)
                w_semi = np.asarray(epoch_n_valids_semi, np.float64)
                traj_vals = np.asarray(
                    [np.asarray(l) for l in epoch_losses_traj], np.float64)
                recon_vals = np.asarray(
                    [np.asarray(l) for l in epoch_losses_2d], np.float64)
                losses_traj_train.append(float(np.sum(traj_vals * w) / np.sum(w)))
                losses_2d_train_unlabeled.append(
                    float(np.sum(recon_vals * w_semi) / np.sum(w_semi)))
            elif args.scan_epoch:
                # Whole epoch as ONE XLA program (lax.scan over descriptors):
                # zero per-step host dispatch.
                metas, n_valids = [], []
                for meta, n_valid in sampler.next_epoch():
                    metas.append(meta)
                    n_valids.append(n_valid)
                params, state, opt_state, step_rng, losses = trainer.run_epoch(
                    params, state, opt_state, step_rng, dev,
                    np.stack(metas), np.array(n_valids), momentum,
                    scan_chunk=args.scan_chunk)
                losses = np.asarray(losses)
                weights = np.asarray(n_valids, np.float64)
                losses_3d_train.append(
                    float(np.sum(losses * weights) / np.sum(weights)))
                step_timer.tick()
            else:
                for meta, n_valid in sampler.next_epoch():
                    params, state, opt_state, step_rng, loss = trainer.step(
                        params, state, opt_state, step_rng, dev, meta, n_valid,
                        momentum)
                    epoch_losses.append(loss)
                    epoch_n_valids.append(n_valid)
                    step_timer.tick()
        if semi_supervised or not args.scan_epoch:
            weights = np.asarray(epoch_n_valids, np.float64)
            vals = np.asarray([np.asarray(l) for l in epoch_losses], np.float64)
            losses_3d_train.append(float(np.sum(vals * weights) / np.sum(weights)))
        if args.metrics_log:
            log_metrics_jsonl(args.metrics_log, {
                "epoch": epoch + 1,
                "lr": lr,
                "bn_momentum": momentum,
                "loss_3d_train": losses_3d_train[-1],
                **{f"step_{k}": v for k, v in step_timer.summary().items()},
            })

        # End-of-epoch evaluation (parity: run.py:424-549); weights are shared
        # between the strided train form and dilated eval form, no copy needed.
        if not args.no_eval:
            # On a pod the per-epoch eval shards round-robin across processes
            # (it is per-process work that does not scale with DP, unlike the
            # train step); totals are all-gathered so every process logs the
            # same numbers.
            te = eval_sets["test"].losses(
                evaluator, params, state,
                traj_evaluator=traj_evaluator if semi_supervised else None,
                traj_params=params_traj, traj_state=state_traj)
            losses_3d_valid.append(te[0])
            if semi_supervised:
                losses_traj_valid.append(te[1])
                losses_2d_valid.append(te[2])

            tr = eval_sets["train"].losses(
                evaluator, params, state,
                traj_evaluator=traj_evaluator if semi_supervised else None,
                traj_params=params_traj, traj_state=state_traj)
            losses_3d_train_eval.append(tr[0])
            if semi_supervised:
                losses_traj_train_eval.append(tr[1])
                losses_2d_train_labeled_eval.append(tr[2])
                se = eval_sets["semi"].losses(
                    evaluator, params, state, traj_evaluator=traj_evaluator,
                    traj_params=params_traj, traj_state=state_traj)
                losses_2d_train_unlabeled_eval.append(se[2])

        elapsed = (time() - start_time) / 60

        if args.no_eval:
            print("[%d] time %.2f lr %f 3d_train %f" % (
                epoch + 1, elapsed, lr, losses_3d_train[-1] * 1000))
        elif semi_supervised:
            print("[%d] time %.2f lr %f 3d_train %f 3d_eval %f traj_eval %f "
                  "3d_valid %f traj_valid %f 2d_train_sup %f 2d_train_unsup %f "
                  "2d_valid %f" % (
                      epoch + 1, elapsed, lr,
                      losses_3d_train[-1] * 1000,
                      losses_3d_train_eval[-1] * 1000,
                      losses_traj_train_eval[-1] * 1000,
                      losses_3d_valid[-1] * 1000,
                      losses_traj_valid[-1] * 1000,
                      losses_2d_train_labeled_eval[-1],
                      losses_2d_train_unlabeled_eval[-1],
                      losses_2d_valid[-1]))
        else:
            print("[%d] time %.2f lr %f 3d_train %f 3d_eval %f 3d_valid %f" % (
                epoch + 1, elapsed, lr,
                losses_3d_train[-1] * 1000,
                losses_3d_train_eval[-1] * 1000,
                losses_3d_valid[-1] * 1000))

        # Schedules (parity: run.py:583-593).
        lr *= args.lr_decay
        opt_state = set_learning_rate(opt_state, lr)
        epoch += 1

        # Checkpointing (parity: run.py:595-608).  The device->host fetch,
        # pickling, and file write run on a background thread (jax arrays are
        # immutable, so the captured pytrees snapshot this epoch exactly); the
        # next epoch starts immediately.
        if epoch % args.checkpoint_frequency == 0 and jax.process_index() == 0:
            # On a multi-host pod only process 0 writes (replicated state is
            # identical everywhere; concurrent writers would race on the file).
            orbax = getattr(args, "checkpoint_format", "pickle") == "orbax"
            chk_name = f"epoch_{epoch}" + ("" if orbax else ".bin")
            chk_path = os.path.join(args.checkpoint, chk_name)
            print("Saving checkpoint to", chk_path)
            # Host-side sampler state must snapshot NOW (it advances next
            # epoch).  Device pytrees must be COPIED on device before the
            # background thread touches them: the live buffers are donated
            # (donate_argnums) to the next epoch's jitted call, which would
            # invalidate them under the fetching thread.  The copies are
            # ~0.3 GB of HBM for a fraction of a millisecond, vs seconds of
            # blocking device->host transfer on the step path.
            rng_state = sampler.random_state()
            rng_state_semi = (sampler_semi.random_state()
                              if semi_supervised else None)
            # Mid-permutation position of the endless unlabeled stream —
            # beyond-reference: makes semi-supervised resume
            # continuation-exact instead of restarting a fresh permutation
            # from the restored RNG (the reference's behavior, run.py:607).
            stream_semi = (sampler_semi.stream_state()
                           if semi_supervised else None)
            # On a multi-host pod only process 0 reaches this branch, so the
            # copy must not be a pod-wide computation: snapshot this
            # process's local replica of the pod-replicated state instead.
            from videopose3d_tpu.parallel import local_replica
            snap = jax.tree_util.tree_map(
                jnp.copy, local_replica((params, state, opt_state,
                                         params_traj, state_traj, step_rng)))

            def payload(epoch=epoch, lr=lr, snap=snap,
                        rng_state=rng_state, rng_state_semi=rng_state_semi,
                        stream_semi=stream_semi):
                params, state, opt_state, params_traj, state_traj, \
                    step_rng = snap
                return {
                    "epoch": epoch,
                    "lr": lr,
                    "random_state": rng_state,
                    "optimizer": jax.tree_util.tree_map(np.asarray, opt_state),
                    "model_pos": params_to_torch_state_dict(params, state),
                    "model_traj": (params_to_torch_state_dict(
                        params_traj, state_traj) if semi_supervised else None),
                    "random_state_semi": rng_state_semi,
                    "stream_idx_semi": (None if stream_semi is None
                                        else stream_semi[0]),
                    "stream_rng_semi": (None if stream_semi is None
                                        else stream_semi[1]),
                    # Dropout PRNG key: resuming reproduces the exact mask
                    # sequence (the reference does not checkpoint torch's RNG,
                    # so its resumes are only sampler-exact; ours are fully
                    # bit-exact).
                    "step_rng": np.asarray(step_rng),
                }

            if orbax:
                from videopose3d_tpu.checkpoint import save_checkpoint_orbax
                checkpointer.save(chk_path, payload,
                                  save_fn=save_checkpoint_orbax)
            else:
                checkpointer.save(chk_path, payload)

        if args.export_training_curves and epoch > 3:
            _export_training_curves(
                args, epoch, semi_supervised, losses_3d_train,
                losses_3d_train_eval, losses_3d_valid, losses_traj_train,
                losses_traj_train_eval, losses_traj_valid,
                losses_2d_train_labeled_eval, losses_2d_train_unlabeled,
                losses_2d_train_unlabeled_eval, losses_2d_valid)

    checkpointer.wait()  # flush the last in-flight save before eval/exit
    return params, state, (params_traj if semi_supervised else None), \
        (state_traj if semi_supervised else None)


def _export_training_curves(args, epoch, semi_supervised, losses_3d_train,
                            losses_3d_train_eval, losses_3d_valid,
                            losses_traj_train, losses_traj_train_eval,
                            losses_traj_valid, losses_2d_train_labeled_eval,
                            losses_2d_train_unlabeled,
                            losses_2d_train_unlabeled_eval, losses_2d_valid):
    """Loss-curve PNGs (parity: run.py:610-649)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    epoch_x = np.arange(3, len(losses_3d_train)) + 1
    plt.plot(epoch_x, losses_3d_train[3:], "--", color="C0")
    plt.plot(epoch_x, losses_3d_train_eval[3:], color="C0")
    plt.plot(epoch_x, losses_3d_valid[3:], color="C1")
    plt.legend(["3d train", "3d train (eval)", "3d valid (eval)"])
    plt.ylabel("MPJPE (m)")
    plt.xlabel("Epoch")
    plt.xlim((3, epoch))
    plt.savefig(os.path.join(args.checkpoint, "loss_3d.png"))

    if semi_supervised:
        plt.figure()
        plt.plot(epoch_x, losses_traj_train[3:], "--", color="C0")
        plt.plot(epoch_x, losses_traj_train_eval[3:], color="C0")
        plt.plot(epoch_x, losses_traj_valid[3:], color="C1")
        plt.legend(["traj. train", "traj. train (eval)", "traj. valid (eval)"])
        plt.ylabel("Mean distance (m)")
        plt.xlabel("Epoch")
        plt.xlim((3, epoch))
        plt.savefig(os.path.join(args.checkpoint, "loss_traj.png"))

        plt.figure()
        plt.plot(epoch_x, losses_2d_train_labeled_eval[3:], color="C0")
        plt.plot(epoch_x, losses_2d_train_unlabeled[3:], "--", color="C1")
        plt.plot(epoch_x, losses_2d_train_unlabeled_eval[3:], color="C1")
        plt.plot(epoch_x, losses_2d_valid[3:], color="C2")
        plt.legend(["2d train labeled (eval)", "2d train unlabeled",
                    "2d train unlabeled (eval)", "2d valid (eval)"])
        plt.ylabel("MPJPE (2D)")
        plt.xlabel("Epoch")
        plt.xlim((3, epoch))
        plt.savefig(os.path.join(args.checkpoint, "loss_2d.png"))
    plt.close("all")


# ---------------------------------------------------------------------------
# Final evaluation (parity: run.py:784-862)
# ---------------------------------------------------------------------------


def _final_evaluation(args, dataset, keypoints, subjects_test, action_filter,
                      params, state, evaluator, pad, causal_shift,
                      kps_perm, joints_perm):
    all_actions = {}
    all_actions_by_subject = {}
    for subject in subjects_test:
        all_actions_by_subject.setdefault(subject, {})
        for action in dataset[subject].keys():
            action_name = action.split(" ")[0]
            all_actions.setdefault(action_name, [])
            all_actions_by_subject[subject].setdefault(action_name, [])
            all_actions[action_name].append((subject, action))
            all_actions_by_subject[subject][action_name].append((subject, action))

    def fetch_actions(pairs):
        """Per-camera (3D, 2D) sequences for a list of (subject, action)
        pairs (behavior parity: run.py:831-849)."""
        seqs_2d, seqs_3d = [], []
        for subject, action in pairs:
            kp_cams = keypoints[subject][action]
            gt_cams = dataset[subject][action]["positions_3d"]
            if len(kp_cams) != len(gt_cams):
                raise ValueError(f"{subject}/{action}: camera count mismatch")
            seqs_2d.extend(kp_cams)
            seqs_3d.extend(gt_cams)
        _subsample_sequences(seqs_2d, seqs_3d, args.downsample, 1)
        return seqs_3d, seqs_2d

    def make_batcher(action_pairs):
        poses_act, poses_2d_act = fetch_actions(action_pairs)
        return _eval_batcher(args, pad, causal_shift, kps_perm, joints_perm,
                             None, poses_act, poses_2d_act,
                             augment=args.test_time_augmentation)

    eval_devs = _eval_device_list(args)
    if not args.by_subject:
        evaluate_actionwise(evaluator, params, state, all_actions, make_batcher,
                            action_filter=action_filter, devices=eval_devs)
    else:
        for subject in all_actions_by_subject.keys():
            print("Evaluating on subject", subject)
            evaluate_actionwise(evaluator, params, state,
                                all_actions_by_subject[subject], make_batcher,
                                action_filter=action_filter, devices=eval_devs)
            print("")


# ---------------------------------------------------------------------------
# Rendering (parity: run.py:724-782)
# ---------------------------------------------------------------------------


def _render(args, dataset, keypoints, keypoints_metadata, model_cfg, traj_cfg,
            params, state, params_traj, state_traj, evaluator, traj_evaluator,
            pad, causal_shift, kps_perm, joints_perm):
    print("Rendering...")
    input_keypoints = keypoints[args.viz_subject][args.viz_action][args.viz_camera].copy()
    ground_truth = None
    if (args.viz_subject in dataset.subjects()
            and args.viz_action in dataset[args.viz_subject]):
        if "positions_3d" in dataset[args.viz_subject][args.viz_action]:
            ground_truth = dataset[args.viz_subject][args.viz_action][
                "positions_3d"][args.viz_camera].copy()
    if ground_truth is None:
        print("INFO: this action is unlabeled. Ground truth will not be rendered.")

    batcher = _eval_batcher(args, pad, causal_shift, kps_perm, joints_perm,
                            None, None, [input_keypoints],
                            augment=args.test_time_augmentation)
    prediction = evaluate(evaluator, params, state, batcher,
                          return_predictions=True)
    if params_traj is not None and ground_truth is None:
        prediction_traj = evaluate(traj_evaluator, params_traj, state_traj,
                                   batcher, return_predictions=True)
        prediction = prediction + prediction_traj

    if args.viz_export is not None:
        print("Exporting joint positions to", args.viz_export)
        np.save(args.viz_export, prediction)  # camera space

    if args.viz_output is not None:
        if ground_truth is not None:
            trajectory = ground_truth[:, :1]
            ground_truth[:, 1:] += trajectory
            prediction = prediction + trajectory

        cam = dataset.cameras()[args.viz_subject][args.viz_camera]
        if ground_truth is not None:
            prediction = np.array(camera_to_world(
                prediction, R=cam["orientation"], t=cam["translation"]))
            ground_truth = np.array(camera_to_world(
                ground_truth, R=cam["orientation"], t=cam["translation"]))
        else:
            # Borrow extrinsics from any subject that has them (viz only).
            rot = None
            for subject in dataset.cameras():
                if "orientation" in dataset.cameras()[subject][args.viz_camera]:
                    rot = dataset.cameras()[subject][args.viz_camera]["orientation"]
                    break
            prediction = np.array(camera_to_world(prediction, R=rot, t=0))
            prediction[:, :, 2] -= np.min(prediction[:, :, 2])

        anim_output = {"Reconstruction": prediction}
        if ground_truth is not None and not args.viz_no_ground_truth:
            anim_output["Ground truth"] = ground_truth

        input_keypoints = np.asarray(image_coordinates(
            input_keypoints[..., :2], w=cam["res_w"], h=cam["res_h"]))

        from videopose3d_tpu.visualization import render_animation
        render_animation(
            input_keypoints, keypoints_metadata, anim_output,
            dataset.skeleton(), dataset.fps(), args.viz_bitrate, cam["azimuth"],
            args.viz_output, limit=args.viz_limit,
            downsample=args.viz_downsample, size=args.viz_size,
            input_video_path=args.viz_video,
            viewport=(cam["res_w"], cam["res_h"]),
            input_video_skip=args.viz_skip)


if __name__ == "__main__":
    main()
