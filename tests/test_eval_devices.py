"""Round-robin multi-device evaluation is numerically invisible.

The per-epoch eval and the final protocol evaluation can spread videos over
every local device (``--eval-devices`` / ``devices=``) and always dispatch
two-phase (a bounded in-flight queue before the first fetch).  Every video
runs the same compiled program on the same inputs, so results must be
BITWISE equal to the plain single-device loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videopose3d_tpu.data.generators import UnchunkedBatcher
from videopose3d_tpu.evaluate import Evaluator, evaluate
from videopose3d_tpu.models import (TemporalModelConfig, init_temporal_model,
                                    receptive_field)

J = 17


def _fixture(n_videos=7, seed=0, fw=(3, 3)):
    rng = np.random.default_rng(seed)
    cfg = TemporalModelConfig(num_joints_in=J, in_features=2,
                              num_joints_out=J, filter_widths=fw,
                              dropout=0.25, channels=16)
    pad = (receptive_field(cfg) - 1) // 2
    poses_2d, poses_3d, cams = [], [], []
    for _ in range(n_videos):
        n = int(rng.integers(30, 90))
        p3 = 0.1 * rng.standard_normal((n, J, 3)).astype(np.float32)
        poses_3d.append(p3)
        poses_2d.append((p3[..., :2] * 2.0 + 0.05).astype(np.float32))
        cams.append(np.array([1.1, 1.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                             np.float32))
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(3))
    perm = np.arange(J)
    perm[[1, 2]] = perm[[2, 1]]
    return cfg, pad, params, state, poses_2d, poses_3d, cams, perm


def _batcher(pad, cams, poses_3d, poses_2d, perm, augment):
    return UnchunkedBatcher(cams, poses_3d, poses_2d, pad=pad,
                            augment=augment, kps_flip_perm=perm,
                            joints_flip_perm=perm, bucket=16)


def test_predict_async_matches_predict():
    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture()
    ev = Evaluator(cfg, joints_flip_perm=perm)
    batcher = _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False)
    cam, b3, b2, n = next(batcher.next_epoch())
    ref = ev.predict(params, state, b2, augment=False)
    for device in (None, jax.local_devices()[-1]):
        handle = ev.predict_async(params, state, b2, augment=False,
                                  device=device)
        assert isinstance(handle, jax.Array)
        if device is not None:
            assert list(handle.devices()) == [device]
        np.testing.assert_array_equal(np.asarray(handle), ref)


@pytest.mark.slow
def test_evaluate_multi_device_bitwise_equal():
    assert jax.device_count() == 8
    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture()
    ev = Evaluator(cfg, joints_flip_perm=perm)
    for augment in (False, True):
        ref = evaluate(ev, params, state,
                       _batcher(pad, cams, poses_3d, poses_2d, perm, augment),
                       verbose=False)
        got = evaluate(ev, params, state,
                       _batcher(pad, cams, poses_3d, poses_2d, perm, augment),
                       verbose=False, devices=jax.local_devices())
        assert got == ref  # bitwise: same program, same inputs


@pytest.mark.slow
def test_epoch_eval_losses_multi_device_bitwise_equal():
    """The runner's per-epoch eval helper, including the trajectory-model +
    2D-reconstruction branch, over all 8 virtual devices."""
    from videopose3d_tpu.runner import _epoch_eval_losses

    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture()
    traj_cfg = TemporalModelConfig(num_joints_in=J, in_features=2,
                                   num_joints_out=1,
                                   filter_widths=cfg.filter_widths,
                                   dropout=cfg.dropout, channels=cfg.channels)
    traj_params, traj_state = init_temporal_model(traj_cfg,
                                                  jax.random.PRNGKey(4))
    ev = Evaluator(cfg, joints_flip_perm=perm)
    traj_ev = Evaluator(traj_cfg)

    def run(devices):
        return _epoch_eval_losses(
            ev, params, state,
            _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
            traj_evaluator=traj_ev, traj_params=traj_params,
            traj_state=traj_state, pad=pad, devices=devices)

    ref = run(None)
    got = run(jax.local_devices())
    assert got == ref
    assert ref[3] == sum(p.shape[0] for p in poses_2d)


def test_device_eval_set_matches_host_path():
    """DeviceEvalSet (on-device masked losses, per-device f32 accumulators,
    round-robin over all 8 virtual devices) must reproduce the host-numpy
    per-epoch eval helper, including the trajectory + 2D-reconstruction
    branch, to f32 accumulation noise."""
    from videopose3d_tpu.evaluate import DeviceEvalSet
    from videopose3d_tpu.runner import _epoch_eval_losses

    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture()
    poses_3d = [p + np.array([0, 0, 4], np.float32) for p in poses_3d]
    traj_cfg = TemporalModelConfig(num_joints_in=J, in_features=2,
                                   num_joints_out=1,
                                   filter_widths=cfg.filter_widths,
                                   dropout=cfg.dropout, channels=cfg.channels)
    traj_params, traj_state = init_temporal_model(traj_cfg,
                                                  jax.random.PRNGKey(4))
    ev = Evaluator(cfg, joints_flip_perm=perm)
    traj_ev = Evaluator(traj_cfg)

    ref = _epoch_eval_losses(
        ev, params, state,
        _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
        traj_evaluator=traj_ev, traj_params=traj_params,
        traj_state=traj_state, pad=pad)

    for devices in (None, jax.local_devices()):
        ds = DeviceEvalSet(
            _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
            pad=pad, with_traj=True, devices=devices)
        got = ds.losses(ev, params, state, traj_evaluator=traj_ev,
                        traj_params=traj_params, traj_state=traj_state)
        assert got[3] == ref[3]
        np.testing.assert_allclose(got[:3], ref[:3], rtol=2e-6, atol=1e-7)
        # Second epoch with the same weights: cached device arrays, same
        # numbers exactly.
        again = ds.losses(ev, params, state, traj_evaluator=traj_ev,
                          traj_params=traj_params, traj_state=traj_state)
        assert again == got


def test_device_eval_set_unlabeled_pattern():
    """Unlabeled semi-eval videos (no 3D target, camera present) produce only
    the 2D reconstruction loss, matching the host helper."""
    from videopose3d_tpu.evaluate import DeviceEvalSet
    from videopose3d_tpu.runner import _epoch_eval_losses

    cfg, pad, params, state, poses_2d, _, cams, perm = _fixture(n_videos=4)
    traj_cfg = TemporalModelConfig(num_joints_in=J, in_features=2,
                                   num_joints_out=1,
                                   filter_widths=cfg.filter_widths,
                                   dropout=cfg.dropout, channels=cfg.channels)
    traj_params, traj_state = init_temporal_model(traj_cfg,
                                                  jax.random.PRNGKey(4))
    ev = Evaluator(cfg, joints_flip_perm=perm)
    traj_ev = Evaluator(traj_cfg)

    ref = _epoch_eval_losses(
        ev, params, state,
        _batcher(pad, cams, None, poses_2d, perm, augment=False),
        traj_evaluator=traj_ev, traj_params=traj_params,
        traj_state=traj_state, pad=pad)
    ds = DeviceEvalSet(
        _batcher(pad, cams, None, poses_2d, perm, augment=False),
        pad=pad, with_traj=True, devices=jax.local_devices())
    got = ds.losses(ev, params, state, traj_evaluator=traj_ev,
                    traj_params=traj_params, traj_state=traj_state)
    assert got[3] == ref[3]
    assert got[0] == ref[0] == 0.0
    np.testing.assert_allclose(got[2], ref[2], rtol=2e-6, atol=1e-7)


def test_device_eval_set_sharded_sums():
    """shard=(i, 2) splits videos round-robin; manually combining both
    shards' partial sums reproduces the full set (the pod allgather path
    sums exactly these partials)."""
    from videopose3d_tpu.evaluate import DeviceEvalSet

    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture()
    ev = Evaluator(cfg, joints_flip_perm=perm)

    full = DeviceEvalSet(
        _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False), pad=pad)
    f = full.losses(ev, params, state)
    parts = []
    for i in range(2):
        ds = DeviceEvalSet(
            _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
            pad=pad, shard=None, devices=None)
        # Simulate the process-i shard without a multi-process runtime.
        ds._videos = [v for j, v in enumerate(ds._videos) if j % 2 == i]
        ds.n_frames = sum(int(np.asarray(v[1]["n"]).item())
                          for v in ds._videos)
        parts.append((ds.losses(ev, params, state), ds.n_frames))
    n = sum(p[1] for p in parts)
    combined = sum(p[0][0] * p[1] for p in parts) / n
    assert n == f[3]
    np.testing.assert_allclose(combined, f[0], rtol=2e-6)


def test_device_eval_set_int8_engine():
    """DeviceEvalSet drives the int8 serving engine too (quantized-weights
    tree through the fused loss programs, auto-calibrated from the first
    uploaded batch exactly like predict's first-batch fallback)."""
    from videopose3d_tpu.evaluate import DeviceEvalSet
    from videopose3d_tpu.runner import _epoch_eval_losses

    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture(
        n_videos=3, fw=(3, 3, 3))
    ev = Evaluator(cfg, joints_flip_perm=perm, engine="int8")

    ref = _epoch_eval_losses(
        ev, params, state,
        _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
        pad=pad)
    ds = DeviceEvalSet(
        _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
        pad=pad)
    got = ds.losses(ev, params, state)
    assert got[3] == ref[3]
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-6, atol=1e-7)


def test_device_eval_set_empty_shard_int8_returns_zero():
    """A process whose round-robin shard holds no videos (more pod processes
    than eval videos) must still reach the pod collective instead of raising
    — with the int8 engine the old path died in infer_fn_and_weights for
    want of calibration data, hanging every OTHER process in the allgather."""
    from videopose3d_tpu.evaluate import DeviceEvalSet

    cfg, pad, params, state, poses_2d, poses_3d, cams, perm = _fixture(
        n_videos=1, fw=(3, 3, 3))
    ev = Evaluator(cfg, joints_flip_perm=perm, engine="int8")
    ds = DeviceEvalSet(
        _batcher(pad, cams, poses_3d, poses_2d, perm, augment=False),
        pad=pad, shard=(1, 2))  # round-robin slot 1 of 2: no videos
    assert ds._videos == [] and ds.n_frames == 0
    got = ds.losses(ev, params, state)
    # Single-process allgather: the empty shard contributes zeros.
    assert got == (0.0, 0.0, 0.0, len(poses_3d[0]) * 0)


def test_eval_device_list_auto_is_single_on_cpu():
    from types import SimpleNamespace
    from videopose3d_tpu.runner import _eval_device_list
    assert _eval_device_list(SimpleNamespace(eval_devices=0)) is None
    devs = _eval_device_list(SimpleNamespace(eval_devices=3))
    assert devs == jax.local_devices()[:3]
    assert _eval_device_list(SimpleNamespace(eval_devices=1)) is None
    # More than available clamps.
    devs = _eval_device_list(SimpleNamespace(eval_devices=99))
    assert devs == jax.local_devices()
