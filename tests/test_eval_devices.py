"""Round-robin multi-device evaluation is numerically invisible.

The per-epoch eval and the final protocol evaluation can spread videos over
every local device (``--eval-devices`` / ``devices=``) and always dispatch
two-phase (a bounded in-flight queue before the first fetch).  Every video
runs the same compiled program on the same inputs, so results must be
BITWISE equal to the plain single-device loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from videopose3d_tpu.data.generators import UnchunkedBatcher
from videopose3d_tpu.evaluate import Evaluator, evaluate
from videopose3d_tpu.models import (TemporalModelConfig, init_temporal_model,
                                    receptive_field)

J = 17


def _fixture(n_videos=7, seed=0):
    rng = np.random.default_rng(seed)
    cfg = TemporalModelConfig(num_joints_in=J, in_features=2,
                              num_joints_out=J, filter_widths=(3, 3),
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
