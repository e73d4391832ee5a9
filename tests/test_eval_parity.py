"""Full evaluation-pipeline parity: our Evaluator + UnchunkedBatcher + protocol
accumulation must reproduce the reference's `evaluate()` loop (run.py:652-721)
— same padding, same TTA un-flip/average ordering, same frame weighting — to
float32 precision, using a shared set of weights."""

import numpy as np
import torch
import jax
import pytest

from videopose3d_tpu.models import TemporalModelConfig, receptive_field
from videopose3d_tpu.models.convert import params_from_torch_state_dict
from videopose3d_tpu.data.generators import UnchunkedBatcher
from videopose3d_tpu.evaluate import Evaluator, evaluate

J = 17
KPS_LEFT = [4, 5, 6, 11, 12, 13]
KPS_RIGHT = [1, 2, 3, 14, 15, 16]


def _reference_evaluate(ref, model, gen, joints_left, joints_right):
    """The reference evaluation loop (run.py:652-721), reimplemented verbatim in
    torch for golden comparison."""
    epoch_loss_3d_pos = 0.0
    epoch_loss_3d_pos_procrustes = 0.0
    epoch_loss_3d_pos_scale = 0.0
    epoch_loss_3d_vel = 0.0
    n = 0
    with torch.no_grad():
        model.eval()
        for _, batch, batch_2d in gen.next_epoch():
            inputs_2d = torch.from_numpy(batch_2d.astype("float32"))
            predicted_3d_pos = model(inputs_2d)
            if gen.augment_enabled():
                predicted_3d_pos[1, :, :, 0] *= -1
                predicted_3d_pos[1, :, joints_left + joints_right] = \
                    predicted_3d_pos[1, :, joints_right + joints_left]
                predicted_3d_pos = torch.mean(predicted_3d_pos, dim=0,
                                              keepdim=True)
            inputs_3d = torch.from_numpy(batch.astype("float32"))
            inputs_3d[:, :, 0] = 0
            if gen.augment_enabled():
                inputs_3d = inputs_3d[:1]

            error = ref.loss.mpjpe(predicted_3d_pos, inputs_3d)
            epoch_loss_3d_pos_scale += (
                inputs_3d.shape[0] * inputs_3d.shape[1]
                * ref.loss.n_mpjpe(predicted_3d_pos, inputs_3d).item())
            epoch_loss_3d_pos += (
                inputs_3d.shape[0] * inputs_3d.shape[1] * error.item())
            n += inputs_3d.shape[0] * inputs_3d.shape[1]

            inputs = inputs_3d.cpu().numpy().reshape(
                -1, inputs_3d.shape[-2], inputs_3d.shape[-1])
            predicted_3d_pos = predicted_3d_pos.cpu().numpy().reshape(
                -1, inputs_3d.shape[-2], inputs_3d.shape[-1])
            epoch_loss_3d_pos_procrustes += (
                inputs_3d.shape[0] * inputs_3d.shape[1]
                * ref.loss.p_mpjpe(predicted_3d_pos, inputs))
            epoch_loss_3d_vel += (
                inputs_3d.shape[0] * inputs_3d.shape[1]
                * ref.loss.mean_velocity_error(predicted_3d_pos, inputs))

    return (epoch_loss_3d_pos / n * 1000,
            epoch_loss_3d_pos_procrustes / n * 1000,
            epoch_loss_3d_pos_scale / n * 1000,
            epoch_loss_3d_vel / n * 1000)


@pytest.mark.parametrize("augment", [False, True])
def test_evaluation_pipeline_parity(reference_modules, augment):
    torch.manual_seed(0)
    ref_model = reference_modules.model.TemporalModel(J, 2, J, [3, 3],
                                                      channels=32).eval()
    cfg = TemporalModelConfig(num_joints_in=J, in_features=2, num_joints_out=J,
                              filter_widths=(3, 3), dropout=0.25, channels=32)
    params, state = params_from_torch_state_dict(
        cfg, {k: v.numpy() for k, v in ref_model.state_dict().items()})
    rf = receptive_field(cfg)
    pad = (rf - 1) // 2

    rng = np.random.default_rng(0)
    lengths = [33, 50, 21]
    poses_2d = [rng.standard_normal((l, J, 2)).astype(np.float32) * 0.5
                for l in lengths]
    poses_3d = [rng.standard_normal((l, J, 3)).astype(np.float32) * 0.3
                for l in lengths]

    ref_gen = reference_modules.generators.UnchunkedGenerator(
        None, [p.copy() for p in poses_3d], [p.copy() for p in poses_2d],
        pad=pad, causal_shift=0, augment=augment,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT)
    want = _reference_evaluate(reference_modules, ref_model, ref_gen,
                               KPS_LEFT, KPS_RIGHT)

    perm = np.arange(J)
    perm[KPS_LEFT] = KPS_RIGHT
    perm[KPS_RIGHT] = KPS_LEFT
    batcher = UnchunkedBatcher(None, poses_3d, poses_2d, pad=pad,
                               augment=augment, kps_flip_perm=perm,
                               joints_flip_perm=perm, bucket=16)
    evaluator = Evaluator(cfg, joints_flip_perm=perm)
    got = evaluate(evaluator, params, state, batcher, verbose=False)

    for g, w, name in zip(got, want, ["P1", "P2", "P3", "MPJVE"]):
        assert abs(g - w) < 5e-3, f"{name}: ours {g} vs reference {w}"
