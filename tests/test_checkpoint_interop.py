"""Checkpoint interoperability: weights trained in this framework load into the
reference PyTorch implementation (and produce the same outputs), and the
tools/convert_checkpoint.py CLI converts in both directions."""

import os
import subprocess
import sys

import numpy as np
import torch
import jax
import pytest

from videopose3d_tpu.models import (
    TemporalModelConfig, init_temporal_model, forward_dilated, receptive_field)
from videopose3d_tpu.models.convert import (
    params_to_torch_state_dict, params_from_torch_state_dict)
from videopose3d_tpu.checkpoint import save_checkpoint, load_checkpoint


def test_our_weights_load_into_reference_model(reference_modules):
    """Export our params -> torch state dict -> reference model; outputs match."""
    cfg = TemporalModelConfig(num_joints_in=17, in_features=2, num_joints_out=17,
                              filter_widths=(3, 3), dropout=0.25, channels=32)
    params, state = init_temporal_model(cfg, jax.random.PRNGKey(3))
    sd = params_to_torch_state_dict(params, state)

    ref = reference_modules.model.TemporalModel(17, 2, 17, [3, 3], channels=32)
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()})
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, receptive_field(cfg) + 5, 17, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = forward_dilated(cfg, params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_convert_tool_roundtrip(tmp_path, reference_modules):
    """tools/convert_checkpoint.py converts torch->jax and jax->torch."""
    torch.manual_seed(1)
    ref = reference_modules.model.TemporalModel(17, 2, 17, [3, 3], channels=16)
    src = str(tmp_path / "ref.bin")
    torch.save({"epoch": 42, "model_pos": ref.state_dict()}, src)

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out_jax = str(tmp_path / "ours.bin")
    r = subprocess.run([sys.executable, "tools/convert_checkpoint.py",
                        "--to-jax", src, out_jax], cwd="/root/repo",
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    chk = load_checkpoint(out_jax)
    assert chk["epoch"] == 42
    assert isinstance(chk["model_pos"]["expand_conv.weight"], np.ndarray)

    out_torch = str(tmp_path / "back.bin")
    r = subprocess.run([sys.executable, "tools/convert_checkpoint.py",
                        "--to-torch", out_jax, out_torch], cwd="/root/repo",
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    back = torch.load(out_torch, weights_only=False)
    assert back["epoch"] == 42
    for k, v in ref.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back["model_pos"][k].numpy(), v.numpy())
