"""Parameter-layout conversion between PyTorch reference checkpoints and our pytrees.

The reference stores ``nn.Conv1d`` weights as ``(C_out, C_in, k)`` and
``nn.BatchNorm1d`` running stats under ``running_mean``/``running_var``
(checkpoint payload described at ``/root/reference/run.py:600-608``).  Our layout is
``(k, C_in, C_out)`` so conv taps reshape directly into one MXU matmul operand.

These helpers are pure dict/ndarray transforms — no torch import required; feed them
a ``state_dict``-like mapping of numpy arrays (see ``tools/convert_checkpoint.py``
for loading actual ``.bin`` files with torch installed).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from videopose3d_tpu.models.temporal import TemporalModelConfig


def _conv_from_torch(w: np.ndarray) -> np.ndarray:
    """(C_out, C_in, k) -> (k, C_in, C_out)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _conv_to_torch(w: np.ndarray) -> np.ndarray:
    """(k, C_in, C_out) -> (C_out, C_in, k)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def params_from_torch_state_dict(
    config: TemporalModelConfig, sd: Mapping[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a reference ``model_pos`` state dict to our (params, state) pytrees."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_layers = 2 * (len(config.filter_widths) - 1)
    surplus = [k for k in sd
               if k.startswith(("layers_conv.", "layers_bn."))
               and int(k.split(".")[1]) >= n_layers]
    if surplus:
        # Strict-load parity with torch's load_state_dict: a checkpoint with
        # more residual blocks than the configured -arc would otherwise load
        # as a silently truncated network (all per-block shapes match).
        raise ValueError(
            f"checkpoint has {sorted(surplus)[:4]}... beyond the "
            f"{n_layers} conv layers of architecture "
            f"{','.join(map(str, config.filter_widths))}; pass the "
            "architecture the checkpoint was trained with")

    params = {
        "expand_conv": {"weight": _conv_from_torch(sd["expand_conv.weight"])},
        "expand_bn": {
            "scale": sd["expand_bn.weight"].astype(np.float32),
            "bias": sd["expand_bn.bias"].astype(np.float32),
        },
        "layers_conv": [
            {"weight": _conv_from_torch(sd[f"layers_conv.{i}.weight"])}
            for i in range(n_layers)
        ],
        "layers_bn": [
            {
                "scale": sd[f"layers_bn.{i}.weight"].astype(np.float32),
                "bias": sd[f"layers_bn.{i}.bias"].astype(np.float32),
            }
            for i in range(n_layers)
        ],
        "shrink": {
            "weight": _conv_from_torch(sd["shrink.weight"]),
            "bias": sd["shrink.bias"].astype(np.float32),
        },
    }
    state = {
        "expand_bn": {
            "mean": sd["expand_bn.running_mean"].astype(np.float32),
            "var": sd["expand_bn.running_var"].astype(np.float32),
        },
        "layers_bn": [
            {
                "mean": sd[f"layers_bn.{i}.running_mean"].astype(np.float32),
                "var": sd[f"layers_bn.{i}.running_var"].astype(np.float32),
            }
            for i in range(n_layers)
        ],
    }
    return params, state


def params_to_torch_state_dict(params, state) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_torch_state_dict` (for exporting checkpoints
    usable by the reference implementation)."""
    sd: Dict[str, np.ndarray] = {
        "expand_conv.weight": _conv_to_torch(params["expand_conv"]["weight"]),
        "expand_bn.weight": np.asarray(params["expand_bn"]["scale"]),
        "expand_bn.bias": np.asarray(params["expand_bn"]["bias"]),
        "expand_bn.running_mean": np.asarray(state["expand_bn"]["mean"]),
        "expand_bn.running_var": np.asarray(state["expand_bn"]["var"]),
        "shrink.weight": _conv_to_torch(params["shrink"]["weight"]),
        "shrink.bias": np.asarray(params["shrink"]["bias"]),
    }
    for i, conv in enumerate(params["layers_conv"]):
        sd[f"layers_conv.{i}.weight"] = _conv_to_torch(conv["weight"])
    for i, (bn_p, bn_s) in enumerate(zip(params["layers_bn"], state["layers_bn"])):
        sd[f"layers_bn.{i}.weight"] = np.asarray(bn_p["scale"])
        sd[f"layers_bn.{i}.bias"] = np.asarray(bn_p["bias"])
        sd[f"layers_bn.{i}.running_mean"] = np.asarray(bn_s["mean"])
        sd[f"layers_bn.{i}.running_var"] = np.asarray(bn_s["var"])
    return sd
