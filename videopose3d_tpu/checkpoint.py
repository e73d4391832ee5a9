"""Checkpoint save/restore with the reference's payload semantics.

Parity target: ``/root/reference/run.py:595-608`` — a single ``epoch_{N}.bin`` file
holding ``{epoch, lr, random_state, optimizer, model_pos, model_traj,
random_state_semi}`` so training resumes *bit-exactly*, including the data-pipeline
RNG state (``run.py:293-305``).

Implementation: the pytrees are converted to host numpy and pickled.  This is
deliberately a single-file, torch-free format (loading the reference's actual
``.bin`` files — which are torch pickles — is handled separately by
``tools/convert_checkpoint.py``).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomically write a checkpoint dict (pytrees are devicetree-safe)."""
    payload = {k: (_to_host(v) if v is not None else None) for k, v in payload.items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
