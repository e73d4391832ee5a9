#!/usr/bin/env python
"""Convert checkpoints between the reference's torch ``.bin`` format and this
framework's pickle format, in either direction.

The runner already auto-detects torch checkpoints at load time
(``videopose3d_tpu/runner.py::load_any_checkpoint``); this tool exists for
offline conversion — e.g. exporting a TPU-trained model so the *reference*
implementation can evaluate it (state-dict layouts are interchangeable, see
``videopose3d_tpu/models/convert.py``).

Usage::

    python tools/convert_checkpoint.py --to-jax  pretrained_h36m_cpn.bin out.bin
    python tools/convert_checkpoint.py --to-torch checkpoint/epoch_80.bin out.bin
"""

import argparse
import sys

import numpy as np


def to_jax(src: str, dst: str):
    import torch
    from videopose3d_tpu.checkpoint import save_checkpoint

    chk = torch.load(src, map_location="cpu", weights_only=False)
    payload = {
        "epoch": chk.get("epoch", 0),
        "lr": chk.get("lr"),
        # The sampler RNG state (a numpy RandomState tuple) pickles
        # identically in both formats — preserve it so a converted
        # mid-training checkpoint still resumes bit-exactly.
        "random_state": chk.get("random_state"),
        "optimizer": None,  # torch optimizer state is not portable
        "model_pos": {k: np.asarray(v) for k, v in chk["model_pos"].items()},
        "model_traj": ({k: np.asarray(v) for k, v in chk["model_traj"].items()}
                       if chk.get("model_traj") is not None else None),
        "random_state_semi": chk.get("random_state_semi"),
    }
    save_checkpoint(dst, payload)
    print(f"wrote {dst} (epoch {payload['epoch']})")


def to_torch(src: str, dst: str):
    import torch
    # load_any_checkpoint reads both the pickle format and orbax checkpoint
    # directories (the runner's auto-detection).
    from videopose3d_tpu.runner import load_any_checkpoint

    chk = load_any_checkpoint(src)
    payload = {
        "epoch": chk.get("epoch", 0),
        "lr": chk.get("lr"),
        "random_state": chk.get("random_state"),
        "optimizer": None,
        "model_pos": {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in chk["model_pos"].items()},
        "model_traj": ({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in chk["model_traj"].items()}
                       if chk.get("model_traj") is not None else None),
        "random_state_semi": chk.get("random_state_semi"),
    }
    torch.save(payload, dst)
    print(f"wrote {dst} (epoch {payload['epoch']})")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    direction = parser.add_mutually_exclusive_group(required=True)
    direction.add_argument("--to-jax", action="store_true",
                           help="torch .bin -> framework pickle")
    direction.add_argument("--to-torch", action="store_true",
                           help="framework pickle -> torch .bin")
    parser.add_argument("src")
    parser.add_argument("dst")
    args = parser.parse_args()
    (to_jax if args.to_jax else to_torch)(args.src, args.dst)


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
