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
import threading
from typing import Any, Callable, Dict, Optional, Union

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


class AsyncCheckpointer:
    """Background-thread checkpoint writer: the training loop hands over the
    payload and keeps stepping while device->host transfer, pickling, and the
    atomic file write happen off the critical path.

    jax arrays are immutable and the trainers return *new* pytrees every step,
    so capturing references at ``save()`` time snapshots the exact epoch state
    with zero copies on the caller thread.  At most one save is in flight; a
    new ``save()`` (or ``wait()``) first joins the previous one, re-raising any
    background error.  Always ``wait()`` before reading the file back or
    exiting.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def save(self, path: str,
             payload: Union[Dict[str, Any], Callable[[], Dict[str, Any]]]
             ) -> None:
        """Queue an atomic checkpoint write.  ``payload`` may be a dict or a
        zero-arg callable building one (run in the background, so expensive
        host conversions stay off the step path)."""
        self.wait()

        def work():
            try:
                p = payload() if callable(payload) else payload
                save_checkpoint(path, p)
            except BaseException as e:  # re-raised on the caller thread
                self._exc = e

        self._thread = threading.Thread(
            target=work, name="checkpoint-writer", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) completes; re-raise its
        error if it failed."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
