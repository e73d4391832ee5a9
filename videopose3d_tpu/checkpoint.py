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


# --- Orbax backend (optional, directory format) ----------------------------
#
# Same payload, stored via orbax's tensorstore-backed PyTree format: arrays
# land in a checkpoint *directory* with per-array chunked storage and atomic
# finalization — the multi-host-grade alternative to the single-file pickle
# (reference payload semantics: ``/root/reference/run.py:595-608``).  Select
# with ``--checkpoint-format orbax``; both formats are auto-detected on load
# (directory => orbax).
#
# The training state is fully replicated and only process 0 writes (runner
# gating), so the checkpointer is built with barriers restricted to the
# calling process — a default orbax Checkpointer.save would block in
# sync_global_processes waiting for peers that never enter save().

_RNG_STATE_KEYS = ("random_state", "random_state_semi", "stream_rng_semi")


def require_orbax() -> None:
    """Import orbax eagerly, on the caller thread.

    ``AsyncCheckpointer`` surfaces background-save errors only at the *next*
    save()/wait(); probing importability up front turns a missing dependency
    into an immediate startup failure instead of a run that silently writes
    no checkpoints for a whole checkpoint interval.
    """
    import orbax.checkpoint  # noqa: F401


def _local_pytree_checkpointer():
    import orbax.checkpoint as ocp

    pid = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=pid, active_processes={pid}))


def save_checkpoint_orbax(path: str, payload: Dict[str, Any]) -> None:
    """Write a checkpoint directory via orbax (crash-safe, including
    overwrite: the previous checkpoint at ``path`` survives any crash)."""
    import shutil

    def to_host(x):
        # Device arrays to host numpy; scalar/string leaves (e.g. the
        # 'MT19937' tag inside a RandomState state tuple) stay native python —
        # tensorstore cannot store numpy unicode arrays.
        return np.asarray(x) if isinstance(x, (np.ndarray, jax.Array)) else x

    payload = {k: (jax.tree_util.tree_map(to_host, v) if v is not None
                   else None) for k, v in payload.items()}
    path = os.path.abspath(path)
    new, old = path + ".new", path + ".old"
    ckptr = _local_pytree_checkpointer()
    if os.path.isdir(new):
        # A previous run crashed mid-swap.  ``.new`` is complete whenever the
        # directory exists (orbax finalizes into place by rename) and holds
        # the NEWEST state — the one load_checkpoint_orbax has been
        # restoring.  Complete the swap instead of deleting it as stale:
        # reaping it and then crashing inside the multi-second tensorstore
        # write below would regress durable state a full generation behind
        # the crashed run's own resume point.  This covers both crash
        # windows — after ``rename(path, old)`` (path missing) and before it
        # (path still the older generation).
        if os.path.exists(path):
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(path, old)
        os.rename(new, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    if not os.path.exists(path):
        ckptr.save(path, payload)
        return
    # Overwrite: write beside, then swap.  orbax's own ``force=True`` deletes
    # the existing checkpoint *before* writing the new one, so a crash in
    # between loses both; here the old directory exists (as ``path`` or
    # ``path + ".old"``) until the new one is fully finalized.
    ckptr.save(new, payload)
    os.rename(path, old)
    os.rename(new, path)
    shutil.rmtree(old)


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    restored = None
    last_err = None
    # ``path + ".new"`` exists only after an interrupted overwrite, and orbax
    # finalizes into place by rename — so if the directory exists it holds the
    # NEWEST complete state and is preferred; ``path`` / ``path + ".old"`` are
    # the progressively older fallbacks (a save crash window loses nothing).
    for candidate in (path + ".new", path, path + ".old"):
        if not os.path.isdir(candidate):
            continue
        try:
            restored = _local_pytree_checkpointer().restore(candidate)
            break
        except Exception as e:  # partial write: fall back to the older copy
            last_err = e
    if restored is None:
        if last_err is not None:
            raise last_err
        raise FileNotFoundError(f"no orbax checkpoint at {path}")
    # orbax round-trips tuples as lists; numpy's RandomState.set_state
    # requires the MT19937 state as a tuple.
    for key in _RNG_STATE_KEYS:
        if restored.get(key) is not None:
            restored[key] = tuple(restored[key])
    return dict(restored)


def restore_into(template, restored):
    """Rebuild ``restored`` into the exact pytree structure of ``template``.

    A checkpoint format round trip may degrade container types — an orbax
    restore turns namedtuples (e.g. optax optimizer states) into plain dicts
    keyed by field name, tuples into lists, and empty nodes into ``None``.
    Matching against a freshly-constructed template (same shapes, e.g. from
    ``init_optimizer``) reattaches the native types; leaves come back as jax
    arrays.  Also a no-op-shaped path for pickle payloads, whose structure
    already matches.
    """
    import jax.numpy as jnp

    if hasattr(template, "_fields"):          # namedtuple (optax states)
        if not template._fields:
            return type(template)()
        if isinstance(restored, dict):
            vals = [restore_into(getattr(template, f), restored[f])
                    for f in template._fields]
        else:
            if len(restored) != len(template._fields):
                raise ValueError(
                    f"checkpoint state {type(template).__name__} has "
                    f"{len(restored)} fields, expected "
                    f"{len(template._fields)}")
            vals = [restore_into(getattr(template, f), r)
                    for f, r in zip(template._fields, restored)]
        return type(template)(*vals)
    if isinstance(template, dict):
        return {k: restore_into(template[k], restored[k]) for k in template}
    if isinstance(template, (list, tuple)):
        if len(restored) != len(template):
            # e.g. an optimizer chain saved under a different optax layout: a
            # silent zip-truncation would resume with half-fresh state.
            raise ValueError(
                f"checkpoint state length {len(restored)} != template "
                f"length {len(template)}")
        return type(template)(
            restore_into(t, r) for t, r in zip(template, restored))
    if template is None:
        return None
    return jnp.asarray(restored)


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
             payload: Union[Dict[str, Any], Callable[[], Dict[str, Any]]],
             save_fn: Callable[[str, Dict[str, Any]], None] = save_checkpoint,
             ) -> None:
        """Queue an atomic checkpoint write.  ``payload`` may be a dict or a
        zero-arg callable building one (run in the background, so expensive
        host conversions stay off the step path).  ``save_fn`` selects the
        format writer (:func:`save_checkpoint` or
        :func:`save_checkpoint_orbax`)."""
        self.wait()

        def work():
            try:
                p = payload() if callable(payload) else payload
                save_fn(path, p)
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
