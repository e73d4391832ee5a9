"""ctypes bindings for the native (C++) data-loader core.

Builds ``native/sampler.cpp`` with g++ on first use (cached in
``native/build/``) and exposes a numpy-``RandomState``-bit-compatible row
permutation.  Falls back gracefully: callers check :func:`available` and use
the numpy path otherwise.  State round-trips through the standard numpy
``('MT19937', key, pos, ...)`` tuple, so checkpoint RNG-state resume parity is
preserved regardless of which path produced a given epoch's shuffle.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "sampler.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libsampler.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    # Compile to a process-unique temp name, then atomically rename: a
    # concurrent builder (pytest workers, two jobs on one host) or a killed
    # build must never leave a half-written .so at the final path, where the
    # mtime check would accept it forever after.
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    # Reap orphans from builders killed between g++ and os.replace (their
    # finally-cleanup never ran) — but only when the stamping pid is dead: a
    # concurrent live builder's tmp must not be unlinked mid-g++.
    for stale in glob.glob(f"{_LIB_PATH}.*.tmp"):
        if stale == tmp:
            continue
        try:
            pid = int(stale.rsplit(".", 2)[-2])
            os.kill(pid, 0)          # raises if no such process
        except ValueError:
            pass                     # unparsable name: treat as orphan
        except ProcessLookupError:
            pass                     # no such pid: orphan, reap below
        except OSError:
            continue                 # EPERM etc.: alive but owned by another
                                     # user — a live builder, leave its tmp
        else:
            continue                 # live builder, leave its tmp alone
        try:
            os.remove(stale)
        except OSError:
            pass
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # Corrupt/incompatible artifact: fall back to the numpy path
            # (available() contract) rather than crash sampler construction.
            return None
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.sampler_permute_rows.argtypes = [
            u32p, ctypes.POINTER(ctypes.c_int32), i64p,
            ctypes.c_int64, ctypes.c_int64]
        lib.sampler_seed.argtypes = [
            ctypes.c_uint32, u32p, ctypes.POINTER(ctypes.c_int32)]
        lib.sampler_raw_draws.argtypes = [
            u32p, ctypes.POINTER(ctypes.c_int32), u32p, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def permute_rows(random_state: np.random.RandomState,
                 pairs: np.ndarray) -> np.ndarray:
    """Native equivalent of ``random_state.permutation(pairs)`` for a
    C-contiguous (N, K) int64 array: same output, same post-call RNG state."""
    lib = _load()
    assert lib is not None, "native sampler unavailable"
    assert pairs.ndim == 2 and pairs.dtype == np.int64

    name, key, pos, has_gauss, cached = random_state.get_state()
    assert name == "MT19937"
    key = np.ascontiguousarray(key, dtype=np.uint32)
    pos_c = ctypes.c_int32(pos)

    out = np.ascontiguousarray(pairs).copy()
    lib.sampler_permute_rows(key, ctypes.byref(pos_c), out,
                             out.shape[0], out.shape[1])
    random_state.set_state((name, key, int(pos_c.value), has_gauss, cached))
    return out


def raw_draws(random_state: np.random.RandomState, n: int) -> np.ndarray:
    """n raw 32-bit MT19937 outputs (testing hook)."""
    lib = _load()
    assert lib is not None
    name, key, pos, has_gauss, cached = random_state.get_state()
    key = np.ascontiguousarray(key, dtype=np.uint32)
    pos_c = ctypes.c_int32(pos)
    out = np.empty(n, np.uint32)
    lib.sampler_raw_draws(key, ctypes.byref(pos_c), out, n)
    random_state.set_state((name, key, int(pos_c.value), has_gauss, cached))
    return out
