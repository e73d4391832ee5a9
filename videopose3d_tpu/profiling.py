"""Profiling and observability helpers.

The reference has no tracing/profiling beyond wall-clock epoch prints
(``/root/reference/run.py:312,551``); SURVEY.md §5 calls for the TPU-native
equivalents: ``jax.profiler`` device traces plus structured per-step timing.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto) for the
    enclosed block.  No-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight per-step wall-clock statistics for a training epoch.

    Measures host-side dispatch cadence; combine with :func:`device_trace` for
    on-device timelines.  ``summary()`` returns mean/p50/p95/max milliseconds.
    """

    def __init__(self):
        self._times: List[float] = []
        self._last: Optional[float] = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times) * 1e3
        return {
            "steps": int(arr.size),
            "mean_ms": float(arr.mean()),
            "p50_ms": float(np.percentile(arr, 50)),
            "p95_ms": float(np.percentile(arr, 95)),
            "max_ms": float(arr.max()),
        }

    def report(self, prefix: str = "steps") -> str:
        s = self.summary()
        if not s:
            return f"{prefix}: no steps recorded"
        return (f"{prefix}: {s['steps']} steps, mean {s['mean_ms']:.2f} ms, "
                f"p50 {s['p50_ms']:.2f} ms, p95 {s['p95_ms']:.2f} ms, "
                f"max {s['max_ms']:.2f} ms")

    def reset(self):
        self._times.clear()
        self._last = None


def _json_default(obj):
    """Coerce numpy/jax scalars that leak into metric records (e.g. losses
    fetched from device, checkpoint payload entries) into JSON numbers."""
    if hasattr(obj, "item"):
        return obj.item()
    raise TypeError(f"not JSON serializable: {type(obj)}")


def log_metrics_jsonl(path: str, record: Dict) -> None:
    """Append one JSON line of structured metrics (epoch losses, step stats)."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, default=_json_default) + "\n")
