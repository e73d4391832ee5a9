#!/usr/bin/env python
"""Re-run the toolchain-floor A/Bs and append a date-stamped record.

Several "measured floor" claims in PARITY.md are *toolchain* statements —
properties of the current jaxlib/Mosaic, not of the hardware:

  1. int8 dilated-tap realignment tax (``tools/exp_realign.py``):
     Mosaic's unaligned-VMEM-slice handling costs ~5-12%% of a mid block;
     the accshift alternative recovers none of it.
  2. bf16 streaming ring-push lowering (``tools/exp_ring_push.py``):
     XLA's dus fusion beats an in-place single-row Pallas DMA.
  3. bf16 fused streaming engine (``tools/exp_stream_ab.py``):
     the single-kernel engine is ~15%% slower than XLA's per-layer fusions.
  4. fused-Pallas train engine (``tools/exp_train_engine_ab.py``):
     pallas_call boundary relayouts exceed the fusion gains.
  5. Pallas DMA-ring batch-assembly gather (``tools/exp_gather_step_ab.py``):
     faster than the XLA row gather inside the supervised step (gates the
     ``--gather-impl auto`` default the OTHER way — this one must stay a
     WIN, and the lane-padded-stream requirement must keep compiling).

Each claim gates a default (XLA engines / dus lowering stay default), so the
A/Bs must be re-run whenever the toolchain updates.  This driver runs all
four in subprocesses (each tool interleaves its own A/B in-process — the
only methodology that survives chip-day variance), extracts the headline
numbers, and appends one JSON line per run to ``TOOLCHAIN_FLOORS.jsonl``
with the date and jax/jaxlib versions, so the floor claims stay auditable
across toolchain updates.

Usage: python tools/recheck_floors.py [--only realign,ring_push,...]
       [--quick]   (smaller reps — a smoke pass, not a record-grade run)
"""

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "TOOLCHAIN_FLOORS.jsonl")


def _run(argv, timeout):
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable] + argv, cwd=REPO, capture_output=True,
            text=True, timeout=timeout)
        out = proc.stdout + proc.stderr
        status = "ok" if proc.returncode == 0 else f"exit {proc.returncode}"
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode() if isinstance(e.stdout, bytes)
               else (e.stdout or ""))
        status = "timeout"
    return status, out, round(time.time() - t0, 1)


def _floats(pattern, text):
    return [float(m) for m in re.findall(pattern, text)]


def check_realign(quick):
    """int8 unaligned-slice tax: base vs aligned-control kernel times."""
    argv = ["tools/exp_realign.py"]
    if quick:
        argv += ["--iters", "8"]
    status, out, secs = _run(argv, timeout=2400)
    # exp_realign's summary is its final python-dict line {'base_d9': ...}.
    summary = {}
    for line in out.splitlines():
        if line.startswith("{'"):
            import ast
            try:
                summary = ast.literal_eval(line)
            except (ValueError, SyntaxError):
                pass
    return {"status": status, "secs": secs, "ms_per_call": summary,
            "tail": out.strip().splitlines()[-3:]}


def check_ring_push(quick):
    """bf16 streaming ring-push: dus vs Pallas-DMA lowering, ms/frame."""
    argv = ["tools/exp_ring_push.py", "--reps", "2" if quick else "5"]
    status, out, secs = _run(argv, timeout=2400)
    means = dict(re.findall(r"^(\S+)\s+mean ([\d.]+)", out, re.M))
    return {"status": status, "secs": secs,
            "ms_per_frame_mean": {k: float(v) for k, v in means.items()},
            "tail": out.strip().splitlines()[-4:]}


def check_stream_fused(quick):
    """bf16 fused streaming engine vs the XLA per-layer engine, ms/frame."""
    argv = ["tools/exp_stream_ab.py", "--engines", "bf16,bf16_fused",
            "--reps", "2" if quick else "4"]
    status, out, secs = _run(argv, timeout=2400)
    # exp_stream_ab prints per-rep lines only; average them per engine.
    reps = {}
    for name, ms in re.findall(r"^rep \d+ (\S+)\s+([\d.]+) ms/frame",
                               out, re.M):
        reps.setdefault(name, []).append(float(ms))
    means = {k: round(sum(v) / len(v), 4) for k, v in reps.items()}
    return {"status": status, "secs": secs, "ms_per_frame_mean": means,
            "tail": out.strip().splitlines()[-4:]}


def check_train_engine(quick):
    """Fused-Pallas vs XLA train step, ms/step + ratio."""
    argv = ["tools/exp_train_engine_ab.py", "--reps", "2" if quick else "4"]
    status, out, secs = _run(argv, timeout=2400)
    means = dict(re.findall(r"^(\S+)\s+mean ([\d.]+)", out, re.M))
    ratios = _floats(r"pallas/xla ratio ([\d.]+)", out)
    return {"status": status, "secs": secs,
            "ms_per_step_mean": {k: float(v) for k, v in means.items()},
            "pallas_over_xla": ratios[-1] if ratios else None,
            "tail": out.strip().splitlines()[-4:]}


def check_gather(quick):
    """Pallas DMA-ring batch-assembly gather vs the XLA gather, full train
    step ms (gates the --gather-impl auto default)."""
    argv = ["tools/exp_gather_step_ab.py", "--reps", "2" if quick else "5"]
    status, out, secs = _run(argv, timeout=2400)
    means = dict(re.findall(r"^(\S+)\s+mean ([\d.]+)", out, re.M))
    ratios = _floats(r"pallas/xla ratio ([\d.]+)", out)
    bits = re.findall(r"bitwise loss equality: (\w+)", out)
    return {"status": status, "secs": secs,
            "ms_per_step_mean": {k: float(v) for k, v in means.items()},
            "pallas_over_xla": ratios[-1] if ratios else None,
            "bitwise": bits[-1] if bits else None,
            "tail": out.strip().splitlines()[-4:]}


CHECKS = {
    "realign": check_realign,
    "ring_push": check_ring_push,
    "stream_fused": check_stream_fused,
    "train_engine": check_train_engine,
    "gather": check_gather,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of checks (default: all): "
                         + ",".join(CHECKS))
    ap.add_argument("--quick", action="store_true",
                    help="fewer reps — smoke pass, still recorded (marked)")
    ap.add_argument("--no-record", action="store_true",
                    help="print only; do not append to TOOLCHAIN_FLOORS.jsonl")
    args = ap.parse_args()

    names = list(CHECKS) if args.only is None else [
        s.strip() for s in args.only.split(",")]
    unknown = set(names) - set(CHECKS)
    if unknown:
        raise SystemExit(f"unknown checks {sorted(unknown)}")

    import jax
    record = {
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "jax": jax.__version__,
        "jaxlib": getattr(__import__("jaxlib"), "__version__", "?"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "quick": bool(args.quick),
        "checks": {},
    }
    for name in names:
        print(f"=== {name} ===", flush=True)
        result = CHECKS[name](args.quick)
        record["checks"][name] = result
        print(json.dumps(result, indent=2), flush=True)

    if not args.no_record:
        with open(RECORD, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(f"appended record to {RECORD}")


if __name__ == "__main__":
    main()
