"""The FULL CLI driver (``run.py`` / ``runner.main``) executed as a real
2-process ``jax.distributed`` cluster (2 x 4 virtual CPU devices), compared
line-for-line against the single-process 8-device run.

This is the pod-execution test for the driver itself, one level above
``tests/test_distributed.py`` (which proves the trainer-level step): it
exercises the pieces only the runner composes — per-epoch evaluation feeding
pod-replicated params into the Evaluator's shardings-free jit, the epoch-scan
training path, the semi-supervised loop, process-0-only async checkpointing,
resume, and the final action-wise evaluation — under ``process_count > 1``.
Reference anchor: ``/root/reference/run.py:424-549`` (the per-epoch loop a pod
must keep reproducing).

Numerics: training runs with the reference-default dropout 0.25 ON — the mask
stream is drawn inside the pod-wide jit from a replicated threefry key
(``--rng-impl threefry2x32``, partition-invariant by construction), so the
cluster must reproduce the single-process run to f32 summation-order noise.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute; full tier only (--run-slow)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_PY = os.path.join(REPO_ROOT, "run.py")

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
ACTIONS = ["Walking 1", "Eating 1"]
N_FRAMES = 50


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("dist_data")
    p3 = {s: {a: (rng.standard_normal((N_FRAMES, 1, 3)) * 0.1
                  + rng.standard_normal((N_FRAMES, 32, 3)) * 0.2
                  ).astype(np.float32) for a in ACTIONS} for s in SUBJECTS}
    np.savez_compressed(root / "data_3d_h36m.npz", positions_3d=p3)
    p2 = {s: {a: [rng.uniform(100, 900, (N_FRAMES, 17, 2)).astype(np.float32)
                  for _ in range(4)] for a in ACTIONS} for s in SUBJECTS}
    meta = {"layout_name": "h36m", "num_joints": 17,
            "keypoints_symmetry": [[4, 5, 6, 11, 12, 13],
                                   [1, 2, 3, 14, 15, 16]]}
    np.savez_compressed(root / "data_2d_h36m_gt.npz", positions_2d=p2,
                        metadata=meta)
    return str(root)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli_env(local_devices, dist=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU tunnel
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    if dist is not None:
        port, nproc, pid = dist
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(pid)
    return env


def _base_args(data_dir, ckpt, extra=()):
    return ["-d", "h36m", "-k", "gt", "--data-dir", data_dir, "-c", ckpt,
            "-arc", "3,3", "-ch", "16", "-b", "64", "--eval-bucket", "16",
            "--rng-impl", "threefry2x32"] + list(extra)


def _run_single(data_dir, ckpt, extra=()):
    """Single-process control run of the real CLI (8 virtual devices)."""
    p = subprocess.run(
        [sys.executable, RUN_PY] + _base_args(data_dir, ckpt, extra),
        cwd=REPO_ROOT, env=_cli_env(8), capture_output=True, text=True,
        timeout=900)
    assert p.returncode == 0, f"control run failed:\n{p.stdout[-4000:]}\n{p.stderr[-4000:]}"
    return p.stdout


def _run_cluster(data_dir, ckpt, extra=(), nproc=2):
    """The same CLI as a real nproc-process cluster (4 devices each)."""
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, RUN_PY] + _base_args(data_dir, ckpt, extra),
        cwd=REPO_ROOT, env=_cli_env(4, (port, nproc, pid)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"cluster process {pid} failed (rc={p.returncode}):\n{out[-6000:]}")
    return outs


_EPOCH_RE = re.compile(r"^\[(\d+)\] time \S+ (.*)$", re.M)


def _epoch_metrics(stdout):
    """{epoch: {name: value}} from the '[N] time .. lr .. 3d_train ..' lines."""
    out = {}
    for m in _EPOCH_RE.finditer(stdout):
        toks = m.group(2).split()
        out[int(m.group(1))] = {toks[i]: float(toks[i + 1])
                                for i in range(0, len(toks), 2)}
    return out


def _protocol_averages(stdout):
    vals = re.findall(r"action-wise average: ([\d.]+) mm", stdout)
    assert len(vals) == 4, f"expected 4 protocol lines, got {vals}"
    return [float(v) for v in vals]


def _assert_metrics_match(dist, ctrl, rtol):
    assert dist.keys() == ctrl.keys()
    for epoch in ctrl:
        assert dist[epoch].keys() == ctrl[epoch].keys()
        for name, ref in ctrl[epoch].items():
            got = dist[epoch][name]
            np.testing.assert_allclose(
                got, ref, rtol=rtol,
                err_msg=f"epoch {epoch} metric {name}")


def test_runner_two_process_supervised(data_dir, tmp_path):
    """Supervised: 2 epochs (epoch-scan path), per-epoch eval, checkpoints,
    final action-wise evaluation, then resume to epoch 3 under the cluster."""
    ckpt_ctrl = str(tmp_path / "ctrl")
    ckpt_dist = str(tmp_path / "dist")
    train = ["-e", "2", "--checkpoint-frequency", "1"]

    control = _run_single(data_dir, ckpt_ctrl, train)
    outs = _run_cluster(data_dir, ckpt_dist, train)

    ctrl_metrics = _epoch_metrics(control)
    assert set(ctrl_metrics) == {1, 2}
    ctrl_proto = _protocol_averages(control)
    for out in outs:
        assert "distributed runtime: process" in out
        assert "Data-parallel mesh over 8 devices (2 hosts)" in out
        _assert_metrics_match(_epoch_metrics(out), ctrl_metrics, rtol=1e-4)
        np.testing.assert_allclose(_protocol_averages(out), ctrl_proto,
                                   rtol=1e-4)

    # Process 0 wrote the checkpoints; the files must be valid for BOTH the
    # cluster and a plain single-process consumer.
    assert os.path.exists(os.path.join(ckpt_dist, "epoch_2.bin"))

    # Resume under the cluster: epoch 3 must match the single-process resume.
    resume = ["-e", "3", "-r", "epoch_2.bin", "--checkpoint-frequency", "3"]
    control3 = _run_single(data_dir, ckpt_ctrl, resume)
    outs3 = _run_cluster(data_dir, ckpt_dist, resume)
    ctrl3 = _epoch_metrics(control3)
    assert set(ctrl3) == {3}
    for out in outs3:
        assert "This model was trained for 2 epochs" in out
        _assert_metrics_match(_epoch_metrics(out), ctrl3, rtol=1e-4)

    # And a single-process evaluation of the cluster-written checkpoint.
    eval_out = _run_single(data_dir, ckpt_dist, ["--evaluate", "epoch_3.bin"])
    np.testing.assert_allclose(_protocol_averages(eval_out),
                               _protocol_averages(control3), rtol=1e-4)


def test_runner_two_process_semi_supervised(data_dir, tmp_path):
    """Semi-supervised warmup->full loop under the cluster: the 9-metric epoch
    lines (incl. both trajectory models and the unlabeled 2D loss) must match
    the single-process run."""
    ckpt_ctrl = str(tmp_path / "ctrl_semi")
    ckpt_dist = str(tmp_path / "dist_semi")
    semi = ["-e", "2", "--warmup", "1", "-str", "S1", "-sun", "S5,S6",
            "--checkpoint-frequency", "2"]

    control = _run_single(data_dir, ckpt_ctrl, semi)
    outs = _run_cluster(data_dir, ckpt_dist, semi)

    ctrl_metrics = _epoch_metrics(control)
    assert set(ctrl_metrics) == {1, 2}
    assert "2d_train_unsup" in ctrl_metrics[2]
    ctrl_proto = _protocol_averages(control)
    for out in outs:
        assert "Semi-supervision on" in out
        _assert_metrics_match(_epoch_metrics(out), ctrl_metrics, rtol=1e-4)
        np.testing.assert_allclose(_protocol_averages(out), ctrl_proto,
                                   rtol=1e-4)
