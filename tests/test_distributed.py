"""Multi-host data parallelism, tested for real: a 2-process x 4-virtual-device
``jax.distributed`` cluster (localhost coordinator, Gloo collectives) must
match the single-process 8-device mesh numerically, including a checkpoint
write/restore across the process boundary.

This is the pod-execution analogue of ``tests/test_train.py``'s
mesh-vs-single-device test (the reference has no distributed support at all —
``/root/reference/run.py:200-202`` is bare ``.cuda()``; DP over ICI/DCN is a
first-class TPU-build requirement, SURVEY.md §2).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, nproc=2):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU tunnel
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             str(tmp_path)],
            cwd=REPO_ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}")
    return outputs


def _assert_trees_close(a, b, atol):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, atol=atol), a, b)


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    from videopose3d_tpu.parallel import make_mesh
    from dist_scenario import (run_scenario, run_scenario_scan,
                               run_scenario_semi)

    # Controls: the same scenarios over this process's 8 virtual devices.
    mesh = make_mesh()
    control = run_scenario(mesh, epochs=2)
    control_scan = run_scenario_scan(mesh, epochs=2)
    control_semi = run_scenario_semi(mesh, epochs=2, warmup=1)

    # The epoch-scan path must be numerically interchangeable with the
    # stepwise path (same descriptors, same rng stream).
    np.testing.assert_allclose(control_scan["losses"], control["losses"],
                               rtol=1e-5)

    _launch_workers(tmp_path)

    results = {}
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.pkl", "rb") as f:
            results[pid] = pickle.load(f)

    for pid in range(2):
        dist = results[pid]["continuous"]
        np.testing.assert_allclose(dist["losses"], control["losses"],
                                   rtol=1e-5)
        _assert_trees_close(dist["params"], control["params"], 2e-6)
        _assert_trees_close(dist["state"], control["state"], 2e-6)

    # Checkpoint resume across the process boundary: epoch-2 losses and final
    # weights of the resumed run must match the continuous distributed run.
    for pid in range(2):
        cont, res = results[pid]["continuous"], results[pid]["resumed"]
        assert len(res["losses"]) == 3  # epoch 2 only
        np.testing.assert_allclose(res["losses"], cont["losses"][3:],
                                   rtol=1e-5)
        _assert_trees_close(res["params"], cont["params"], 2e-6)
        _assert_trees_close(res["state"], cont["state"], 2e-6)

    # Both processes computed identical replicated results.
    _assert_trees_close(results[0]["continuous"]["params"],
                        results[1]["continuous"]["params"], 0.0)

    # Epoch-as-one-scan under the 2-process cluster == single-process scan.
    for pid in range(2):
        scan = results[pid]["scan"]
        np.testing.assert_allclose(scan["losses"], control_scan["losses"],
                                   rtol=1e-5)
        _assert_trees_close(scan["params"], control_scan["params"], 2e-6)
        _assert_trees_close(scan["state"], control_scan["state"], 2e-6)

    # Semi-supervised (warmup epoch -> full pos+traj+reprojection epoch,
    # endless unlabeled stream) under the cluster == single-process mesh.
    for pid in range(2):
        semi = results[pid]["semi"]
        np.testing.assert_allclose(semi["losses"], control_semi["losses"],
                                   rtol=3e-5, atol=1e-6)
        _assert_trees_close(semi["params"], control_semi["params"], 3e-6)
        _assert_trees_close(semi["states"], control_semi["states"], 3e-6)
