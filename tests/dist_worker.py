"""Subprocess worker for tests/test_distributed.py.

Joins a 2-process ``jax.distributed`` cluster (localhost coordinator), 4
virtual CPU devices per process — an 8-device pod in miniature — and runs the
shared training scenario twice:

  1. continuous: 2 epochs (6 steps) over the pod-wide mesh;
  2. resumed: re-runs epoch 1 writing a checkpoint (process 0), then restores
     it in a FRESH trainer on every process and runs epoch 2.

Results are pickled to ``<outdir>/result_<pid>.pkl`` for the test to compare
against the single-process control run.

Usage: python tests/dist_worker.py <proc_id> <nproc> <port> <outdir>
(env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4,
PALLAS_AXON_POOL_IPS= — set by the launching test.)
"""

import os
import pickle
import sys


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    import jax
    # The axon sitecustomize force-registers the TPU backend at interpreter
    # start; env vars alone don't win (see CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from videopose3d_tpu.parallel import initialize_distributed, make_mesh

    assert initialize_distributed(f"localhost:{port}", num_processes=nproc,
                                  process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dist_scenario import run_scenario, run_scenario_scan, run_scenario_semi

    from jax.experimental import multihost_utils

    mesh = make_mesh()

    ckpt = os.path.join(outdir, "ckpt.bin")
    continuous = run_scenario(
        mesh, epochs=2, checkpoint_path=ckpt if proc_id == 0 else None)
    # Process 0 finished writing the epoch-1 checkpoint before returning;
    # barrier so other processes don't read a half-written file.
    multihost_utils.sync_global_devices("checkpoint-written")

    resumed = run_scenario(mesh, epochs=2, resume_from=ckpt)
    scan = run_scenario_scan(mesh, epochs=2)
    semi = run_scenario_semi(mesh, epochs=2, warmup=1)

    with open(os.path.join(outdir, f"result_{proc_id}.pkl"), "wb") as f:
        pickle.dump({"continuous": continuous, "resumed": resumed,
                     "scan": scan, "semi": semi}, f)
    print(f"worker {proc_id}: done", flush=True)


if __name__ == "__main__":
    main()
