"""Unit tests for the profiling utilities and mesh helpers."""

import json

import numpy as np
import jax
import pytest

from videopose3d_tpu.parallel import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch_size)
from videopose3d_tpu.profiling import StepTimer, device_trace, log_metrics_jsonl


class TestMeshHelpers:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.size == jax.device_count() == 8
        assert mesh.axis_names == ("data",)

    def test_shardings_place_arrays(self):
        mesh = make_mesh()
        x = np.zeros((16, 4), np.float32)
        xb = jax.device_put(x, batch_sharding(mesh))
        xr = jax.device_put(x, replicated_sharding(mesh))
        # Batch-sharded: each device holds 2 rows; replicated: all 16.
        assert xb.sharding.shard_shape(xb.shape) == (2, 4)
        assert xr.sharding.shard_shape(xr.shape) == (16, 4)

    def test_shard_batch_size_rounds_up(self):
        mesh = make_mesh()
        assert shard_batch_size(16, mesh) == 16
        assert shard_batch_size(17, mesh) == 24
        assert shard_batch_size(1, mesh) == 8


class TestStepTimer:
    def test_summary_stats(self):
        t = StepTimer()
        t.start()
        for _ in range(5):
            t.tick()
        s = t.summary()
        assert s["steps"] == 5
        assert s["mean_ms"] >= 0
        assert s["p95_ms"] >= s["p50_ms"] >= 0
        assert "mean" in t.report()
        t.reset()
        assert t.summary() == {}

    def test_device_trace_noop(self):
        with device_trace(None):
            pass  # no-op path must not raise

    def test_metrics_jsonl(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        log_metrics_jsonl(path, {"epoch": 1, "loss": 0.5})
        log_metrics_jsonl(path, {"epoch": 2, "loss": 0.25})
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["epoch"] == 1 and lines[1]["loss"] == 0.25

    def test_metrics_jsonl_creates_parent_dirs(self, tmp_path):
        """--metrics-log into a nonexistent directory must not lose the first
        epoch to a FileNotFoundError at the first write."""
        path = str(tmp_path / "logs" / "run1" / "m.jsonl")
        log_metrics_jsonl(path, {"epoch": 1})
        assert json.loads(open(path).read())["epoch"] == 1


class TestDistributedHelpers:
    def test_initialize_distributed_is_noop_single_host(self, monkeypatch):
        from videopose3d_tpu.parallel import initialize_distributed
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        assert initialize_distributed() is False

    def test_initialize_distributed_noop_on_single_process_env(self, monkeypatch):
        """A launcher exporting JAX_NUM_PROCESSES=1 without a coordinator is
        single-process: the guarded no-op must hold (not crash rendezvous)."""
        from videopose3d_tpu.parallel import initialize_distributed
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
        assert initialize_distributed() is False

    def test_process_info(self):
        from videopose3d_tpu.parallel import process_info
        info = process_info()
        assert info["process_count"] == 1
        assert info["global_device_count"] == jax.device_count()
        assert info["local_device_count"] * info["process_count"] == \
            info["global_device_count"]

    def test_global_batch_array_shards_and_roundtrips(self):
        from videopose3d_tpu.parallel import make_mesh, global_batch_array
        mesh = make_mesh()
        meta = np.arange(8 * mesh.size * 4, dtype=np.int32).reshape(-1, 4)
        arr = global_batch_array(meta, mesh)
        assert arr.shape == meta.shape
        # Sharded on the batch axis: each device holds B/mesh.size rows.
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {meta.shape[0] // mesh.size}
        np.testing.assert_array_equal(np.asarray(arr), meta)

    def test_replicated_array_places_full_copy(self):
        from videopose3d_tpu.parallel import make_mesh, replicated_array
        mesh = make_mesh()
        x = np.arange(24, dtype=np.float32).reshape(6, 4)
        arr = replicated_array(x, mesh)
        shard_shapes = {s.data.shape for s in arr.addressable_shards}
        assert shard_shapes == {x.shape}
        np.testing.assert_array_equal(np.asarray(arr), x)
