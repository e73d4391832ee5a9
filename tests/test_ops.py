"""Geometry + loss op tests: internal properties and golden parity vs the reference
PyTorch/numpy implementations (when available)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from videopose3d_tpu.ops import (
    qrot,
    qinverse,
    normalize_screen_coordinates,
    image_coordinates,
    world_to_camera,
    camera_to_world,
    project_to_2d,
    project_to_2d_linear,
    mpjpe,
    weighted_mpjpe,
    n_mpjpe,
    p_mpjpe,
    mean_velocity_error,
)


def _rand_quat(rng, shape):
    q = rng.standard_normal(shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_qrot_preserves_norm(self):
        rng = np.random.default_rng(0)
        q = _rand_quat(rng, (64,))
        v = rng.standard_normal((64, 3)).astype(np.float32)
        out = np.asarray(qrot(q, v))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-4
        )

    def test_qrot_inverse_roundtrip(self):
        rng = np.random.default_rng(1)
        q = _rand_quat(rng, (32,))
        v = rng.standard_normal((32, 3)).astype(np.float32)
        out = np.asarray(qrot(qinverse(q), np.asarray(qrot(q, v))))
        np.testing.assert_allclose(out, v, atol=1e-4)

    def test_qrot_broadcasts(self):
        rng = np.random.default_rng(2)
        q = _rand_quat(rng, ())
        v = rng.standard_normal((5, 7, 3)).astype(np.float32)
        out = np.asarray(qrot(q, v))
        ref = np.stack([np.asarray(qrot(q, v[i])) for i in range(5)])
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_qrot_parity(self, reference_modules):
        rng = np.random.default_rng(3)
        q = _rand_quat(rng, (16, 4))
        v = rng.standard_normal((16, 4, 3)).astype(np.float32)
        ours = np.asarray(qrot(q, v))
        theirs = reference_modules.quaternion.qrot(
            torch.from_numpy(q), torch.from_numpy(v)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestCamera:
    def test_screen_roundtrip(self):
        rng = np.random.default_rng(4)
        X = rng.uniform(0, 1000, (100, 2)).astype(np.float32)
        norm = normalize_screen_coordinates(X, w=1000, h=1002)
        back = np.asarray(image_coordinates(np.asarray(norm), w=1000, h=1002))
        np.testing.assert_allclose(back, X, atol=1e-3)

    def test_world_camera_roundtrip(self):
        rng = np.random.default_rng(5)
        R = _rand_quat(rng, ())
        t = rng.standard_normal(3).astype(np.float32)
        X = rng.standard_normal((50, 17, 3)).astype(np.float32)
        cam = np.asarray(world_to_camera(X, R, t))
        back = np.asarray(camera_to_world(cam, R, t))
        np.testing.assert_allclose(back, X, atol=1e-4)

    def test_project_parity(self, reference_modules):
        rng = np.random.default_rng(6)
        X = rng.standard_normal((8, 5, 17, 3)).astype(np.float32) + np.array(
            [0, 0, 4], dtype=np.float32
        )
        cam = np.concatenate(
            [
                rng.uniform(1.0, 1.2, (8, 2)),   # f
                rng.uniform(-0.1, 0.1, (8, 2)),  # c
                rng.uniform(-0.2, 0.2, (8, 3)),  # k
                rng.uniform(-0.01, 0.01, (8, 2)),# p
            ],
            axis=-1,
        ).astype(np.float32)
        ours = np.asarray(project_to_2d(X, cam))
        theirs = reference_modules.camera.project_to_2d(
            torch.from_numpy(X), torch.from_numpy(cam)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

        ours_lin = np.asarray(project_to_2d_linear(X, cam))
        theirs_lin = reference_modules.camera.project_to_2d_linear(
            torch.from_numpy(X), torch.from_numpy(cam)
        ).numpy()
        np.testing.assert_allclose(ours_lin, theirs_lin, atol=1e-5)

    def test_world_to_camera_parity(self, reference_modules):
        rng = np.random.default_rng(7)
        R = _rand_quat(rng, ())
        t = rng.standard_normal(3).astype(np.float32)
        X = rng.standard_normal((20, 17, 3)).astype(np.float32)
        ours = np.asarray(world_to_camera(X, R, t))
        theirs = reference_modules.camera.world_to_camera(X, R, t)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)
        ours_b = np.asarray(camera_to_world(X, R, t))
        theirs_b = reference_modules.camera.camera_to_world(X, R, t)
        np.testing.assert_allclose(ours_b, theirs_b, atol=1e-5)


class TestLosses:
    def _pair(self, seed, shape=(4, 9, 17, 3)):
        rng = np.random.default_rng(seed)
        a = rng.standard_normal(shape).astype(np.float32)
        b = a + 0.05 * rng.standard_normal(shape).astype(np.float32)
        return a, b

    def test_mpjpe_zero(self):
        a, _ = self._pair(8)
        assert float(mpjpe(a, a)) == 0.0

    def test_mpjpe_parity(self, reference_modules):
        a, b = self._pair(9)
        ours = float(mpjpe(a, b))
        theirs = float(
            reference_modules.loss.mpjpe(torch.from_numpy(a), torch.from_numpy(b))
        )
        assert abs(ours - theirs) < 1e-6

    def test_mpjpe_masked_equals_subset(self):
        a, b = self._pair(10, (2, 6, 17, 3))
        mask = np.zeros((2, 6), np.float32)
        mask[:, :4] = 1
        masked = float(mpjpe(a, b, mask=jnp.asarray(mask)))
        subset = float(mpjpe(a[:, :4], b[:, :4]))
        assert abs(masked - subset) < 1e-6

    def test_weighted_mpjpe_parity(self, reference_modules):
        a, b = self._pair(11)
        w = np.random.default_rng(12).uniform(0.5, 2.0, (4, 9, 17)).astype(np.float32)
        ours = float(weighted_mpjpe(a, b, w))
        theirs = float(
            reference_modules.loss.weighted_mpjpe(
                torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(w)
            )
        )
        assert abs(ours - theirs) < 1e-6

    def test_n_mpjpe_parity(self, reference_modules):
        a, b = self._pair(13)
        ours = float(n_mpjpe(a, b))
        theirs = float(
            reference_modules.loss.n_mpjpe(torch.from_numpy(a), torch.from_numpy(b))
        )
        assert abs(ours - theirs) < 1e-5

    def test_n_mpjpe_scale_invariant(self):
        a, _ = self._pair(14)
        assert float(n_mpjpe(2.0 * a, a)) < 1e-6

    def test_p_mpjpe_parity(self, reference_modules):
        rng = np.random.default_rng(15)
        a = rng.standard_normal((30, 17, 3))
        b = a + 0.05 * rng.standard_normal((30, 17, 3))
        ours = p_mpjpe(b, a)
        theirs = reference_modules.loss.p_mpjpe(b, a)
        assert abs(ours - theirs) < 1e-9

    def test_p_mpjpe_rigid_invariance(self):
        """P-MPJPE of a rigidly transformed pose vs the original is ~0."""
        rng = np.random.default_rng(16)
        a = rng.standard_normal((10, 17, 3))
        q = _rand_quat(rng, ())
        rotated = np.asarray(qrot(np.broadcast_to(q, a.shape[:-1] + (4,)), a))
        transformed = 1.7 * rotated + np.array([1.0, -2.0, 0.5])
        assert p_mpjpe(transformed, a) < 1e-5

    def test_velocity_error_parity(self, reference_modules):
        rng = np.random.default_rng(17)
        a = rng.standard_normal((30, 17, 3))
        b = a + 0.05 * rng.standard_normal((30, 17, 3))
        ours = mean_velocity_error(b, a)
        theirs = reference_modules.loss.mean_velocity_error(b, a)
        assert abs(ours - theirs) < 1e-12


class TestHostDispatch:
    """Camera/quaternion ops on numpy inputs must compute on host in numpy
    (dataset prep moves hundreds of MB; a tunneled-TPU default backend would
    drag it over a ~10 MB/s relay) while staying jit-traceable for the
    in-graph semi-supervised projection loss."""

    def test_numpy_in_numpy_out(self):
        import numpy as np
        from videopose3d_tpu.ops.camera import (
            normalize_screen_coordinates, world_to_camera, camera_to_world,
            project_to_2d)
        X = np.random.default_rng(0).standard_normal((5, 17, 3)).astype(np.float32)
        q = np.array([0.5, 0.5, 0.5, 0.5], np.float32)
        t = np.array([0.1, 0.2, 0.3], np.float32)
        assert type(world_to_camera(X, q, t)) is np.ndarray
        assert type(camera_to_world(X, q, t)) is np.ndarray
        assert type(normalize_screen_coordinates(
            X[..., :2], w=1000, h=1002)) is np.ndarray
        cam = np.zeros((5, 9), np.float32); cam[:, :2] = 1.0
        assert type(project_to_2d(X + np.array([0, 0, 4], np.float32),
                                  cam)) is np.ndarray

    def test_normalize_matches_reference_float64_promotion(self):
        """The [1, h/w] offset must subtract in float64 like the reference's
        bare-list subtraction (bit parity from raw pixel data on non-square
        cameras such as H36M's 1000x1002)."""
        import numpy as np
        from videopose3d_tpu.ops.camera import normalize_screen_coordinates
        X = np.random.default_rng(1).uniform(0, 1000, (100, 2)).astype(np.float32)
        got = normalize_screen_coordinates(X, w=1000, h=1002)
        want = X / 1000 * 2 - [1, 1002 / 1000]     # reference formula verbatim
        assert got.dtype == want.dtype == np.float64
        np.testing.assert_array_equal(got, want)

    def test_jit_traceable(self):
        import jax, jax.numpy as jnp
        import numpy as np
        from videopose3d_tpu.ops.camera import project_to_2d
        X = jnp.asarray(np.random.default_rng(2).standard_normal(
            (3, 17, 3)), jnp.float32) + jnp.asarray([0, 0, 4.0])
        cam = jnp.zeros((3, 9), jnp.float32).at[:, :2].set(1.0)
        out = jax.jit(project_to_2d)(X, cam)
        assert isinstance(out, jax.Array)
        g = jax.grad(lambda x: jnp.sum(project_to_2d(x, cam)))(X)
        assert g.shape == X.shape
