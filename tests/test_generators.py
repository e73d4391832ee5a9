"""Data-pipeline parity tests: the host-side pair sampler + on-device batch assembly
must reproduce the reference ChunkedGenerator/UnchunkedGenerator outputs bit-for-bit
(same seed => same shuffled chunk order => same padded/flipped batches)."""

import numpy as np
import pytest

from videopose3d_tpu.data import (
    FlatSequenceDataset,
    ChunkedPairSampler,
    assemble_chunked_batch,
    UnchunkedBatcher,
)

KPS_LEFT = [1, 3, 5]
KPS_RIGHT = [2, 4, 6]
J = 8  # joints


def _flip_perm():
    perm = np.arange(J)
    perm[KPS_LEFT] = KPS_RIGHT
    perm[KPS_RIGHT] = KPS_LEFT
    return perm


def _make_data(seed=0, n_seqs=5, with_3d=True, with_cams=True):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(10, 60, n_seqs)
    poses_2d = [rng.standard_normal((l, J, 2)).astype(np.float32) for l in lengths]
    poses_3d = ([rng.standard_normal((l, J, 3)).astype(np.float32) for l in lengths]
                if with_3d else None)
    cams = ([rng.standard_normal(9).astype(np.float32) for _ in lengths]
            if with_cams else None)
    return poses_2d, poses_3d, cams


def _assemble(ds, dev, meta, pad, causal_shift, chunk, with_3d=True, with_cams=True):
    perm = tuple(_flip_perm().tolist())
    cam, b3, b2 = assemble_chunked_batch(
        dev.flat_2d, dev.flat_3d, dev.cameras, dev.seq_bounds, meta,
        pad=pad, causal_shift=causal_shift, chunk_length=chunk,
        kps_flip_perm=perm, joints_flip_perm=perm,
        with_3d=with_3d, with_cameras=with_cams)
    return (None if cam is None else np.asarray(cam),
            None if b3 is None else np.asarray(b3),
            np.asarray(b2))


@pytest.mark.parametrize("pad,causal_shift,chunk,augment", [
    (3, 0, 1, False),
    (13, 0, 1, True),
    (13, 13, 1, True),
    (4, 0, 5, True),
])
def test_chunked_parity(reference_modules, pad, causal_shift, chunk, augment):
    poses_2d, poses_3d, cams = _make_data()
    batch_size = 16

    ref_gen = reference_modules.generators.ChunkedGenerator(
        batch_size, list(cams), [p.copy() for p in poses_3d],
        [p.copy() for p in poses_2d],
        chunk, pad=pad, causal_shift=causal_shift, shuffle=True, random_seed=1234,
        augment=augment, kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT)

    ds = FlatSequenceDataset(poses_2d, poses_3d, cams)
    dev = ds.to_device()
    sampler = ChunkedPairSampler(
        [p.shape[0] for p in poses_2d], batch_size, chunk,
        shuffle=True, random_seed=1234, augment=augment)

    assert sampler.num_batches == ref_gen.num_batches
    assert sampler.num_frames() == ref_gen.num_frames()

    ours_iter = sampler.next_epoch()
    for ref_cam, ref_3d, ref_2d in ref_gen.next_epoch():
        meta, n_valid = next(ours_iter)
        assert n_valid == ref_2d.shape[0]
        cam, b3, b2 = _assemble(ds, dev, meta, pad, causal_shift, chunk)
        np.testing.assert_allclose(
            b2[:n_valid], ref_2d.astype(np.float32), atol=0, rtol=0)
        np.testing.assert_allclose(
            b3[:n_valid], ref_3d.astype(np.float32), atol=0, rtol=0)
        np.testing.assert_allclose(
            cam[:n_valid], ref_cam.astype(np.float32), atol=0, rtol=0)
    with pytest.raises(StopIteration):
        next(ours_iter)


def test_chunked_no_3d_no_cam(reference_modules):
    poses_2d, _, _ = _make_data(with_3d=False, with_cams=False)
    batch_size = 8
    ref_gen = reference_modules.generators.ChunkedGenerator(
        batch_size, None, None, [p.copy() for p in poses_2d], 1, pad=2,
        causal_shift=0, shuffle=True, random_seed=4321, augment=False)
    ds = FlatSequenceDataset(poses_2d)
    dev = ds.to_device()
    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], batch_size, 1,
                                 shuffle=True, random_seed=4321, augment=False)
    assert sampler.num_batches == ref_gen.num_batches
    ours_iter = sampler.next_epoch()
    for _, _, ref_2d in ref_gen.next_epoch():
        meta, n_valid = next(ours_iter)
        _, _, b2 = _assemble(ds, dev, meta, 2, 0, 1, with_3d=False, with_cams=False)
        np.testing.assert_array_equal(b2[:n_valid], ref_2d.astype(np.float32))
    with pytest.raises(StopIteration):
        next(ours_iter)


def test_endless_state_and_resume(reference_modules):
    """The endless semi-supervised stream keeps mid-epoch state; RNG state
    save/restore reproduces the chunk order from a permutation boundary."""
    poses_2d, _, _ = _make_data(n_seqs=3, with_3d=False, with_cams=False)
    lengths = [p.shape[0] for p in poses_2d]

    s1 = ChunkedPairSampler(lengths, 4, 1, random_seed=4321, augment=True,
                            endless=True)
    it1 = s1.next_epoch()
    seen = [next(it1)[0] for _ in range(2 * s1.num_batches + 3)]  # crosses epochs

    # Restore a fresh sampler from saved RNG state: must replay identically.
    s2 = ChunkedPairSampler(lengths, 4, 1, random_seed=9999, augment=True,
                            endless=True)
    s3 = ChunkedPairSampler(lengths, 4, 1, random_seed=4321, augment=True,
                            endless=True)
    s2.set_random_state(s3.random_state())
    it2 = s2.next_epoch()
    for want in seen:
        got, _ = next(it2)
        np.testing.assert_array_equal(got, want)


def test_endless_stream_state_resumes_mid_permutation():
    """A mid-permutation save/restore continues the stream batch-for-batch.
    The plain RNG state is NOT enough for this (restoring it mid-permutation
    starts a fresh shuffle — the reference's resume semantics, run.py:607);
    stream_state() captures the pre-draw RNG snapshot + batch index and
    replays exactly."""
    poses_2d, _, _ = _make_data(n_seqs=3, with_3d=False, with_cams=False)
    lengths = [p.shape[0] for p in poses_2d]

    s1 = ChunkedPairSampler(lengths, 4, 1, random_seed=4321, augment=True,
                            endless=True)
    it1 = s1.next_epoch()
    for _ in range(3):  # advance mid-permutation
        next(it1)
    saved_rng = s1.random_state()
    saved_stream = s1.stream_state()
    assert saved_stream is not None and saved_stream[0] == 3
    # Continue the original run well past the current permutation.
    upcoming = [next(it1)[0] for _ in range(2 * s1.num_batches)]

    # Plain-RNG restore (reference semantics) diverges mid-permutation...
    s_rng = ChunkedPairSampler(lengths, 4, 1, random_seed=1, augment=True,
                               endless=True)
    s_rng.set_random_state(saved_rng)
    first_rng = next(s_rng.next_epoch())[0]
    assert not np.array_equal(first_rng, upcoming[0])

    # ...while the stream-state restore continues exactly.
    s2 = ChunkedPairSampler(lengths, 4, 1, random_seed=1, augment=True,
                            endless=True)
    s2.set_random_state(saved_rng)
    s2.set_stream_state(saved_stream)
    it2 = s2.next_epoch()
    for want in upcoming:
        np.testing.assert_array_equal(next(it2)[0], want)


@pytest.mark.parametrize("pad,causal_shift,chunk", [
    (3, 0, 1), (13, 0, 1), (13, 13, 1), (4, 0, 5), (0, 0, 3),
])
def test_contiguous_assembly_equals_clamping(pad, causal_shift, chunk):
    """The contiguous fast path (margin-padded flat arrays + dynamic_slice
    windows) produces byte-identical batches to the clamping gather path."""
    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    poses_2d, poses_3d, cams = _make_data(seed=7)
    margins = FlatSequenceDataset.training_margins(pad, causal_shift, chunk)
    ds = FlatSequenceDataset(poses_2d, poses_3d, cams, margins=margins)
    dev = ds.to_device(include_unpadded=True)
    assert dev.has_contiguous

    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, chunk,
                                 augment=True)
    perm = tuple(_flip_perm().tolist())
    for meta, n_valid in sampler.next_epoch():
        want = assemble_chunked_batch(
            dev.flat_2d, dev.flat_3d, dev.cameras, dev.seq_bounds,
            jnp_meta := np.asarray(meta), pad=pad, causal_shift=causal_shift,
            chunk_length=chunk, kps_flip_perm=perm, joints_flip_perm=perm,
            with_3d=True, with_cameras=True)
        got = assemble_chunked_batch_contiguous(
            dev.flat_2d_padded, dev.flat_3d_padded, dev.cameras,
            dev.base_2d, dev.base_3d, jnp_meta, pad=pad,
            causal_shift=causal_shift, chunk_length=chunk,
            kps_flip_perm=perm, joints_flip_perm=perm,
            with_3d=True, with_cameras=True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("pad,causal_shift,chunk", [
    (3, 0, 1), (13, 13, 1), (4, 0, 5),
])
def test_baked_flip_assembly_equals_clamping(pad, causal_shift, chunk):
    """The flip-as-index path (pre-flipped flat copies selected by a row
    offset) produces byte-identical batches to the clamping gather path's
    in-graph permutation + sign flip."""
    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    poses_2d, poses_3d, cams = _make_data(seed=11)
    margins = FlatSequenceDataset.training_margins(pad, causal_shift, chunk)
    perm = tuple(_flip_perm().tolist())
    ds = FlatSequenceDataset(poses_2d, poses_3d, cams, margins=margins,
                             flip_perms=(perm, perm))
    dev = ds.to_device(include_unpadded=True)
    assert dev.has_baked_flip and dev.aug_offset_3d > 0

    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, chunk,
                                 augment=True)
    for meta, n_valid in sampler.next_epoch():
        meta = np.asarray(meta)
        want = assemble_chunked_batch(
            dev.flat_2d, dev.flat_3d, dev.cameras, dev.seq_bounds,
            meta, pad=pad, causal_shift=causal_shift,
            chunk_length=chunk, kps_flip_perm=perm, joints_flip_perm=perm,
            with_3d=True, with_cameras=True)
        got = assemble_chunked_batch_contiguous(
            dev.flat_2d_padded, dev.flat_3d_padded, dev.cameras,
            dev.base_2d, dev.base_3d, meta, pad=pad,
            causal_shift=causal_shift, chunk_length=chunk,
            kps_flip_perm=perm, joints_flip_perm=perm,
            with_3d=True, with_cameras=True,
            aug_offset_2d=dev.aug_offset_2d, aug_offset_3d=dev.aug_offset_3d)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("pad,causal_shift,augment", [
    (13, 0, False), (13, 0, True), (13, 13, True), (0, 0, True),
])
def test_unchunked_parity(reference_modules, pad, causal_shift, augment):
    poses_2d, poses_3d, cams = _make_data(seed=1)
    perm = _flip_perm()

    ref_gen = reference_modules.generators.UnchunkedGenerator(
        list(cams), [p.copy() for p in poses_3d], [p.copy() for p in poses_2d],
        pad=pad, causal_shift=causal_shift, augment=augment,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT)

    ours = UnchunkedBatcher(
        cams, poses_3d, poses_2d, pad=pad, causal_shift=causal_shift,
        augment=augment, kps_flip_perm=perm, joints_flip_perm=perm, bucket=16)
    assert ours.num_frames() == ref_gen.num_frames()

    it = ours.next_epoch()
    for ref_cam, ref_3d, ref_2d in ref_gen.next_epoch():
        cam, b3, b2, n = next(it)
        # Our 2D is right-padded to a bucket multiple; the reference window is a
        # prefix of it (bucket padding replicates the final edge frame).
        t_ref = ref_2d.shape[1]
        np.testing.assert_array_equal(b2[:1, :t_ref], ref_2d.astype(np.float32)[:1])
        if augment:
            np.testing.assert_array_equal(
                b2[1:2, :t_ref], ref_2d.astype(np.float32)[1:2])
        # Bucket padding region replicates the last padded frame.
        np.testing.assert_array_equal(
            b2[:, t_ref:], np.repeat(b2[:, t_ref - 1:t_ref], b2.shape[1] - t_ref,
                                     axis=1))
        assert n == ref_3d.shape[1]
        np.testing.assert_array_equal(b3, ref_3d[:1].astype(np.float32))
        # Camera rows match the reference exactly, including the flipped TTA
        # row (intrinsics 2 and 7 negated) when augmenting.
        np.testing.assert_array_equal(cam, ref_cam.astype(np.float32))


def test_unchunked_skips_empty_sequences():
    """A sequence downsampled to zero frames is skipped (it cannot be
    edge-padded and would NaN frame-weighted protocol means)."""
    seqs = [np.zeros((0, 17, 2), np.float32),
            np.ones((5, 17, 2), np.float32)]
    b = UnchunkedBatcher(None, None, seqs, pad=2, bucket=8)
    yielded = list(b.next_epoch())
    assert len(yielded) == 1
    assert yielded[0][3] == 5


def test_unchunked_augment_requires_perms():
    seqs = [np.ones((5, 17, 2), np.float32)]
    with pytest.raises(ValueError, match="flip_perm"):
        UnchunkedBatcher(None, None, seqs, augment=True)
    b = UnchunkedBatcher(None, None, seqs)
    with pytest.raises(ValueError, match="flip_perm"):
        b.set_augment(True)


@pytest.mark.parametrize("pad,causal_shift,chunk", [(3, 0, 1), (4, 0, 5)])
def test_to_device_dtype_2d_bf16_equals_cast_after_assembly(
        pad, causal_shift, chunk):
    """`to_device(dtype_2d=bf16)` (the dataset-HBM memory knob) is
    bit-identical, for a bf16-compute consumer, to assembling from f32
    storage and casting the assembled batch: every op between storage and
    the model's first-matmul cast — the dynamic_slice windows and the baked
    pre-flipped copy's x negation — is exact in bf16, so quantizing at
    upload equals quantizing at the cast.  Backs the PARITY.md row; the
    real-TPU loss-trajectory + perf A/B is tools/exp_data_dtype_ab.py."""
    import jax.numpy as jnp
    from videopose3d_tpu.data.generators import (
        FlatSequenceDataset, assemble_chunked_batch_contiguous)
    poses_2d, poses_3d, cams = _make_data(seed=13)
    margins = FlatSequenceDataset.training_margins(pad, causal_shift, chunk)
    perm = tuple(_flip_perm().tolist())
    ds = FlatSequenceDataset(poses_2d, poses_3d, cams, margins=margins,
                             flip_perms=(perm, perm))
    dev = ds.to_device()
    dev_b = ds.to_device(dtype_2d=jnp.bfloat16)
    assert dev_b.flat_2d_padded.dtype == jnp.bfloat16
    assert dev_b.flat_3d_padded.dtype == dev.flat_3d_padded.dtype  # 3D stays f32

    sampler = ChunkedPairSampler([p.shape[0] for p in poses_2d], 16, chunk,
                                 augment=True)
    for meta, n_valid in sampler.next_epoch():
        meta = np.asarray(meta)
        kw = dict(pad=pad, causal_shift=causal_shift, chunk_length=chunk,
                  kps_flip_perm=perm, joints_flip_perm=perm,
                  with_3d=True, with_cameras=True,
                  aug_offset_2d=dev.aug_offset_2d,
                  aug_offset_3d=dev.aug_offset_3d)
        _, w3, w2 = assemble_chunked_batch_contiguous(
            dev.flat_2d_padded, dev.flat_3d_padded, dev.cameras,
            dev.base_2d, dev.base_3d, meta, **kw)
        _, g3, g2 = assemble_chunked_batch_contiguous(
            dev_b.flat_2d_padded, dev_b.flat_3d_padded, dev_b.cameras,
            dev_b.base_2d, dev_b.base_3d, meta, **kw)
        assert g2.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(g2, np.float32),
            np.asarray(jnp.asarray(w2).astype(jnp.bfloat16), np.float32))
        np.testing.assert_array_equal(np.asarray(g3), np.asarray(w3))
