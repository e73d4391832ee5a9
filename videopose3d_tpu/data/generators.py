"""On-device batch generation for training and evaluation.

Capability parity target: ``/root/reference/common/generators.py`` —
``ChunkedGenerator`` (:11-165, train) and ``UnchunkedGenerator`` (:168-239, eval).

TPU-first redesign
------------------
The reference's hot-loop bottleneck is re-building every batch on host (window copy +
``np.pad`` + fancy-index flip) and re-uploading it each step
(``/root/reference/run.py:402-406``).  Here the pipeline is split so everything big
lives on device:

* **FlatSequenceDataset** — all videos concatenated into single HBM-resident arrays
  ``(total_frames, J, C)`` plus a tiny ``(num_seqs, 2)`` bounds table.  Uploaded once.
* **ChunkedPairSampler** (host) — reproduces the reference's chunk enumeration,
  per-epoch ``RandomState`` shuffle, ``endless`` mid-epoch state, and
  RNG-state-in-checkpoint resume semantics *bit-for-bit*; but it only manipulates a
  ``(num_pairs, 4)`` int64 metadata array.  Per step it emits a ``(B, 4)`` int32
  descriptor — the only host->device transfer in the training loop.
* **assemble_chunked_batch** (device, inside jit) — turns descriptors into batches
  with gathers: edge-replication padding is an index *clamp*, horizontal flip is an
  x-sign mask + static joint permutation, camera flip negates intrinsics 2 and 7.
  XLA fuses all of it into the training step.

Shapes are fully static: the final partial batch is padded with repeated rows and a
``(B,)`` validity mask is returned for masked losses (the reference instead yields a
smaller final batch, ``generators.py:154-160``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FlatSequenceDataset:
    """Concatenates per-video arrays into flat device-resident arrays.

    Args:
      poses_2d: list of (N_i, J, C) float arrays (C = 2 or 3 when detections carry
        confidence scores; the model consumes whatever C the archive provides,
        matching the reference which feeds ``poses_2d[0].shape[-1]`` as
        ``in_features``, ``run.py:174``).
      poses_3d: optional list of (N_i, J3, 3) arrays, same count/lengths.
      cameras: optional list of (9,) intrinsic vectors, one per video.
    """

    def __init__(self, poses_2d: Sequence[np.ndarray],
                 poses_3d: Optional[Sequence[np.ndarray]] = None,
                 cameras: Optional[Sequence[np.ndarray]] = None,
                 margins: Optional[Tuple[int, int, int, int]] = None,
                 flip_perms: Optional[Tuple[Sequence[int],
                                            Optional[Sequence[int]]]] = None):
        assert poses_3d is None or len(poses_3d) == len(poses_2d)
        assert cameras is None or len(cameras) == len(poses_2d)

        lengths = np.array([p.shape[0] for p in poses_2d], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        self.seq_bounds = np.stack([starts, starts + lengths], axis=1).astype(np.int32)
        self.lengths = lengths

        self.flat_2d = np.concatenate(poses_2d, axis=0).astype(np.float32)
        self.flat_3d = (np.concatenate(poses_3d, axis=0).astype(np.float32)
                        if poses_3d is not None else None)
        self.cameras = (np.stack(cameras, axis=0).astype(np.float32)
                        if cameras is not None else None)

        # Contiguous-window fast path: bake the edge-replication margins into
        # the flat arrays so every training window is one contiguous slice
        # (dynamic_slice) instead of a per-row gather — per-row gathers of
        # 136-byte rows run ~10x below HBM bandwidth on TPU.
        # margins = (left_2d, right_2d, left_3d, right_3d) in frames.
        self.base_2d = self.base_3d = None
        self.flat_2d_padded = self.flat_3d_padded = None
        self.margins = (tuple(int(m) for m in margins)
                        if margins is not None else None)
        if margins is not None:
            l2, r2, l3, r3 = margins

            def pad_concat(seqs, left, right):
                padded, bases, off = [], [], 0
                for s in seqs:
                    p = np.concatenate(
                        [np.repeat(s[:1], left, axis=0), s,
                         np.repeat(s[-1:], right, axis=0)], axis=0)
                    padded.append(p.astype(np.float32))
                    bases.append(off + left)
                    off += p.shape[0]
                return np.concatenate(padded, axis=0), np.asarray(bases, np.int32)

            self.flat_2d_padded, self.base_2d = pad_concat(poses_2d, l2, r2)
            if poses_3d is not None:
                self.flat_3d_padded, self.base_3d = pad_concat(poses_3d, l3, r3)

        # Flip-as-index trick: store a pre-flipped copy (x negated + left/right
        # joints swapped) appended after the normal one, so horizontal-flip
        # augmentation in the jitted step is pure index arithmetic
        # (row += flip * offset) instead of a joint-permutation gather + x-sign
        # scatter (measured ~1.5 ms/step at B=1024 on v5e).  Costs 2x HBM for
        # the flat training arrays.
        self.aug_offset_2d = self.aug_offset_3d = 0
        if flip_perms is not None and self.flat_2d_padded is not None:
            kps_perm, joints_perm = flip_perms

            def with_flipped(arr, perm):
                # Fancy indexing already yields a fresh writable array; a
                # .copy() here would transiently double peak host memory on
                # H36M-scale flat arrays.
                flipped = arr[:, np.asarray(perm, np.int64)]
                flipped[..., 0] *= -1
                return np.concatenate([arr, flipped], axis=0)

            self.aug_offset_2d = self.flat_2d_padded.shape[0]
            self.flat_2d_padded = with_flipped(self.flat_2d_padded, kps_perm)
            if self.flat_3d_padded is not None and joints_perm is not None:
                self.aug_offset_3d = self.flat_3d_padded.shape[0]
                self.flat_3d_padded = with_flipped(
                    self.flat_3d_padded, joints_perm)

    @staticmethod
    def training_margins(pad: int, causal_shift: int, chunk_length: int):
        """Margins covering every window the chunk enumeration can request:
        2D windows span [start_3d - pad - shift, end_3d + pad - shift) with
        start_3d >= -(chunk-1) and end_3d <= N + (chunk-1)."""
        c = chunk_length - 1
        return (pad + causal_shift + c, pad - causal_shift + c, c, c)

    @property
    def num_sequences(self) -> int:
        return len(self.lengths)

    @property
    def num_frames(self) -> int:
        return int(self.lengths.sum())

    def to_device(self, sharding=None, include_unpadded: bool = False,
                  dtype_2d=None, flatten_2d: bool = False,
                  lane_pad_2d: bool = False, flatten_3d: bool = False,
                  lane_pad_3d: bool = False):
        """Upload the flat arrays once (optionally with an explicit sharding —
        replicated for data-parallel training).

        With the contiguous fast path baked in, nothing reads the unpadded
        flat arrays on device, so their upload is skipped by default (they
        would otherwise duplicate the whole dataset in HBM on every device);
        pass ``include_unpadded=True`` to upload both representations (the
        gather-path parity tests do).

        ``dtype_2d`` stores the padded 2D stream in that dtype (bf16 halves
        the assembly-gather HBM traffic AND the dataset's device footprint).
        Bit-identical for ``compute_dtype="bfloat16"`` training — the first
        matmul casts its operand to bf16 anyway, and every op between the
        stored array and that cast (dynamic_slice windows, the baked
        pre-flipped copy's x negation) is exact in bf16 — so quantizing at
        upload equals quantizing at the cast.  Do NOT use for f32/mixed
        compute (there the cast after BN-free ops would change numerics) or
        for semi-supervised UNLABELED data (its keypoints are also the f32
        reprojection-loss target).

        ``flatten_2d`` stores the padded 2D stream as ``(rows, J*F)`` instead
        of ``(rows, J, F)``: values identical (the model flattens its input
        anyway, ``models/temporal.py::_prep_input``), but the batch gather's
        output drops its minor-dim-2 tiling and the layout copy XLA inserts
        before the first conv (measured -1.3%/step at the flagship shape,
        5/5 interleaved reps, bitwise-equal losses — tools/exp_gather_flat.py).
        Requires baked flip copies (``flip_perms``): without them the flip
        permutation runs on the gathered batch and needs the joint axis.
        Not for semi-supervised unlabeled data (reprojection target needs
        ``(B, T, J, 2)``).

        ``lane_pad_2d`` (requires ``flatten_2d``) additionally zero-pads the
        flattened width to a multiple of 128 lanes, which is what the Pallas
        DMA gather needs to compile on TPU (Mosaic only DMAs whole 128-lane
        tiles).  Values are untouched — the pad columns are sliced off again
        inside the batch assembly (``cols_2d`` records the logical width) —
        but the stream's HBM footprint grows to the padded width, so the
        runner only turns this on where the DMA gather will actually run
        (single-device TPU training).

        ``flatten_3d`` / ``lane_pad_3d`` are the same treatment for the 3D
        target stream (``(rows, J, 3)`` -> ``(rows, J*3)``), making it
        eligible for the Pallas DMA gather too.  Unlike the 2D case the
        batch assembly always reshapes the gathered 3D windows back to the
        joint axis (losses need ``(B, T, J, 3)``) — flattening here is purely
        a gather-engine enabler, values bitwise-identical."""
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        maybe = lambda x: put(x) if x is not None else None
        cast2 = (lambda x: x if x is None or dtype_2d is None
                 else x.astype(dtype_2d))
        skip = self.flat_2d_padded is not None and not include_unpadded

        def flatten_stream(flat, aug_offset, lane_pad, what):
            """(rows, J, F) -> (rows, J*F) + DMA tail margin + lane pad."""
            if flat is None or aug_offset == 0:
                raise ValueError(
                    f"flatten_{what} requires the contiguous fast path with "
                    "baked flip copies (margins= + flip_perms=): the "
                    "on-device flip permutation needs the joint axis")
            if include_unpadded:
                raise ValueError(
                    f"flatten_{what} is incompatible with include_unpadded "
                    "(the unpadded gather path flips on the joint axis)")
            flat = flat.reshape(flat.shape[0], -1)
            # Tail margin for the Pallas DMA gather (gather_rows.py): its
            # aligned-floor window DMA may read up to sublanes-1 rows past
            # the last window row.  Values are never used — the rows only
            # keep the read in bounds.
            from videopose3d_tpu.ops.pallas.gather_rows import (
                GATHER_TAIL_MARGIN)
            flat = np.concatenate(
                [flat,
                 np.zeros((GATHER_TAIL_MARGIN, flat.shape[1]), flat.dtype)],
                axis=0)
            cols = flat.shape[1]
            if lane_pad and flat.shape[1] % 128:
                flat = np.concatenate(
                    [flat,
                     np.zeros((flat.shape[0], -flat.shape[1] % 128),
                              flat.dtype)], axis=1)
            return flat, GATHER_TAIL_MARGIN, cols

        flat2p, gather_margin, cols_2d = self.flat_2d_padded, 0, None
        if flatten_2d:
            flat2p, gather_margin, cols_2d = flatten_stream(
                flat2p, self.aug_offset_2d, lane_pad_2d, "2d")
        elif lane_pad_2d:
            raise ValueError("lane_pad_2d requires flatten_2d=True")
        flat3p, gather_margin_3d, cols_3d = self.flat_3d_padded, 0, None
        if flatten_3d:
            flat3p, gather_margin_3d, cols_3d = flatten_stream(
                flat3p, self.aug_offset_3d, lane_pad_3d, "3d")
        elif lane_pad_3d:
            raise ValueError("lane_pad_3d requires flatten_3d=True")
        return DeviceArrays(
            flat_2d=None if skip else put(cast2(self.flat_2d)),
            flat_3d=None if skip else maybe(self.flat_3d),
            cameras=maybe(self.cameras),
            seq_bounds=put(self.seq_bounds),
            flat_2d_padded=maybe(cast2(flat2p)),
            flat_3d_padded=maybe(flat3p),
            base_2d=maybe(self.base_2d),
            base_3d=maybe(self.base_3d),
            aug_offset_2d=self.aug_offset_2d,
            aug_offset_3d=self.aug_offset_3d,
            margins=self.margins,
            gather_margin_2d=gather_margin,
            cols_2d=cols_2d,
            gather_margin_3d=gather_margin_3d,
            cols_3d=cols_3d,
        )


class DeviceArrays:
    """Handle to the device-resident dataset arrays."""

    def __init__(self, flat_2d, flat_3d, cameras, seq_bounds,
                 flat_2d_padded=None, flat_3d_padded=None,
                 base_2d=None, base_3d=None,
                 aug_offset_2d=0, aug_offset_3d=0, margins=None,
                 gather_margin_2d=0, cols_2d=None,
                 gather_margin_3d=0, cols_3d=None):
        self.flat_2d = flat_2d
        self.flat_3d = flat_3d
        self.cameras = cameras
        self.seq_bounds = seq_bounds
        self.flat_2d_padded = flat_2d_padded
        self.flat_3d_padded = flat_3d_padded
        self.base_2d = base_2d
        self.base_3d = base_3d
        self.aug_offset_2d = aug_offset_2d
        self.aug_offset_3d = aug_offset_3d
        self.margins = margins
        # Rows of zero tail margin past the last addressable 2D window row
        # (to_device(flatten_2d=True) appends GATHER_TAIL_MARGIN); > 0 makes
        # the stream eligible for the Pallas DMA gather (gather_rows.py).
        self.gather_margin_2d = gather_margin_2d
        # Logical flattened 2D width (J*F) when the stream is flattened; the
        # physical width may exceed it under lane_pad_2d.
        self.cols_2d = cols_2d
        # Same pair for the 3D target stream (flatten_3d / lane_pad_3d).
        self.gather_margin_3d = gather_margin_3d
        self.cols_3d = cols_3d

    @property
    def has_contiguous(self) -> bool:
        return self.base_2d is not None

    @property
    def has_baked_flip(self) -> bool:
        return self.aug_offset_2d > 0


class ChunkedPairSampler:
    """Host-side chunk enumerator: parity with ``ChunkedGenerator``'s lineage logic.

    Produces the same (seq, start, end, flip) pair sequence, in the same shuffled
    order for the same ``random_seed``, as ``generators.py:39-48`` + ``:89-97``:
    the pairs live in an ``(N, 4)`` int64 array exactly like the reference's
    ``np.random.RandomState.permutation`` sees them.

    Yields ``(meta, n_valid)`` where ``meta`` is an ``(batch_size, 4)`` int32 array
    of ``(seq_idx, start_3d, end_3d, flip)`` descriptors; rows past ``n_valid`` are
    copies of row 0 and must be masked out (the reference yields a short batch
    instead, ``generators.py:104``).
    """

    def __init__(self, num_sequences_lengths: Sequence[int], batch_size: int,
                 chunk_length: int, *, shuffle: bool = True, random_seed: int = 1234,
                 augment: bool = False, endless: bool = False,
                 use_native: Optional[bool] = None):
        pairs = []
        for i, seq_len in enumerate(num_sequences_lengths):
            n_chunks = (seq_len + chunk_length - 1) // chunk_length
            offset = (n_chunks * chunk_length - seq_len) // 2
            bounds = np.arange(n_chunks + 1) * chunk_length - offset
            seq_col = np.full(n_chunks, i, dtype=np.int64)
            zeros = np.zeros(n_chunks, dtype=np.int64)
            pairs.append(np.stack([seq_col, bounds[:-1], bounds[1:], zeros], axis=1))
            if augment:
                pairs.append(np.stack(
                    [seq_col, bounds[:-1], bounds[1:], 1 - zeros], axis=1))
        self.pairs = (np.concatenate(pairs, axis=0) if pairs
                      else np.zeros((0, 4), dtype=np.int64))

        self.batch_size = batch_size
        self.chunk_length = chunk_length
        self.num_batches = (len(self.pairs) + batch_size - 1) // batch_size
        self.random = np.random.RandomState(random_seed)
        self.shuffle = shuffle
        self.augment = augment
        self.endless = endless
        self.state = None  # (next_batch_idx, shuffled_pairs) for endless streams
        self._perm_rng_state = None  # RNG snapshot just before the current draw

        # Optional native (C++) shuffle core — bit-identical permutation and
        # RNG-state trajectory, so it composes with checkpoint resume.
        if use_native is None:
            from videopose3d_tpu import native
            use_native = native.available()
        self.use_native = use_native

    def num_frames(self) -> int:
        # Parity: generators.py:77-78 (rounds up to full batches).
        return self.num_batches * self.batch_size

    def augment_enabled(self) -> bool:
        return self.augment

    # -- RNG-state checkpointing (parity: generators.py:80-84, run.py:603) --

    def random_state(self):
        return self.random.get_state()

    def set_random_state(self, state):
        if isinstance(state, np.random.RandomState):
            self.random = state
        else:
            self.random.set_state(state)

    def _shuffled_pairs(self):
        if self.use_native:
            from videopose3d_tpu import native
            return native.permute_rows(self.random, self.pairs)
        return self.random.permutation(self.pairs)

    def _next_pairs(self):
        if self.state is None:
            # Snapshot the RNG before drawing: (snapshot, batch index) is a
            # compact, exactly-replayable encoding of a mid-permutation
            # position (see stream_state).
            self._perm_rng_state = self.random.get_state()
            pairs = self._shuffled_pairs() if self.shuffle else self.pairs
            return 0, pairs
        return self.state

    def stream_state(self):
        """Mid-permutation position of an endless stream, checkpoint-compact:
        ``(next_batch_idx, RNG state captured just before the current
        permutation was drawn)`` — ~2.5 KB instead of the full shuffled pair
        array.  None at a permutation boundary or for epoch-mode samplers."""
        if self.state is None or self._perm_rng_state is None:
            return None
        return (int(self.state[0]), self._perm_rng_state)

    def set_stream_state(self, stream_state):
        """Resume an endless stream mid-permutation, continuation-exact:
        rewind the RNG to the pre-draw snapshot, re-draw the identical
        permutation (leaving the RNG positioned exactly as it was after the
        original draw), and skip to the saved batch index.

        Beyond-reference: the reference checkpoints only the semi stream's
        RNG (``run.py:607``), so its resumed unlabeled stream restarts a
        fresh permutation instead of continuing — pass None for that
        behavior."""
        if stream_state is None:
            self.state = None
            return
        start_idx, rng_state = stream_state
        self.random.set_state(rng_state)
        self._perm_rng_state = self.random.get_state()
        pairs = self._shuffled_pairs() if self.shuffle else self.pairs
        self.state = (int(start_idx), pairs)

    def next_epoch(self):
        if self.endless and self.num_batches == 0:
            # An endless iterator over zero pairs would busy-spin forever
            # (the for-loop body never runs, state resets every lap).
            raise ValueError(
                "no training chunks to sample: every sequence is empty")
        enabled = True
        while enabled:
            start_idx, pairs = self._next_pairs()
            for b_i in range(start_idx, self.num_batches):
                chunks = pairs[b_i * self.batch_size: (b_i + 1) * self.batch_size]
                n_valid = len(chunks)
                if n_valid < self.batch_size:
                    filler = np.broadcast_to(
                        chunks[0], (self.batch_size - n_valid, 4))
                    chunks = np.concatenate([chunks, filler], axis=0)
                if self.endless:
                    self.state = (b_i + 1, pairs)
                yield chunks.astype(np.int32), n_valid
            if self.endless:
                self.state = None
            else:
                enabled = False


def _apply_flip(flip, batch_2d, batch_3d, cam, kps_flip_perm, joints_flip_perm):
    """Shared augmentation tail: negate x and permute left<->right columns on
    the flipped rows; negate camera intrinsics 2 (center x) and 7 (tangential x).
    Parity: generators.py:120-149.  The x negation is a broadcast sign multiply
    (fuses into the select) rather than an indexed update (which lowers to a
    full-tensor dynamic-update-slice on TPU)."""

    def neg_x(arr):
        sign = jnp.ones((arr.shape[-1],), arr.dtype).at[0].set(-1.0)
        return arr * sign

    if batch_2d is not None:
        kps_perm = jnp.asarray(np.array(kps_flip_perm, dtype=np.int32))
        flipped_2d = neg_x(batch_2d[:, :, kps_perm, :])
        batch_2d = jnp.where(flip[:, None, None, None], flipped_2d, batch_2d)

    if batch_3d is not None:
        joints_perm = jnp.asarray(np.array(joints_flip_perm, dtype=np.int32))
        flipped_3d = neg_x(batch_3d[:, :, joints_perm, :])
        batch_3d = jnp.where(flip[:, None, None, None], flipped_3d, batch_3d)

    if cam is not None:
        sign = jnp.ones((9,), cam.dtype).at[2].set(-1.0).at[7].set(-1.0)
        cam = jnp.where(flip[:, None], cam * sign, cam)

    return batch_2d, batch_3d, cam


@functools.partial(
    jax.jit,
    static_argnames=("pad", "causal_shift", "chunk_length", "kps_flip_perm",
                     "joints_flip_perm", "with_3d", "with_cameras"),
)
def assemble_chunked_batch(
    flat_2d, flat_3d, cameras, seq_bounds, meta, *,
    pad: int, causal_shift: int, chunk_length: int,
    kps_flip_perm: Tuple[int, ...], joints_flip_perm: Tuple[int, ...],
    with_3d: bool = True, with_cameras: bool = False,
):
    """Build (cam, batch_3d, batch_2d) on device from chunk descriptors.

    Semantics parity with ``generators.py:99-149``:

    * 2D window = ``[start_3d - pad - causal_shift, end_3d + pad - causal_shift)``,
      edge-replication padded at sequence boundaries (here: index clamp).
    * 3D window = ``[start_3d, end_3d)``, same edge rule.
    * flip: negate x of every keypoint/joint and swap left<->right columns; negate
      camera params 2 (center x) and 7 (tangential x).

    Args:
      meta: (B, 4) int32 ``(seq_idx, start_3d, end_3d, flip)``.

    Returns:
      (cam | None, batch_3d | None, batch_2d) with static shapes
      (B, 9), (B, chunk, J3, 3), (B, chunk + 2*pad, J, C).
    """
    seq = meta[:, 0]
    start_3d = meta[:, 1]
    flip = meta[:, 3].astype(bool)

    lo = seq_bounds[seq, 0]
    hi = seq_bounds[seq, 1]

    def gather_window(flat, start, length):
        rel = start[:, None] + jnp.arange(length, dtype=jnp.int32)[None, :]
        clamped = jnp.clip(rel, 0, (hi - lo - 1)[:, None])
        rows = lo[:, None] + clamped
        out = jnp.take(flat, rows.reshape(-1), axis=0)
        return out.reshape((meta.shape[0], length) + flat.shape[1:])

    win_2d = chunk_length + 2 * pad
    start_2d = start_3d - pad - causal_shift
    batch_2d = gather_window(flat_2d, start_2d, win_2d)
    batch_3d = gather_window(flat_3d, start_3d, chunk_length) if with_3d else None
    cam = cameras[seq] if with_cameras else None

    batch_2d, batch_3d, cam = _apply_flip(
        flip, batch_2d, batch_3d, cam, kps_flip_perm, joints_flip_perm)
    return cam, batch_3d, batch_2d


@functools.partial(
    jax.jit,
    static_argnames=("pad", "causal_shift", "chunk_length", "kps_flip_perm",
                     "joints_flip_perm", "with_3d", "with_cameras",
                     "aug_offset_2d", "aug_offset_3d", "gather_impl",
                     "cols_2d", "gather_impl_3d", "cols_3d", "joint_axis_2d"),
)
def assemble_chunked_batch_contiguous(
    flat_2d_padded, flat_3d_padded, cameras, base_2d, base_3d, meta, *,
    pad: int, causal_shift: int, chunk_length: int,
    kps_flip_perm: Tuple[int, ...], joints_flip_perm: Tuple[int, ...],
    with_3d: bool = True, with_cameras: bool = False,
    aug_offset_2d: int = 0, aug_offset_3d: int = 0,
    gather_impl: str = "xla", cols_2d: int = 0,
    gather_impl_3d: str = "xla", cols_3d: int = 0,
    joint_axis_2d: bool = False,
):
    """Fast-path batch assembly over margin-padded flat arrays: every window is
    one contiguous ``dynamic_slice`` (requires ``FlatSequenceDataset(...,
    margins=FlatSequenceDataset.training_margins(...))``).  Semantically
    identical to :func:`assemble_chunked_batch` — the baked-in edge replication
    equals the index clamp.

    With ``aug_offset_*`` > 0 (``FlatSequenceDataset(..., flip_perms=...)``),
    the flat arrays carry a pre-flipped copy and horizontal flip reduces to
    adding the offset to the window start — no permutation gather, no sign
    scatter in the step.

    ``gather_impl`` selects how the 2D windows are copied: ``"xla"`` (the
    vmap(dynamic_slice) row gather), ``"pallas"`` (the DMA-ring kernel in
    ``ops/pallas/gather_rows.py`` — requires the rank-2 ``flatten_2d``
    stream with its tail margin; bitwise-equal output), or
    ``"pallas_interpret"`` (the same kernel interpreted, for CPU tests).
    ``gather_impl_3d`` is the same choice for the 3D target windows when the
    stream is rank-2 (``flatten_3d``); the gathered windows are always
    reshaped back to ``(B, chunk, J, 3)`` (losses need the joint axis), so
    the flattening is invisible downstream.  ``joint_axis_2d`` reshapes the
    gathered 2D windows back to ``(B, win, J, F)`` when the stream is
    rank-2 — the semi-supervised trainer needs the joint axis (its unlabeled
    keypoints double as the reprojection target); bitwise-equal values."""
    seq = meta[:, 0]
    start_3d = meta[:, 1]
    flip = meta[:, 3].astype(bool)

    win_2d = chunk_length + 2 * pad
    row0_2d = base_2d[seq] + start_3d - pad - causal_shift
    if aug_offset_2d:
        row0_2d = row0_2d + meta[:, 3] * aug_offset_2d

    def slice_window(flat, length):
        def one(r):
            return jax.lax.dynamic_slice(
                flat, (r,) + (0,) * (flat.ndim - 1), (length,) + flat.shape[1:])
        return jax.vmap(one)

    def gather_stream(flat, row0, window, impl, cols):
        """One window copy over a flat stream.  The physical width may exceed
        the logical ``cols`` under lane_pad_*; both impls emit the logical
        width (the Pallas kernel slices in-kernel)."""
        pad_cols = flat.ndim == 2 and cols and flat.shape[1] != cols
        if impl in ("pallas", "pallas_interpret"):
            from videopose3d_tpu.ops.pallas.gather_rows import gather_windows
            return gather_windows(
                flat, row0, window=window,
                out_cols=cols if pad_cols else None,
                interpret=(impl == "pallas_interpret"))
        if impl == "xla":
            out = slice_window(flat, window)(row0)
            return out[..., :cols] if pad_cols else out
        raise ValueError(f"unknown gather_impl {impl!r}")

    batch_2d = gather_stream(flat_2d_padded, row0_2d, win_2d, gather_impl,
                             cols_2d)
    if joint_axis_2d and batch_2d.ndim == 3:
        j = len(kps_flip_perm)
        batch_2d = batch_2d.reshape(batch_2d.shape[0], win_2d, j, -1)
    batch_3d = None
    if with_3d:
        row0_3d = base_3d[seq] + start_3d
        if aug_offset_3d:
            row0_3d = row0_3d + meta[:, 3] * aug_offset_3d
        batch_3d = gather_stream(flat_3d_padded, row0_3d, chunk_length,
                                 gather_impl_3d, cols_3d)
        if batch_3d.ndim == 3:  # flattened stream -> restore the joint axis
            j3 = len(joints_flip_perm)
            batch_3d = batch_3d.reshape(
                batch_3d.shape[0], chunk_length, j3, -1)
    cam = cameras[seq] if with_cameras else None

    batch_2d_flip = None if aug_offset_2d else batch_2d
    batch_3d_flip = None if (aug_offset_3d or not with_3d) else batch_3d
    flipped_2d, flipped_3d, cam = _apply_flip(
        flip, batch_2d_flip, batch_3d_flip, cam, kps_flip_perm,
        joints_flip_perm)
    if not aug_offset_2d:
        batch_2d = flipped_2d
    if with_3d and not aug_offset_3d:
        batch_3d = flipped_3d
    return cam, batch_3d, batch_2d


class UnchunkedBatcher:
    """Whole-sequence evaluation batches with optional test-time flip augmentation.

    Parity target: ``UnchunkedGenerator`` (``generators.py:168-239``): yields one
    full video per step; 2D input edge-padded by ``(pad + causal_shift,
    pad - causal_shift)``; with ``augment`` the batch has two rows
    [original, flipped].

    TPU adaptation: sequence lengths are ragged, so the padded 2D input is
    right-padded to the next multiple of ``bucket`` frames (replicating the last
    frame).  A valid-frame count is returned; the extra model outputs are sliced
    off on host.  Bucketing bounds the number of distinct XLA compilations to
    O(max_len / bucket) instead of one per video length.
    """

    def __init__(self, cameras, poses_3d, poses_2d, *, pad: int = 0,
                 causal_shift: int = 0, augment: bool = False,
                 kps_flip_perm: Optional[np.ndarray] = None,
                 joints_flip_perm: Optional[np.ndarray] = None,
                 bucket: int = 128, bucket_pow2: bool = False):
        assert poses_3d is None or len(poses_3d) == len(poses_2d)
        assert cameras is None or len(cameras) == len(poses_2d)
        if augment and (kps_flip_perm is None or joints_flip_perm is None):
            raise ValueError(
                "test-time augmentation requires kps_flip_perm and "
                "joints_flip_perm")
        self.cameras = cameras
        self.poses_3d = poses_3d
        self.poses_2d = poses_2d
        self.pad = pad
        self.causal_shift = causal_shift
        self.augment = augment
        self.kps_flip_perm = kps_flip_perm
        self.joints_flip_perm = joints_flip_perm
        self.bucket = bucket
        # pow2 mode bounds the number of distinct XLA compilations to
        # O(log(max_len)) instead of O(max_len / bucket) — useful when each
        # compile is expensive (e.g. tunneled-TPU remote compilation).
        self.bucket_pow2 = bucket_pow2

    def num_frames(self) -> int:
        return sum(p.shape[0] for p in self.poses_2d)

    def augment_enabled(self) -> bool:
        return self.augment

    def set_augment(self, augment: bool):
        if augment and (self.kps_flip_perm is None
                        or self.joints_flip_perm is None):
            raise ValueError(
                "test-time augmentation requires kps_flip_perm and "
                "joints_flip_perm at construction")
        self.augment = augment

    def next_epoch(self):
        """Yields (cam, seq_3d, padded_2d, n_out_frames) per video.

        ``padded_2d``: (1 or 2, T_bucketed + 2*pad, J, C) — row 1 (if augment) is
        the flipped copy.  ``seq_3d``: (1, N, J3, 3) un-padded ground truth (or
        None).  ``n_out_frames``: N, the number of valid output frames; the model
        produces ``T_bucketed`` outputs of which the first N are real.
        """
        n_videos = len(self.poses_2d)
        for i in range(n_videos):
            seq_2d = self.poses_2d[i]
            seq_3d = self.poses_3d[i] if self.poses_3d is not None else None
            cam = self.cameras[i] if self.cameras is not None else None
            n = seq_2d.shape[0]
            if n == 0:
                # A sequence downsampled to zero frames has nothing to
                # evaluate (and cannot be edge-padded); callers' frame-
                # weighted means are unaffected by skipping it.
                continue

            if self.bucket_pow2:
                t_bucket = self.bucket
                while t_bucket < n:
                    t_bucket *= 2
            else:
                t_bucket = -(-n // self.bucket) * self.bucket
            pad_left = self.pad + self.causal_shift
            pad_right = (self.pad - self.causal_shift) + (t_bucket - n)
            batch_2d = np.pad(
                seq_2d, ((pad_left, pad_right), (0, 0), (0, 0)), "edge")[None]

            batch_3d = None if seq_3d is None else seq_3d[None]
            batch_cam = None if cam is None else np.asarray(cam)[None]
            if self.augment:
                # Fancy indexing already returns a fresh writable array.
                flipped = batch_2d[:, :, self.kps_flip_perm]
                flipped[..., 0] *= -1
                batch_2d = np.concatenate([batch_2d, flipped], axis=0)
                if batch_cam is not None:
                    # Flip the horizontal intrinsics for the mirrored row
                    # (parity: generators.py:225-228).
                    cam_flipped = batch_cam.copy()
                    cam_flipped[0, 2] *= -1
                    cam_flipped[0, 7] *= -1
                    batch_cam = np.concatenate([batch_cam, cam_flipped], axis=0)
            yield batch_cam, batch_3d, batch_2d.astype(np.float32), n
