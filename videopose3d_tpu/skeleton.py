"""Kinematic-tree metadata for mocap skeletons.

Behavior parity target: ``/root/reference/common/skeleton.py:10-88`` (same public
API and joint-removal semantics, independent vectorized implementation).
Host-side, numpy-only: the skeleton is static configuration consumed at
graph-build time (joint counts, left/right symmetry permutations for flip
augmentation, parent indices for the bone-length loss), never traced.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class Skeleton:
    """A kinematic tree: a parent-index array (root = -1) plus left/right
    symmetry joint lists.  Derived metadata (children lists, has-children mask)
    is recomputed whenever the topology changes."""

    def __init__(self, parents: Sequence[int], joints_left: Sequence[int],
                 joints_right: Sequence[int]):
        self._set_topology(np.asarray(parents, dtype=np.int64),
                           [int(j) for j in joints_left],
                           [int(j) for j in joints_right])

    # -- accessors ---------------------------------------------------------

    def num_joints(self) -> int:
        return int(self._parents.size)

    def parents(self) -> np.ndarray:
        return self._parents

    def has_children(self) -> np.ndarray:
        return self._has_children

    def children(self) -> List[List[int]]:
        return self._children

    def joints_left(self) -> List[int]:
        return self._joints_left

    def joints_right(self) -> List[int]:
        return self._joints_right

    # -- topology edits ----------------------------------------------------

    def remove_joints(self, joints_to_remove: Sequence[int]) -> List[int]:
        """Drop a set of joints, splicing their children onto the nearest kept
        ancestor and densely re-numbering everything (parents + symmetry lists).

        Returns the kept original joint indices in ascending order — callers use
        the list to slice position arrays.  Semantics parity:
        ``/root/reference/common/skeleton.py:31-69``.
        """
        n = self._parents.size
        drop = np.zeros(n, dtype=bool)
        drop[np.asarray(list(joints_to_remove), dtype=np.int64)] = True
        kept = np.flatnonzero(~drop)

        # Hop every parent pointer upward until it lands on a kept joint (or
        # the -1 root sentinel).  Vectorized fixpoint: each pass advances all
        # still-dropped pointers one generation at once.
        anc = self._parents.copy()
        while True:
            unstable = (anc >= 0) & drop[anc]
            if not unstable.any():
                break
            anc[unstable] = self._parents[anc[unstable]]

        # Dense re-indexing: new_index[j] = rank of j among kept joints.
        new_index = np.cumsum(~drop) - 1
        anc_kept = anc[kept]
        new_parents = np.where(anc_kept >= 0,
                               new_index[np.clip(anc_kept, 0, None)], -1)

        def _remap(joints: List[int]) -> List[int]:
            return [int(new_index[j]) for j in joints if not drop[j]]

        self._set_topology(new_parents, _remap(self._joints_left),
                           _remap(self._joints_right))
        return kept.tolist()

    # -- TPU-native helpers --------------------------------------------------

    def flip_permutation(self) -> np.ndarray:
        """Joint permutation that swaps left<->right joints (identity elsewhere).

        TPU-native helper: horizontal flip augmentation becomes a single static
        gather ``pose[..., perm, :]`` plus an x-sign flip, executed inside the
        jitted step instead of host-side fancy indexing (reference behavior:
        ``/root/reference/common/generators.py:120-141``).
        """
        perm = np.arange(self.num_joints())
        perm[self._joints_left] = self._joints_right
        perm[self._joints_right] = self._joints_left
        return perm

    def reparent(self, joint: int, new_parent: int) -> None:
        """Attach ``joint`` under ``new_parent``, recomputing the derived
        children metadata (datasets use this for e.g. the H36M shoulder
        rewiring after the 32->17 trim)."""
        parents = self._parents.copy()
        parents[joint] = new_parent
        self._set_topology(parents, self._joints_left, self._joints_right)

    # -- internals -----------------------------------------------------------

    def _set_topology(self, parents: np.ndarray, joints_left: List[int],
                      joints_right: List[int]) -> None:
        if len(joints_left) != len(joints_right):
            raise ValueError("left/right symmetry lists must pair up "
                             f"({len(joints_left)} vs {len(joints_right)})")
        self._parents = parents
        self._joints_left = joints_left
        self._joints_right = joints_right

        n = parents.size
        rooted = parents >= 0
        child_counts = np.bincount(parents[rooted], minlength=n)
        self._has_children = child_counts > 0
        self._children = [np.flatnonzero(parents == j).tolist()
                          for j in range(n)]
