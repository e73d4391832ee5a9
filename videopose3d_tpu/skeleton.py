"""Kinematic-tree metadata for mocap skeletons.

Parity target: ``/root/reference/common/skeleton.py:10-88``.  Host-side, numpy-only:
the skeleton is static configuration consumed at graph-build time (joint counts,
left/right symmetry permutations for flip augmentation, parent indices for the
bone-length loss), never traced.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class Skeleton:
    def __init__(self, parents: Sequence[int], joints_left: Sequence[int],
                 joints_right: Sequence[int]):
        assert len(joints_left) == len(joints_right)
        self._parents = np.array(parents)
        self._joints_left = list(joints_left)
        self._joints_right = list(joints_right)
        self._compute_metadata()

    def num_joints(self) -> int:
        return len(self._parents)

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

    def remove_joints(self, joints_to_remove: Sequence[int]) -> List[int]:
        """Remove joints, re-wiring children of removed joints to their nearest kept
        ancestor and compacting all indices (parents + symmetry lists).

        Returns the list of kept (valid) original joint indices, in order — callers
        use it to slice position arrays.  Semantics parity:
        ``/root/reference/common/skeleton.py:31-69``.
        """
        joints_to_remove = set(int(j) for j in joints_to_remove)
        valid_joints = [j for j in range(len(self._parents))
                        if j not in joints_to_remove]

        # Re-wire: walk each parent pointer up past removed ancestors.
        parents = self._parents.copy()
        for i in range(len(parents)):
            while parents[i] in joints_to_remove:
                parents[i] = parents[parents[i]]

        # Compact indices: offset[i] = number of removed joints at index <= i.
        index_offsets = np.zeros(len(parents), dtype=int)
        new_parents = []
        for i, parent in enumerate(parents):
            if i not in joints_to_remove:
                new_parents.append(parent - index_offsets[parent])
            else:
                index_offsets[i:] += 1
        self._parents = np.array(new_parents)

        self._joints_left = [j - index_offsets[j] for j in self._joints_left
                             if j in valid_joints]
        self._joints_right = [j - index_offsets[j] for j in self._joints_right
                              if j in valid_joints]

        self._compute_metadata()
        return valid_joints

    def flip_permutation(self) -> np.ndarray:
        """Joint permutation that swaps left<->right joints (identity elsewhere).

        TPU-native helper: horizontal flip augmentation becomes a single static
        gather ``pose[..., perm, :]`` plus an x-sign flip, executed inside the jitted
        step instead of the reference's host-side fancy-indexing
        (``/root/reference/common/generators.py:120-141``).
        """
        perm = np.arange(self.num_joints())
        perm[self._joints_left] = self._joints_right
        perm[self._joints_right] = self._joints_left
        return perm

    def _compute_metadata(self):
        self._has_children = np.zeros(len(self._parents), dtype=bool)
        for parent in self._parents:
            if parent != -1:
                self._has_children[parent] = True

        self._children = [[] for _ in self._parents]
        for i, parent in enumerate(self._parents):
            if parent != -1:
                self._children[parent].append(i)
