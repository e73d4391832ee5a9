"""Mocap dataset abstraction.

API parity target: ``/root/reference/common/mocap_dataset.py:11-44`` — a
dict-of-dicts ``data[subject][action]`` plus per-subject camera lists, the
skeleton, and fps.  Host-side only; the training pipeline consumes the arrays it
exposes via ``FlatSequenceDataset``.
"""

from __future__ import annotations

from videopose3d_tpu.skeleton import Skeleton


class MocapDataset:
    def __init__(self, fps, skeleton: Skeleton):
        self._skeleton = skeleton
        self._fps = fps
        self._data = None      # filled by subclasses: {subject: {action: {...}}}
        self._cameras = None   # filled by subclasses: {subject: [cam_dict, ...]}

    def remove_joints(self, joints_to_remove):
        kept_joints = self._skeleton.remove_joints(joints_to_remove)
        for subject in self._data.keys():
            for action in self._data[subject].keys():
                s = self._data[subject][action]
                if "positions" in s:
                    s["positions"] = s["positions"][:, kept_joints]

    def __getitem__(self, key):
        return self._data[key]

    def subjects(self):
        return self._data.keys()

    def fps(self):
        return self._fps

    def skeleton(self) -> Skeleton:
        return self._skeleton

    def cameras(self):
        return self._cameras

    def supports_semi_supervised(self) -> bool:
        return False
