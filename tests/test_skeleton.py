"""Skeleton tests: remove_joints / metadata parity with the reference and the
flip-permutation helper used by the on-device augmentation path."""

import numpy as np

from videopose3d_tpu.skeleton import Skeleton

# Human3.6M 32-joint topology (public dataset constants).
H36M_PARENTS = [-1, 0, 1, 2, 3, 4, 0, 6, 7, 8, 9, 0, 11, 12, 13, 14, 12,
                16, 17, 18, 19, 20, 19, 22, 12, 24, 25, 26, 27, 28, 27, 30]
H36M_LEFT = [6, 7, 8, 9, 10, 16, 17, 18, 19, 20, 21, 22, 23]
H36M_RIGHT = [1, 2, 3, 4, 5, 24, 25, 26, 27, 28, 29, 30, 31]
H36M_REMOVE = [4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31]


def _make():
    return Skeleton(H36M_PARENTS, list(H36M_LEFT), list(H36M_RIGHT))


def test_basic_metadata():
    sk = _make()
    assert sk.num_joints() == 32
    assert sk.has_children()[0]
    assert 1 in sk.children()[0]


def test_remove_joints_h36m_17():
    sk = _make()
    valid = sk.remove_joints(H36M_REMOVE)
    assert sk.num_joints() == 17
    assert len(valid) == 17
    assert sk.parents()[0] == -1
    # Left/right lists stay disjoint and same-length.
    assert len(sk.joints_left()) == len(sk.joints_right())
    assert not set(sk.joints_left()) & set(sk.joints_right())


def test_remove_joints_parity(reference_modules):
    ours = _make()
    theirs = reference_modules.skeleton.Skeleton(
        parents=list(H36M_PARENTS),
        joints_left=list(H36M_LEFT),
        joints_right=list(H36M_RIGHT),
    )
    v_ours = ours.remove_joints(H36M_REMOVE)
    v_theirs = theirs.remove_joints(H36M_REMOVE)
    assert list(v_ours) == list(v_theirs)
    np.testing.assert_array_equal(ours.parents(), theirs.parents())
    assert ours.joints_left() == theirs.joints_left()
    assert ours.joints_right() == theirs.joints_right()
    np.testing.assert_array_equal(ours.has_children(), theirs.has_children())
    assert ours.children() == theirs.children()


def test_flip_permutation_is_involution():
    sk = _make()
    sk.remove_joints(H36M_REMOVE)
    perm = sk.flip_permutation()
    np.testing.assert_array_equal(perm[perm], np.arange(sk.num_joints()))
    # Left joints map onto right joints and vice versa.
    for l, r in zip(sk.joints_left(), sk.joints_right()):
        assert perm[l] == r and perm[r] == l
