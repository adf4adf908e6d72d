"""Host-side skeleton math: golden-value and invariant tests
(reference core/utils/body_util.py)."""

import numpy as np

from humannerf_tpu.utils.body import (PARENT, approx_gaussian_bone_volumes,
                                      body_pose_to_body_RTs,
                                      get_canonical_global_tfms, rodrigues,
                                      rotation_between, skeleton_to_bbox)


def test_rodrigues_quarter_turn():
    R = rodrigues(np.array([0.0, 0.0, np.pi / 2]))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, want, atol=1e-4)


def test_rotation_between_aligns():
    rng = np.random.RandomState(0)
    v1 = rng.randn(10, 3)
    v2 = rng.randn(10, 3)
    R = rotation_between(v1, v2)
    v1n = v1 / np.linalg.norm(v1, axis=-1, keepdims=True)
    v2n = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
    got = np.einsum("nij,nj->ni", R, v1n)
    np.testing.assert_allclose(got, v2n, atol=1e-4)


def test_body_RTs_root_and_offsets():
    rng = np.random.RandomState(1)
    joints = rng.randn(24, 3).astype(np.float32)
    poses = np.zeros(72, np.float32)
    Rs, Ts = body_pose_to_body_RTs(poses, joints)
    np.testing.assert_allclose(Ts[0], joints[0], atol=1e-6)
    for i in range(1, 24):
        np.testing.assert_allclose(Ts[i], joints[i] - joints[PARENT[i]],
                                   atol=1e-6)
    # zero pose: rotations ~identity
    np.testing.assert_allclose(Rs, np.tile(np.eye(3), (24, 1, 1)), atol=1e-4)


def test_canonical_gtfms_translate_origin_to_joints():
    """G_i maps the bone-local origin to canonical joint i (pure translations
    chained along the kinematic tree)."""
    rng = np.random.RandomState(2)
    joints = rng.randn(24, 3).astype(np.float32)
    g = get_canonical_global_tfms(joints)
    origin = np.array([0, 0, 0, 1.0], np.float32)
    got = np.einsum("jab,b->ja", g, origin)[:, :3]
    np.testing.assert_allclose(got, joints, atol=1e-5)


def test_gaussian_bone_volumes_properties():
    rng = np.random.RandomState(3)
    joints = rng.uniform(-0.4, 0.4, (24, 3)).astype(np.float32)
    bbox = skeleton_to_bbox(joints)
    vols = approx_gaussian_bone_volumes(joints, bbox["min_xyz"],
                                        bbox["max_xyz"], grid_size=16)
    assert vols.shape == (25, 16, 16, 16)
    assert (vols >= 0).all()
    np.testing.assert_allclose(vols.sum(axis=0), 1.0, atol=1e-5)
    # somewhere inside the body, bone weight dominates the background
    assert vols[:24].sum(axis=0).max() > 0.5
    # far corners are pure background
    assert vols[24, 0, 0, 0] > 0.99
