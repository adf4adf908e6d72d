"""Motion-basis parity vs an independent torch implementation of the
reference MotionBasisComputer (core/utils/network_util.py:125-156)."""

import numpy as np
import pytest

from humannerf_tpu.models.motion import forward_motion_warp, motion_basis
from humannerf_tpu.utils.body import (PARENT, body_pose_to_body_RTs,
                                      get_canonical_global_tfms, rodrigues)

torch = pytest.importorskip("torch")


def torch_motion_basis(dst_Rs, dst_Ts, cnl_gtfms):
    J = dst_Rs.shape[0]
    G = torch.zeros(J, 4, 4, dtype=torch.float64)
    G[:, :3, :3] = torch.from_numpy(dst_Rs).double()
    G[:, :3, 3] = torch.from_numpy(dst_Ts).double()
    G[:, 3, 3] = 1.0
    out = torch.zeros_like(G)
    out[0] = G[0]
    for i in range(1, J):
        out[i] = out[int(PARENT[i])] @ G[i]
    f = torch.from_numpy(cnl_gtfms).double() @ torch.inverse(out)
    return f[:, :3, :3].numpy(), f[:, :3, 3].numpy()


def _random_skeleton(seed=0):
    rng = np.random.RandomState(seed)
    joints = rng.uniform(-0.5, 0.5, size=(24, 3)).astype(np.float32)
    poses = (rng.uniform(-0.4, 0.4, size=(72,))).astype(np.float32)
    return joints, poses


def test_motion_basis_matches_torch_chain():
    joints, poses = _random_skeleton()
    dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, joints)
    cnl_gtfms = get_canonical_global_tfms(joints)
    got_R, got_T = motion_basis(dst_Rs, dst_Ts, cnl_gtfms)
    want_R, want_T = torch_motion_basis(dst_Rs, dst_Ts, cnl_gtfms)
    np.testing.assert_allclose(np.asarray(got_R), want_R, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_T), want_T, atol=2e-5)


def test_zero_pose_equals_identity_warp():
    """With dst pose == canonical pose, every bone transform is identity."""
    joints = _random_skeleton(1)[0]
    poses = np.zeros(72, np.float32)
    dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, joints)
    cnl_gtfms = get_canonical_global_tfms(joints)
    R, T = motion_basis(dst_Rs, dst_Ts, cnl_gtfms)
    # rodrigues(0) with the reference eps is ~identity (not exact)
    np.testing.assert_allclose(
        np.asarray(R), np.tile(np.eye(3), (24, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(T), np.zeros((24, 3)), atol=1e-4)


def test_forward_warp_inverts_backward_warp():
    joints, poses = _random_skeleton(2)
    dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, joints)
    cnl_gtfms = get_canonical_global_tfms(joints)
    R, T = motion_basis(dst_Rs, dst_Ts, cnl_gtfms)

    rng = np.random.RandomState(3)
    pts = rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32)
    # one-hot weights on a single bone: forward(backward(x)) == x exactly
    k = 7
    w = np.zeros((20, 24), np.float32)
    w[:, k] = 1.0
    bwd = np.einsum("ij,nj->ni", np.asarray(R)[k], pts) + np.asarray(T)[k]
    fwd = forward_motion_warp(bwd, w, R, T)
    np.testing.assert_allclose(np.asarray(fwd), pts, atol=1e-4)


def test_rodrigues_matches_torch_module_formula():
    """Our numpy rodrigues vs the reference network RodriguesModule
    (different eps conventions, agreement away from zero)."""
    from humannerf_tpu.utils.transforms import rodrigues_net
    rng = np.random.RandomState(4)
    rvec = rng.uniform(-1.0, 1.0, size=(10, 3)).astype(np.float32)
    a = rodrigues(rvec)
    b = np.asarray(rodrigues_net(rvec))
    np.testing.assert_allclose(a, b, atol=1e-4)
    # both are valid rotations
    for R in b:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
