"""SMPL skeleton math (host-side numpy).

Covers the reference's core/utils/body_util.py: joint constants, pose ->
per-joint local (R, T), canonical global transforms along the kinematic
chain, and the Gaussian bone-volume prior. Implementations are vectorized
numpy re-derivations (the reference loops per bone).
"""

from __future__ import annotations

import numpy as np

# SMPL 24-joint skeleton (reference core/utils/body_util.py:5-45).
SMPL_JOINT_NAMES = [
    "pelvis_root", "left_hip", "right_hip", "belly_button", "left_knee",
    "right_knee", "lower_chest", "left_ankle", "right_ankle", "upper_chest",
    "left_toe", "right_toe", "neck", "left_clavicle", "right_clavicle",
    "head", "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_thumb", "right_thumb",
]
SMPL_JOINT_IDX = {n: i for i, n in enumerate(SMPL_JOINT_NAMES)}

# parent[i] for i in 1..23; root (0) has no parent.
SMPL_PARENT = {
    1: 0, 2: 0, 3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6, 10: 7,
    11: 8, 12: 9, 13: 9, 14: 9, 15: 12, 16: 13, 17: 14, 18: 16, 19: 17,
    20: 18, 21: 19, 22: 20, 23: 21,
}
# Dense parent array: PARENT[0] == -1 (root).
PARENT = np.array([-1] + [SMPL_PARENT[i] for i in range(1, 24)], dtype=np.int64)

TORSO_JOINTS = np.array([
    SMPL_JOINT_IDX[n] for n in
    ["pelvis_root", "belly_button", "lower_chest", "upper_chest",
     "left_clavicle", "right_clavicle"]
])

# Gaussian prior stds (reference body_util.py:43-45).
BONE_STDS = np.array([0.03, 0.06, 0.03])
HEAD_STDS = np.array([0.06, 0.06, 0.06])
JOINT_STDS = np.array([0.02, 0.02, 0.02])

TOTAL_BONES = 24


def skew(v: np.ndarray) -> np.ndarray:
    """Skew-symmetric cross-product matrix for vectors (..., 3) -> (..., 3, 3)."""
    v = np.asarray(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = np.zeros_like(x)
    return np.stack([
        np.stack([zero, -z, y], axis=-1),
        np.stack([z, zero, -x], axis=-1),
        np.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def rodrigues(rvec: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Matches the reference's `_rvec_to_rmtx` (body_util.py:200-219) including
    its `norm + eps` angle-normalization convention so that motion bases built
    here agree with reference-converted checkpoints.
    """
    rvec = np.asarray(rvec, dtype=np.float64)
    theta = np.linalg.norm(rvec, axis=-1, keepdims=True)
    axis = rvec / (theta + eps)
    theta = theta[..., None]  # (..., 1, 1)
    K = skew(axis)
    eye = np.broadcast_to(np.eye(3), K.shape)
    R = eye + np.sin(theta) * K + (1.0 - np.cos(theta)) * (K @ K)
    return R.astype(np.float32)


def rotation_between(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Rotation matrices aligning v1 to v2, batched (N, 3)x(N, 3) -> (N, 3, 3).

    Rodrigues' alignment formula (reference body_util.py:83-114), made robust
    at the c = -1 pole the reference leaves singular (exactly antiparallel
    bone directions divide by 1+c there): those rows fall back to a 180-deg
    rotation about an axis perpendicular to v1.
    """
    v1 = v1 / np.clip(np.linalg.norm(v1, axis=-1, keepdims=True), 1e-5, None)
    v2 = v2 / np.clip(np.linalg.norm(v2, axis=-1, keepdims=True), 1e-5, None)
    n = np.cross(v1, v2)
    c = np.sum(v1 * v2, axis=-1)[..., None, None]
    K = skew(n)
    denom = np.where(1.0 + c < 1e-8, 1.0, 1.0 + c)
    R = np.eye(3) + K + (K @ K) / denom

    anti = (1.0 + c[..., 0, 0]) < 1e-8
    if np.any(anti):
        # axis perpendicular to v1: cross with the least-aligned basis vector
        basis = np.eye(3)[np.argmin(np.abs(v1), axis=-1)]
        axis = np.cross(v1, basis)
        axis = axis / np.clip(np.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-12, None)
        R_pi = rodrigues(axis * np.pi)
        R = np.where(anti[..., None, None], R_pi, R)
    return R.astype(np.float32)


def body_pose_to_body_RTs(jangles: np.ndarray, tpose_joints: np.ndarray):
    """Pose (J*3,) + T-pose joints (J, 3) -> local (Rs (J,3,3), Ts (J,3)).

    Reference: body_util.py:222-248. Root T is the absolute root joint;
    other Ts are offsets from the parent joint.
    """
    jangles = np.asarray(jangles, dtype=np.float32).reshape(-1, 3)
    J = jangles.shape[0]
    assert tpose_joints.shape[0] == J
    Rs = rodrigues(jangles)
    Ts = tpose_joints.astype(np.float32).copy()
    Ts[1:] = tpose_joints[1:] - tpose_joints[PARENT[1:J]]
    return Rs, Ts


def construct_G(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Stack (..., 3, 3) + (..., 3) into homogeneous (..., 4, 4)."""
    R = np.asarray(R, dtype=np.float32)
    T = np.asarray(T, dtype=np.float32)
    G = np.zeros(R.shape[:-2] + (4, 4), dtype=np.float32)
    G[..., :3, :3] = R
    G[..., :3, 3] = T
    G[..., 3, 3] = 1.0
    return G


def get_canonical_global_tfms(canonical_joints: np.ndarray) -> np.ndarray:
    """Canonical joints (J, 3) -> global 4x4 transforms along the chain.

    Reference: body_util.py:251-271 (identity rotations, chained translations).
    """
    J = canonical_joints.shape[0]
    gtfms = np.zeros((J, 4, 4), dtype=np.float32)
    gtfms[0] = construct_G(np.eye(3), canonical_joints[0])
    for i in range(1, J):
        local = construct_G(np.eye(3),
                            canonical_joints[i] - canonical_joints[PARENT[i]])
        gtfms[i] = gtfms[PARENT[i]] @ local
    return gtfms


def _gaussian_on_grid(grid_xyz: np.ndarray, center: np.ndarray,
                      S: np.ndarray, R: np.ndarray) -> np.ndarray:
    """exp(-(x-c)^T R S S R^T (x-c)) over a (D,H,W,3) grid."""
    sigma = R @ S @ S @ R.T
    d = grid_xyz - center
    dist = np.einsum("...i,ij,...j->...", d, sigma, d)
    return np.exp(-dist)


def approx_gaussian_bone_volumes(
        tpose_joints: np.ndarray,
        bbox_min_xyz: np.ndarray,
        bbox_max_xyz: np.ndarray,
        grid_size: int = 32) -> np.ndarray:
    """Per-bone anisotropic Gaussian prior volumes + background channel.

    Reference: body_util.py:274-348. Output (J+1, D, H, W) with grid layout
    [z, y, x] (meshgrid ij over linspace(z), linspace(y), linspace(x)),
    normalized so channels sum to 1 per voxel (sum clipped at 1e-3).
    """
    J = tpose_joints.shape[0]
    tpose_joints = tpose_joints.astype(np.float32)
    min_x, min_y, min_z = bbox_min_xyz
    max_x, max_y, max_z = bbox_max_xyz
    zs = np.linspace(min_z, max_z, grid_size)
    ys = np.linspace(min_y, max_y, grid_size)
    xs = np.linspace(min_x, max_x, grid_size)
    zg, yg, xg = np.meshgrid(zs, ys, xs, indexing="ij")
    grid_xyz = np.stack([xg, yg, zg], axis=-1)  # (D, H, W, 3) holding (x,y,z)

    calibrated = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
    vols = np.zeros((J,) + (grid_size,) * 3, dtype=np.float32)
    has_child = np.zeros(J, dtype=bool)

    for child in range(1, J):
        parent = int(PARENT[child])
        has_child[parent] = True
        S = np.diag(1.0 / (BONE_STDS * 2.0)).astype(np.float32)
        if parent in TORSO_JOINTS:
            S[0, 0] /= 1.5
            S[2, 2] /= 1.5
        start, end = tpose_joints[parent], tpose_joints[child]
        R = rotation_between(calibrated, (end - start)[None])[0]
        center = (start + end) / 2.0
        vols[parent] += _gaussian_on_grid(grid_xyz, center, S, R)

    for j in range(J):
        if has_child[j]:
            continue
        stds = HEAD_STDS if j == SMPL_JOINT_IDX["head"] else JOINT_STDS
        S = np.diag(1.0 / (stds * 2.0)).astype(np.float32)
        vols[j] = _gaussian_on_grid(grid_xyz, tpose_joints[j], S, np.eye(3))

    bg = 1.0 - np.clip(vols.sum(axis=0, keepdims=True), 0.0, 1.0)
    vols = np.concatenate([vols, bg], axis=0)
    vols = vols / np.clip(vols.sum(axis=0, keepdims=True), 1e-3, None)
    return vols.astype(np.float32)


def skeleton_to_bbox(skeleton: np.ndarray, offset: float = 0.3) -> dict:
    """Axis-aligned bbox around joints, padded by `offset` (train.py:125-132)."""
    return {
        "min_xyz": np.min(skeleton, axis=0) - offset,
        "max_xyz": np.max(skeleton, axis=0) + offset,
    }
