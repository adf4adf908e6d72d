"""Camera / ray utilities (host-side numpy).

Covers the reference's core/utils/camera_util.py: pinhole ray generation,
ray--AABB intersection culling, orbit-camera updates, folding SMPL global
Rh/Th into the extrinsics, and look-at rotations.
"""

from __future__ import annotations

import numpy as np

from humannerf_tpu.utils.body import rodrigues


def get_camrot(campos: np.ndarray, lookat=None, inv_camera: bool = False) -> np.ndarray:
    """World->camera rotation from camera position and look-at target.

    Reference: camera_util.py:51-81 (row-major [right; up; forward]).
    """
    if lookat is None:
        lookat = np.zeros(3, dtype=np.float32)
    up = np.array([0.0, -1.0 if inv_camera else 1.0, 0.0], dtype=np.float32)
    forward = lookat - campos
    forward = forward / np.linalg.norm(forward)
    right = np.cross(up, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    up = up / np.linalg.norm(up)
    return np.array([right, up, forward], dtype=np.float32)


def _update_extrinsics(E: np.ndarray, angle: float, trans=None,
                       rotate_axis: str = "y") -> np.ndarray:
    """Rotate the camera around a world axis about `trans` (or the origin).

    Reference: camera_util.py:4-48 (including the y-flip sign convention).
    """
    inv_E = np.linalg.inv(E)
    camrot = inv_E[:3, :3]
    campos = inv_E[:3, 3].copy()
    if trans is not None:
        campos -= trans
    if camrot.T[1, 1] < 0.0:
        angle = -angle
    axis_idx = {"x": 0, "y": 1, "z": 2}[rotate_axis]
    rvec = np.zeros(3)
    rvec[axis_idx] = angle
    g = rodrigues(rvec).astype(np.float64)
    rot_campos = g @ campos
    rot_camrot = g @ camrot
    if trans is not None:
        rot_campos += trans
    new_E = np.eye(4)
    new_E[:3, :3] = rot_camrot.T
    new_E[:3, 3] = -rot_camrot.T @ rot_campos
    return new_E


def rotate_camera_by_frame_idx(extrinsics: np.ndarray, frame_idx: int,
                               trans=None, rotate_axis: str = "y",
                               period: int = 196,
                               inv_angle: bool = False) -> np.ndarray:
    """Orbit camera: angle = 2*pi*frame_idx/period (camera_util.py:84-109)."""
    angle = 2.0 * np.pi * (frame_idx / period)
    if inv_angle:
        angle = -angle
    return _update_extrinsics(extrinsics, angle, trans, rotate_axis)


def apply_global_tfm_to_camera(E: np.ndarray, Rh: np.ndarray,
                               Th: np.ndarray) -> np.ndarray:
    """Fold the subject's global rotation/translation into the extrinsics.

    Reference: camera_util.py:112-129. The SMPL world transform is
    G = [R(Rh)^T | -R(Rh)^T @ Th]; the returned camera is E @ G^{-1}.
    """
    G = np.eye(4)
    Rg = rodrigues(np.asarray(Rh, dtype=np.float64)).T
    G[:3, :3] = Rg
    G[:3, 3] = -Rg @ np.asarray(Th, dtype=np.float64)
    E4 = np.eye(4)
    E4[: E.shape[0], : E.shape[1]] = E
    return E4 @ np.linalg.inv(G)


def get_rays_from_KRT(H: int, W: int, K: np.ndarray, R: np.ndarray,
                      T: np.ndarray):
    """Pixel-grid world rays from intrinsics/extrinsics.

    Reference: camera_util.py:132-159. Rays pass through integer pixel
    coordinates (i, j) (not pixel centers), origins at the camera center
    -R^T T. Returns (rays_o, rays_d), both (H, W, 3); rays_d unnormalized.
    """
    cam_center = (-R.T @ np.asarray(T).ravel()).astype(np.float64)
    i, j = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64), indexing="xy")
    xy1 = np.stack([i, j, np.ones_like(i)], axis=-1)
    pixel_cam = xy1 @ np.linalg.inv(K).T
    pixel_world = (pixel_cam - np.asarray(T).ravel()) @ R
    rays_d = pixel_world - cam_center
    rays_o = np.broadcast_to(cam_center, rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def rays_intersect_3d_bbox(bounds, ray_o: np.ndarray, ray_d: np.ndarray):
    """Ray--AABB intersection via the 6 box planes, exactly-2-hits rule.

    Reference: camera_util.py:162-208 (including the 1cm bbox inflation,
    the 1e-5 direction clamp, and near/far measured in units of |ray_d|).
    Returns (near (M,), far (M,), mask (N,)) for the M rays that hit.
    """
    if isinstance(bounds, dict):
        bounds = np.stack([bounds["min_xyz"], bounds["max_xyz"]], axis=0)
    bounds = np.asarray(bounds, dtype=np.float64) + np.array([-0.01, 0.01])[:, None]

    ray_d = np.where(np.abs(ray_d) < 1e-5, 1e-5, ray_d).astype(np.float64)
    ray_o = np.asarray(ray_o, dtype=np.float64)

    # Parametric distance to each of the 6 planes, then the hit points.
    t_planes = ((bounds[None] - ray_o[:, None]) / ray_d[:, None]).reshape(-1, 6)
    p = t_planes[..., None] * ray_d[:, None] + ray_o[:, None]  # (N, 6, 3)
    lo, hi = bounds[0] - 1e-6, bounds[1] + 1e-6
    on_box = np.all((p >= lo) & (p <= hi), axis=-1)  # (N, 6)
    mask = on_box.sum(axis=-1) == 2

    p_hits = p[mask][on_box[mask]].reshape(-1, 2, 3)
    d_norm = np.linalg.norm(ray_d[mask], axis=-1)
    d0 = np.linalg.norm(p_hits[:, 0] - ray_o[mask], axis=-1) / d_norm
    d1 = np.linalg.norm(p_hits[:, 1] - ray_o[mask], axis=-1) / d_norm
    near = np.minimum(d0, d1).astype(np.float32)
    far = np.maximum(d0, d1).astype(np.float32)
    return near, far, mask


def project_world2image(xyzs: np.ndarray, w2cs: np.ndarray) -> np.ndarray:
    """Batch world->pixel projection (camera_util.py:210-227).

    xyzs: (..., P, 3); w2cs: (P, V, 3, 4) stacked K@[R|T]. Returns integer
    pixel coords (..., P, V, 2).
    """
    orig_shape = xyzs.shape
    xyzs = xyzs.reshape((-1,) + orig_shape[-2:])
    ones = np.ones_like(xyzs[..., :1])
    xyzh = np.concatenate([xyzs, ones], axis=-1)  # (N, P, 4)
    uvz = np.einsum("pvij,npj->npvi", w2cs, xyzh)
    uv = uvz[..., :2] / (uvz[..., 2:3] + 1e-10)
    return uv.reshape(orig_shape[:-1] + uv.shape[-2:]).astype(np.int32)
