"""Vectorized trilinear volume sampling (the inverse-LBS warp hot op).

The reference evaluates 24 sequential `F.grid_sample` calls, one per bone
(core/nets/human_nerf/network.py:407-415). Here all bones are sampled in a
single batched 8-corner gather: each sample point n queries bone k's weight
channel at its own rigidly-transformed position. Semantics match torch
grid_sample(padding_mode='zeros', align_corners=True) exactly -- per-corner
zero padding, not edge clamping.

Layout: volumes are (K, D, H, W) indexed [bone, z, y, x]; normalized
coordinates are (x, y, z) in [-1, 1] where x maps to W (torch convention,
produced by `(pts - bbox_min) * bbox_scale - 1`, network.py:409-410).
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear_sample_per_channel(vol: jnp.ndarray,
                                 coords: jnp.ndarray) -> jnp.ndarray:
    """Sample channel k of `vol` at coords[..., k, :] for every k.

    Args:
      vol:    (K, D, H, W) float volume.
      coords: (N, K, 3) normalized (x, y, z) in [-1, 1], align_corners=True.

    Returns:
      (N, K) sampled values; out-of-range corners contribute zero.
    """
    K, D, H, W = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]  # each (N, K)

    # align_corners=True: -1 -> 0, +1 -> size-1
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    wx = fx - x0
    wy = fy - y0
    wz = fz - z0

    vol_flat = vol.reshape(K, D * H * W)
    k_idx = jnp.arange(K)[None, :]  # (1, K), broadcasts over N

    def corner(xi, yi, zi, w):
        valid = ((xi >= 0) & (xi <= W - 1) &
                 (yi >= 0) & (yi <= H - 1) &
                 (zi >= 0) & (zi <= D - 1))
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        zc = jnp.clip(zi, 0, D - 1).astype(jnp.int32)
        flat = (zc * H + yc) * W + xc                      # (N, K)
        vals = vol_flat[k_idx, flat]                       # (N, K) gather
        return jnp.where(valid, vals * w, 0.0)

    out = (corner(x0,     y0,     z0,     (1 - wx) * (1 - wy) * (1 - wz)) +
           corner(x0 + 1, y0,     z0,     wx       * (1 - wy) * (1 - wz)) +
           corner(x0,     y0 + 1, z0,     (1 - wx) * wy       * (1 - wz)) +
           corner(x0 + 1, y0 + 1, z0,     wx       * wy       * (1 - wz)) +
           corner(x0,     y0,     z0 + 1, (1 - wx) * (1 - wy) * wz) +
           corner(x0 + 1, y0,     z0 + 1, wx       * (1 - wy) * wz) +
           corner(x0,     y0 + 1, z0 + 1, (1 - wx) * wy       * wz) +
           corner(x0 + 1, y0 + 1, z0 + 1, wx       * wy       * wz))
    return out


def sample_motion_weights(motion_weights: jnp.ndarray,
                          pts: jnp.ndarray,
                          motion_scale_Rs: jnp.ndarray,
                          motion_Ts: jnp.ndarray,
                          cnl_bbox_min_xyz: jnp.ndarray,
                          cnl_bbox_scale_xyz: jnp.ndarray):
    """Inverse-LBS warp: observation points -> canonical points + weights.

    Vectorizes the reference's per-bone loop (network.py:392-444):
      pos_k = R_k @ p + T_k                         (rigid per-bone warp)
      w_k   = trilinear(vol_k, normalize(pos_k))    (backward skinning weight)
      x_cnl = sum_k w_k pos_k / clamp(sum_k w_k, 1e-4)

    Args:
      motion_weights: (K, D, H, W) learned weight volume, bg channel removed.
      pts: (N, 3) observation-space points.
      motion_scale_Rs: (K, 3, 3); motion_Ts: (K, 3).
      cnl_bbox_min_xyz, cnl_bbox_scale_xyz: (3,) bbox -> [-1,1] normalization.

    Returns:
      x_skel (N, 3), fg_likelihood (N, 1), backwarp_weights (N, K).
    """
    # (N, K, 3): every bone's rigid transform of every point.
    # Full f32 precision: voxel coordinates must not be bf16-rounded.
    pos = jnp.einsum("kij,nj->nki", motion_scale_Rs, pts,
                     precision="highest") + motion_Ts[None]
    coords = (pos - cnl_bbox_min_xyz) * cnl_bbox_scale_xyz - 1.0
    weights = trilinear_sample_per_channel(motion_weights, coords)  # (N, K)

    w_sum = jnp.sum(weights, axis=-1, keepdims=True)                # (N, 1)
    x_skel = jnp.sum(weights[..., None] * pos, axis=1) / jnp.clip(w_sum, 1e-4)
    return x_skel, w_sum, weights
