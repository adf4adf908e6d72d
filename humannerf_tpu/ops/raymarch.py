"""Ray sampling and volume compositing (device-side, static shapes).

Covers the reference's `_get_samples_along_ray` / `_stratified_sampling` /
`_raw2outputs` (core/nets/human_nerf/network.py:355-471). All functions take
fixed-shape inputs; invalid (padded) rays are masked by the caller via the
fg-likelihood mask that already zeroes alpha everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_along_rays(near: jnp.ndarray, far: jnp.ndarray,
                      n_samples: int) -> jnp.ndarray:
    """Linear depth samples: z = near*(1-t) + far*t (network.py:455-459)."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    return near[..., None] * (1.0 - t) + far[..., None] * t


def stratified_sampling(z_vals: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Jitter samples uniformly within their bins (network.py:462-471)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def raw2outputs(raw: jnp.ndarray, raw_mask: jnp.ndarray, z_vals: jnp.ndarray,
                rays_d: jnp.ndarray, bgcolor: jnp.ndarray,
                xyz: jnp.ndarray | None = None):
    """Alpha-composite raw MLP outputs along rays.

    Matches reference `_raw2outputs` (network.py:355-388):
      dists: z-deltas with a 1e10 tail, scaled by |rays_d|
      alpha = (1 - exp(-relu(sigma) * dist)) * fg_likelihood
      weights = alpha * exclusive-cumprod(1 - alpha + 1e-10)
      rgb_map += (1 - acc) * bgcolor / 255

    Args:
      raw: (R, S, 4) rgb logits + density.
      raw_mask: (R, S, 1) foreground likelihood in [0, ~1].
      z_vals: (R, S); rays_d: (R, 3); bgcolor: (3,) in [0, 255].
      xyz: optional (R, S, 3) canonical points for argmax-weight readouts.

    Returns dict with rgb (R,3), alpha (R,), depth (R,), weights (R,S),
    rgb_on_rays (R,S,3) and, when xyz given, cnl_xyz/cnl_rgb/cnl_weight.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)
    alpha = alpha * raw_mask[..., 0]

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1.0 - alpha + 1e-10], axis=-1), axis=-1)[..., :-1]
    weights = alpha * trans                                   # (R, S)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bgcolor[None, :] / 255.0

    out = {"rgb": rgb_map, "alpha": acc_map, "depth": depth_map,
           "weights_on_rays": weights, "rgb_on_rays": rgb}
    if xyz is not None:
        idx = jnp.argmax(weights, axis=-1)                    # (R,)
        out["cnl_xyz"] = jnp.take_along_axis(
            xyz, idx[:, None, None], axis=1)[:, 0]
        out["cnl_rgb"] = jnp.take_along_axis(
            rgb, idx[:, None, None], axis=1)[:, 0]
        out["cnl_weight"] = jnp.max(weights, axis=-1)
        out["xyz_on_rays"] = xyz
    return out
