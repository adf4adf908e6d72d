"""Analytic per-ray liveness bands from bone-support geometry.

The inverse-LBS foreground likelihood fg(p) = sum_k w_k(p) is nonzero only
where some bone's motion-weight support is nearby, and each bone's support
is known BEFORE any volume sampling: motion weights come from
softmax(decoded + log prior) (models/mweight.py:104), so their zero set is
exactly the Gaussian prior's underflow region -- a per-bone axis-aligned
box in canonical voxel coordinates. A bone's warp is affine
(q = A_k p + t_k, reference network.py:407-415), so a RAY maps to a line
in canonical space and the box test is an exact slab intersection.

This gives, per ray, a conservative depth band [t0, t1] with the guarantee

    z outside the band  =>  fg(o + z d) == 0   (exactly)

computed WITHOUT touching the sampled volume. The render path uses it to
sort rays and skip empty sample blocks (including their packed-volume row
gathers) before the gather runs -- the fg-derived liveness the training
path uses is only available after it.

Conservativeness accounting (everything rounds outward):
  * trilinear stencil: a sample at fractional coord f reads voxels
    floor(f) and floor(f)+1, so support [imin, imax] widens to
    [imin - 1, imax + 1];
  * the fused obs-grid double interpolation (ops/fused_warp.py): fg(p)
    reads obs-grid corners up to one obs-grid step from p, and the warp
    maps that displacement through |A_k| -- the canonical box widens by
    |A_k| @ obs_step per axis (skip with obs_step=None for the exact
    single-interpolation warp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bone_support_boxes(motion_weights: jnp.ndarray,
                       halo_vox: float = 1.0):
    """Per-bone support AABBs in fractional voxel coords (x, y, z order).

    motion_weights: (K, D, H, W). Returns (lo, hi) each (K, 3); bones with
    empty support get lo > hi (every interval test fails).
    """
    K, D, H, W = motion_weights.shape
    nz = motion_weights != 0
    out_lo, out_hi = [], []
    for axes, size in (((1, 2), W), ((1, 3), H), ((2, 3), D)):
        m = jnp.any(nz, axis=axes)                     # (K, size)
        idx = jnp.arange(size, dtype=jnp.float32)
        lo = jnp.min(jnp.where(m, idx, float(size)), axis=1) - halo_vox
        hi = jnp.max(jnp.where(m, idx, -1.0), axis=1) + halo_vox
        out_lo.append(lo)
        out_hi.append(hi)
    return jnp.stack(out_lo, axis=1), jnp.stack(out_hi, axis=1)


def _frac_scale(cnl_scale, dims):
    """World -> fractional-voxel scale per axis (x, y, z)."""
    W, H, D = dims[2], dims[1], dims[0]
    sizes = jnp.asarray([W, H, D], jnp.float32)
    return cnl_scale * 0.5 * (sizes - 1.0)


def ray_band_intervals(rays_o, rays_d, near, far,
                       scale_Rs, Ts, cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                       dims, sup_lo, sup_hi, obs_step=None):
    """Conservative per-ray live band [t0, t1] (convex hull over bones).

    rays_o/rays_d: (R, 3); near/far: (R,) or (R, 1); scale_Rs: (K, 3, 3),
    Ts: (K, 3) observation->canonical bone affines; dims = (D, H, W) of the
    motion-weight volumes; sup_lo/sup_hi: (K, 3) from bone_support_boxes;
    obs_step: (3,) obs-grid voxel step for the fused double-interpolation
    halo, or None for the exact warp.

    Returns (t0, t1), each (R,). Rays missing every bone's support get
    t0 > t1 (an empty band).
    """
    near = near.reshape(-1)
    far = far.reshape(-1)
    fs = _frac_scale(jnp.asarray(cnl_bbox_scale_xyz, jnp.float32), dims)

    # fractional-coord line per (ray, bone, axis): f(t) = c0 + t * c1
    qo = jnp.einsum("kij,rj->rki", scale_Rs, rays_o) + Ts[None]
    qd = jnp.einsum("kij,rj->rki", scale_Rs, rays_d)
    c0 = (qo - jnp.asarray(cnl_bbox_min_xyz, jnp.float32)) * fs
    c1 = qd * fs

    lo = sup_lo[None]                                  # (1, K, 3)
    hi = sup_hi[None]
    if obs_step is not None:
        # obs-grid corner displacement through the bone affine
        dq = jnp.einsum("kij,j->ki", jnp.abs(scale_Rs),
                        jnp.asarray(obs_step, jnp.float32))
        df = dq * fs
        lo = lo - df[None]
        hi = hi + df[None]

    # slab test per axis; degenerate direction -> full/empty interval
    eps = 1e-12
    c1s = jnp.where(jnp.abs(c1) < eps, eps, c1)
    ta = (lo - c0) / c1s
    tb = (hi - c0) / c1s
    t_lo = jnp.minimum(ta, tb)
    t_hi = jnp.maximum(ta, tb)
    degen = jnp.abs(c1) < eps
    inside = (c0 >= lo) & (c0 <= hi)
    t_lo = jnp.where(degen, jnp.where(inside, -jnp.inf, jnp.inf), t_lo)
    t_hi = jnp.where(degen, jnp.where(inside, jnp.inf, -jnp.inf), t_hi)

    t0k = jnp.max(t_lo, axis=-1)                       # (R, K)
    t1k = jnp.min(t_hi, axis=-1)
    hit = t0k <= t1k
    # a bone with empty support has lo > hi, for which the slab math
    # still yields the interval between the two plane crossings -- mask
    # those bones out entirely
    empty_bone = jnp.any(sup_lo > sup_hi, axis=-1)     # (K,)
    hit = hit & ~empty_bone[None]
    # convex hull of the per-bone intervals, clipped to [near, far]
    t0 = jnp.min(jnp.where(hit, t0k, jnp.inf), axis=-1)
    t1 = jnp.max(jnp.where(hit, t1k, -jnp.inf), axis=-1)
    t0 = jnp.maximum(t0, near)
    t1 = jnp.minimum(t1, far)
    return t0, t1


def sample_live_mask(z_vals, t0, t1):
    """(R, S) bool: sample depth inside the ray's live band."""
    return (z_vals >= t0[:, None]) & (z_vals <= t1[:, None])


def band_sort_keys(z_vals, t0, t1):
    """Ray sort keys = live-band center in sample-slot units.

    Matches pallas_mlp.ray_sort_order's intent (cluster rays whose bands
    cross the same depth slots); empty bands sort last.
    """
    s0 = jnp.argmax(sample_live_mask(z_vals, t0, t1), axis=1)
    live_any = t0 <= t1
    S = z_vals.shape[1]
    width = jnp.sum(sample_live_mask(z_vals, t0, t1), axis=1)
    center = s0 + width * 0.5
    return jnp.where(live_any, center, 2.0 * S + 1.0)
