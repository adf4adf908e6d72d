"""Fused frame-volume warp: the TPU-first inverse-LBS fast path.

XLA TPU gathers are latency-bound (~300M rows/s measured on v5e), so the
reference formulation -- every sample gathers 24 bones x 8 corners from the
weight volume (network.py:407-415) -- caps the whole renderer at <1M
samples/s. This module restructures the computation around two facts:

  1. trilinear interpolation is LINEAR in the volume values, so the per-bone
     constants (A_k, t_k) can be fused into the volume channels:
         B(q) = sum_k w_k(q) A_k,  c(q) = sum_k w_k(q) t_k,  S(q) = sum_k w_k(q)
     giving x_skel(p) = (B(p) p + c(p)) / clamp(S(p)) with ONE 16-channel
     lookup per sample instead of 24.
  2. resampling each bone's weight field onto a regular observation-space
     grid has *structured* indices, so it can run as dense 2-hot einsums on
     the MXU (no gathers at all): per bone, three axis contractions
     V[z,y,x] -> phi_z -> phi_y -> phi_x.

Per frame: build U (G,G,G,16) once (einsum resample, a few ms on MXU).
Per sample: one 16-lane row trilerp (8 row gathers).

This is an approximation (weights are interpolated twice: 32^3 canonical ->
G^3 observation grid -> sample). With G >= 2x the canonical resolution the
extra smoothing is far below the 32^3 field's own discretization. The exact
single-interpolation path (ops/trilinear.py) remains available via
cfg.warp.mode = 'exact' for reference-checkpoint parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _axis_phi(frac: jnp.ndarray, size: int, dtype=jnp.float32):
    """Fractional index (N,) -> 2-hot lerp matrix (N, size) with zeros
    padding semantics (out-of-range corners contribute 0)."""
    i0 = jnp.floor(frac)
    w = (frac - i0).astype(dtype)
    v0 = ((i0 >= 0) & (i0 <= size - 1)).astype(dtype)
    v1 = ((i0 + 1 >= 0) & (i0 + 1 <= size - 1)).astype(dtype)
    i0c = jnp.clip(i0, 0, size - 1).astype(jnp.int32)
    i1c = jnp.clip(i0 + 1, 0, size - 1).astype(jnp.int32)
    # comparison-based one-hot (jax.nn.one_hot): pure VPU compares, no gather
    h0 = jax.nn.one_hot(i0c, size, dtype=dtype)
    h1 = jax.nn.one_hot(i1c, size, dtype=dtype)
    return h0 * ((1 - w) * v0)[:, None] + h1 * (w * v1)[:, None]


def make_obs_grid(obs_min: jnp.ndarray, obs_max: jnp.ndarray, grid_size: int):
    """Regular grid over the observation bbox, layout [z, y, x] to match the
    canonical volume layout. Returns (G^3, 3) xyz points."""
    def lin(a, b):
        return jnp.linspace(a, b, grid_size)
    zs = lin(obs_min[2], obs_max[2])
    ys = lin(obs_min[1], obs_max[1])
    xs = lin(obs_min[0], obs_max[0])
    zg, yg, xg = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([xg, yg, zg], axis=-1).reshape(-1, 3)


def resample_bone_weights(vol: jnp.ndarray, pos: jnp.ndarray,
                          cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                          dtype=jnp.bfloat16) -> jnp.ndarray:
    """Trilinearly sample one bone's (D, H, W) volume at positions (N, 3)
    using dense 2-hot einsums (MXU) -- zero gathers.

    Matches torch grid_sample(zeros, align_corners=True) semantics like
    ops/trilinear.py; intended for *structured* N (a regular grid).
    """
    D, H, W = vol.shape
    coords = (pos - cnl_bbox_min_xyz) * cnl_bbox_scale_xyz - 1.0  # (x,y,z)
    fx = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    fy = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    fz = (coords[:, 2] + 1.0) * 0.5 * (D - 1)
    phi_z = _axis_phi(fz, D, dtype)                       # (N, D)
    phi_y = _axis_phi(fy, H, dtype)                       # (N, H)
    phi_x = _axis_phi(fx, W, dtype)                       # (N, W)
    # contract z: (N, D) @ (D, H*W) -> (N, H, W); then per-row y and x
    prec = _HI if dtype == jnp.float32 else None
    t1 = jnp.einsum("nd,dhw->nhw", phi_z, vol.astype(dtype),
                    precision=prec, preferred_element_type=jnp.float32)
    t2 = jnp.einsum("nh,nhw->nw", phi_y.astype(jnp.float32), t1,
                    precision=_HI)
    return jnp.einsum("nw,nw->n", phi_x.astype(jnp.float32), t2,
                      precision=_HI)


def build_fused_volume(motion_weights: jnp.ndarray,
                       motion_scale_Rs: jnp.ndarray,
                       motion_Ts: jnp.ndarray,
                       cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                       obs_min, obs_max, grid_size: int,
                       include_bone_weights: bool = False,
                       dtype=jnp.bfloat16,
                       pallas_resample: bool = False,
                       resample_blk: int = 512,
                       resample_support_skip: bool = True,
                       resample_window: bool = True,
                       shard_map_mesh=None):
    """Fuse all bones into one observation-space volume.

    Returns U of shape (G, G, G, C) with channels
      [0:9]  sum_k w_k A_k (row-major 3x3)
      [9:12] sum_k w_k t_k
      [12]   sum_k w_k            (fg likelihood)
      [13:16] zero padding  (+ [16:16+K] per-bone w_k when requested,
      padded to a lane multiple)

    pallas_resample=True keeps this einsum forward but swaps the einsum
    transpose for a Pallas backward kernel (ops/pallas_resample.py) --
    XLA's scatter-shaped volume-cotangent program is HBM-bound
    (~47 ms vs 13.5 ms at G=48 on v5e).
    """
    K = motion_weights.shape[0]
    if pallas_resample:
        import functools

        from humannerf_tpu.ops.pallas_resample import resample_all_bones
        rs = functools.partial(resample_all_bones, grid_size=grid_size,
                               dtype=dtype, blk=resample_blk,
                               support_skip=resample_support_skip,
                               windowed=resample_window)
        if shard_map_mesh is not None and shard_map_mesh.devices.size > 1:
            # GSPMD cannot partition a pallas_call: in a >1-device jit the
            # per-frame resample (and its custom_vjp backward kernel) must
            # sit in a shard_map manual region. All operands are per-frame
            # scalars/volumes -- replicate in, replicate out; every device
            # redundantly computes the identical (small) volume.
            from jax.sharding import PartitionSpec as P
            sm_kw = dict(mesh=shard_map_mesh,
                         in_specs=(P(),) * 7, out_specs=P())
            try:
                from jax import shard_map
                rs = shard_map(rs, check_vma=False, **sm_kw)
            except (ImportError, TypeError):      # older jax API
                from jax.experimental.shard_map import shard_map
                rs = shard_map(rs, check_rep=False, **sm_kw)
        w = rs(motion_weights, motion_scale_Rs, motion_Ts,
               cnl_bbox_min_xyz, cnl_bbox_scale_xyz, obs_min, obs_max)
    else:
        grid = make_obs_grid(obs_min, obs_max, grid_size)  # (G^3, 3)
        # per-bone warped positions of every grid point, then MXU resample
        ws = []
        for k in range(K):  # static 24-way loop of dense einsums
            pos = grid @ motion_scale_Rs[k].T + motion_Ts[k]
            ws.append(resample_bone_weights(
                motion_weights[k], pos, cnl_bbox_min_xyz,
                cnl_bbox_scale_xyz, dtype))
        w = jnp.stack(ws, axis=-1)                        # (G^3, K)
    A_flat = motion_scale_Rs.reshape(K, 9)
    feats = [w @ A_flat, w @ motion_Ts,
             jnp.sum(w, axis=-1, keepdims=True),
             jnp.zeros((w.shape[0], 3), w.dtype)]
    if include_bone_weights:
        pad = (-K) % 8
        feats.append(w)
        if pad:
            feats.append(jnp.zeros((w.shape[0], pad), w.dtype))
    U = jnp.concatenate(feats, axis=-1)
    G = grid_size
    return U.reshape(G, G, G, -1)


def build_packed_volume(U: jnp.ndarray) -> jnp.ndarray:
    """Pack each voxel's 8 trilinear corners into its own row.

    U (G, G, G, C) -> (G, G, G, 8*C) where channels [k*C:(k+1)*C] hold the
    (dz, dy, dx) = bits-of-k corner neighbor (edge-replicated). One sample
    lookup then needs exactly ONE row gather -- on TPU, where gathers are
    latency-bound, this is ~6x faster than 8 separate corner gathers
    (C=16 packs to 128 channels: a full TPU lane row). Memory cost: 8x the
    fused volume (~56 MB at G=48), paid once per frame.
    """
    parts = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                s = U
                if dz:
                    s = jnp.concatenate([s[1:], s[-1:]], 0)
                if dy:
                    s = jnp.concatenate([s[:, 1:], s[:, -1:]], 1)
                if dx:
                    s = jnp.concatenate([s[:, :, 1:], s[:, :, -1:]], 2)
                parts.append(s)
    return jnp.concatenate(parts, axis=-1)


def sample_packed_volume(U8: jnp.ndarray, pts: jnp.ndarray, obs_min, obs_max,
                         live: jnp.ndarray | None = None):
    """Single-gather trilerp of a packed volume -> (x_skel, fg, bone_w|None).

    Numerically identical to `sample_fused_volume` for in-range points
    (tests/test_fused_warp.py); out-of-range points get fg = 0 wholesale
    (they composite to background either way). live: optional (N,) bool
    conservative liveness (ops/liveness.py bands) -- dead samples clamp
    their gather row to the shared row 0 (cache-hot) and output exactly 0,
    which equals the unmasked result by the band guarantee.
    """
    G = U8.shape[0]
    C8 = U8.shape[-1]
    C = C8 // 8
    rows = U8.reshape(G * G * G, C8)
    scale = (G - 1) / (obs_max - obs_min)
    f = (pts - obs_min) * scale

    def axis(fr):
        i0 = jnp.clip(jnp.floor(fr), 0, G - 2)
        return (i0.astype(jnp.int32), fr - i0,
                (fr >= 0) & (fr <= G - 1))

    x0, wx, vx = axis(f[:, 0])
    y0, wy, vy = axis(f[:, 1])
    z0, wz, vz = axis(f[:, 2])
    flat = (z0 * G + y0) * G + x0
    if live is not None:
        lv = jax.lax.stop_gradient(live).reshape(-1) > 0
        vx = vx & lv
        flat = jnp.where(lv, flat, 0)
    g = rows[flat].reshape(-1, 8, C)                       # one gather
    w8 = jnp.stack([
        (1 - wz) * (1 - wy) * (1 - wx), (1 - wz) * (1 - wy) * wx,
        (1 - wz) * wy * (1 - wx),       (1 - wz) * wy * wx,
        wz * (1 - wy) * (1 - wx),       wz * (1 - wy) * wx,
        wz * wy * (1 - wx),             wz * wy * wx], axis=1)
    # NOTE: keep the einsum form -- XLA fuses the row gather straight
    # into it on the eval path (a slice-loop reformulation measured 4%
    # slower end-to-end renders), and pallas_scatter._fwd_impl must use
    # the identical expression (forward-parity test pins them together).
    acc = jnp.einsum("nkc,nk->nc", g.astype(jnp.float32), w8, precision=_HI)
    acc = jnp.where((vx & vy & vz)[:, None], acc, 0.0)

    B = acc[:, :9].reshape(-1, 3, 3)
    c = acc[:, 9:12]
    S = acc[:, 12:13]
    x_skel = (jnp.einsum("nij,nj->ni", B, pts, precision=_HI) + c) \
        / jnp.clip(S, 1e-4)
    bone_w = acc[:, 16:] if C > 16 else None
    return x_skel, S, bone_w


def sample_fused_volume(U: jnp.ndarray, pts: jnp.ndarray, obs_min, obs_max):
    """One multi-channel trilerp per point -> (x_skel, fg, bone_weights|None).

    pts: (N, 3) observation-space points. Row gathers (all channels per
    corner) keep this latency-efficient on TPU.
    """
    G = U.shape[0]
    C = U.shape[-1]
    rows = U.reshape(G * G * G, C)
    scale = (G - 1) / (obs_max - obs_min)
    f = (pts - obs_min) * scale                           # (N, 3) in [0, G-1]
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]

    def axis(fr, size):
        i0 = jnp.floor(fr)
        w = fr - i0
        v0 = ((i0 >= 0) & (i0 <= size - 1))
        v1 = ((i0 + 1 >= 0) & (i0 + 1 <= size - 1))
        return (jnp.clip(i0, 0, size - 1).astype(jnp.int32),
                jnp.clip(i0 + 1, 0, size - 1).astype(jnp.int32),
                jnp.where(v0, 1.0 - w, 0.0), jnp.where(v1, w, 0.0))

    x0, x1, wx0, wx1 = axis(fx, G)
    y0, y1, wy0, wy1 = axis(fy, G)
    z0, z1, wz0, wz1 = axis(fz, G)

    acc = 0.0
    for zi, wz in ((z0, wz0), (z1, wz1)):
        for yi, wy in ((y0, wy0), (y1, wy1)):
            for xi, wx in ((x0, wx0), (x1, wx1)):
                flat = (zi * G + yi) * G + xi
                acc = acc + rows[flat] * (wz * wy * wx)[:, None]

    B = acc[:, :9].reshape(-1, 3, 3)
    c = acc[:, 9:12]
    S = acc[:, 12:13]
    x_skel = (jnp.einsum("nij,nj->ni", B, pts, precision=_HI) + c) \
        / jnp.clip(S, 1e-4)
    bone_w = acc[:, 16:] if acc.shape[-1] > 16 else None
    return x_skel, S, bone_w
