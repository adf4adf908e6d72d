"""Pallas TPU backward kernel for the all-bone obs-grid weight resample.

The per-frame fused-volume build (ops.fused_warp.build_fused_volume)
trilinearly samples 24 canonical (32, 32, 32) weight fields at all G^3
observation-grid points. Under `jax.grad`, XLA's transpose of that einsum
chain is HBM-bound -- the volume cotangent is a scatter-shaped contraction
through (N, D, H)-sized intermediates (~47 ms at G=48 on v5e, paid every
training step).

This module keeps XLA's *forward* (5.9 ms -- the bf16 einsums fuse well)
and replaces only the *backward* with a Pallas kernel: per point-block
it recomputes the forward in VMEM (all 24 volumes fit on-chip; the
regular obs grid is rebuilt from iota) and accumulates d(vols)
(K, D, H*W) plus per-bone affine grads dA (K, 3, 3), dT (K, 3) in
VMEM-resident accumulators across the sequential grid. Gradients w.r.t.
the (data-derived) bounding boxes are defined as zero.

Round 5 added per-(block, bone) SUPPORT WINDOWS (see the comment at
_DW): a compact point tile warps to a small band of the volume, so the
contractions run on a (24, 20*W) window read/accumulated at dynamic
aligned offsets -- 18.4 -> 14.0 ms in the production train step, with a
full-width leftover kernel for (rare) non-fitting pairs.

The y/x contractions use iota-built replication matrices
(R_y[h, h*W+w] = 1, R_x[w', h*W+w] = (w == w')) so no 3D reshapes are
needed; interpolation semantics match `_axis_phi` exactly (torch
grid_sample, zeros padding, align_corners=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _phi(f, size):
    """Fractional coords (B, 1) -> 2-hot interp matrix (B, size).

    Matches fused_warp._axis_phi (zeros-padding validity folded in).
    """
    i0 = jnp.floor(f)
    w = f - i0
    v0 = ((i0 >= 0) & (i0 <= size - 1)).astype(jnp.float32)
    v1 = ((i0 + 1 >= 0) & (i0 + 1 <= size - 1)).astype(jnp.float32)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i0 + 1, 0, size - 1)
    B = f.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, size), 1
                                    ).astype(jnp.float32)
    h0 = (cols == i0c).astype(jnp.float32)
    h1 = (cols == i1c).astype(jnp.float32)
    return h0 * ((1.0 - w) * v0) + h1 * (w * v1), h0, h1, w, v0, v1


def _phi_win(f, size, off, wsize):
    """Windowed 2-hot interp matrix (B, wsize) at global offset `off`.

    Columns are global indices [off, off + wsize); validity bounds stay
    GLOBAL (zeros padding against the full axis). Entries whose clipped
    stencil index falls outside the window are silently dropped -- callers
    must guarantee window coverage (the _window_tables fit test).
    """
    i0 = jnp.floor(f)
    w = f - i0
    v0 = ((i0 >= 0) & (i0 <= size - 1)).astype(jnp.float32)
    v1 = ((i0 + 1 >= 0) & (i0 + 1 <= size - 1)).astype(jnp.float32)
    offf = off.astype(jnp.float32) if hasattr(off, "dtype") else float(off)
    i0c = jnp.clip(i0, 0, size - 1) - offf
    i1c = jnp.clip(i0 + 1, 0, size - 1) - offf
    B = f.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, wsize), 1
                                    ).astype(jnp.float32)
    h0 = (cols == i0c).astype(jnp.float32)
    h1 = (cols == i1c).astype(jnp.float32)
    return h0 * ((1.0 - w) * v0) + h1 * (w * v1), h0, h1, w, v0, v1


def _rep_mats(H, W, hw=None):
    """Iota-built replication matrices for the y/x contractions.

    hw defaults to H*W; pass a window width (Hw*W) for the windowed
    kernel -- the patterns are window-local and static because lane
    windows start at whole-H-row boundaries (hoff*W)."""
    if hw is None:
        hw = H * W
    ry_r = jax.lax.broadcasted_iota(jnp.int32, (H, hw), 0)
    ry_c = jax.lax.broadcasted_iota(jnp.int32, (H, hw), 1)
    Ry = (ry_c // W == ry_r).astype(jnp.float32)       # (H, hw)
    rx_r = jax.lax.broadcasted_iota(jnp.int32, (W, hw), 0)
    rx_c = jax.lax.broadcasted_iota(jnp.int32, (W, hw), 1)
    Rx = (rx_c % W == rx_r).astype(jnp.float32)        # (W, hw)
    return Ry, Rx


def _tile_dims(G, blk):
    """Spatial-tile shape (tz, ty, tx) for the tiled point layout, or None.

    Raster point blocks are thin z-slab strips (blk=512 at G=48 is ~11
    rows of one slice), so nearly every block touches the body and the
    per-block skips almost never fire. Re-ordering points into compact
    (tz, 8, 8) sub-cubes makes empty space block-coherent: one block = a
    cube, and cubes outside the body are wholly dead for both the
    cotangent-dead and the bone-support skip. Returns None when G/blk
    don't factor (callers fall back to raster order).
    """
    if G % 8 != 0 or blk % 64 != 0:
        return None
    tz = min(blk // 64, G)
    while tz > 1 and (G % tz != 0 or blk % (tz * 64) != 0):
        tz -= 1
    if G % tz != 0 or blk % (tz * 64) != 0:
        return None
    return (tz, 8, 8)


def _tiled_raster_ids(G, tile):
    """(G^3,) i32: raster point id of each tiled-layout position."""
    tz, ty, tx = tile
    ntx, nty = G // tx, G // ty
    ids = jnp.arange(G * G * G, dtype=jnp.int32)
    tilesz = tz * ty * tx
    t, w = ids // tilesz, ids % tilesz
    lx, ly, lz = w % tx, (w // tx) % ty, w // (tx * ty)
    xi = (t % ntx) * tx + lx
    yi = ((t // ntx) % nty) * ty + ly
    zi = (t // (ntx * nty)) * tz + lz
    return (zi * G + yi) * G + xi


def _grid_cols(pi, blk, G, bbox_ref, tile=None):
    """Block-local obs-grid positions as three (B, 1) columns.

    tile=None: flat layout matches fused_warp.make_obs_grid,
    id = (z*G + y)*G + x, pos = (xs[x], ys[y], zs[z]) over
    linspace(obs_min, obs_max, G). tile=(tz, ty, tx): the tiled layout of
    _tiled_raster_ids (the caller permutes the cotangent to match).
    """
    ids = pi * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    if tile is None:
        zi = (ids // (G * G)).astype(jnp.float32)
        yi = ((ids // G) % G).astype(jnp.float32)
        xi = (ids % G).astype(jnp.float32)
    else:
        tz, ty, tx = tile
        ntx, nty = G // tx, G // ty
        tilesz = tz * ty * tx
        t, w = ids // tilesz, ids % tilesz
        xi = ((t % ntx) * tx + w % tx).astype(jnp.float32)
        yi = (((t // ntx) % nty) * ty + (w // tx) % ty).astype(jnp.float32)
        zi = ((t // (ntx * nty)) * tz + w // (tx * ty)).astype(jnp.float32)
    def lin(d, t):
        lo = bbox_ref[0, 6 + d]
        step = bbox_ref[0, 9 + d]
        return lo + t * step
    return lin(0, xi), lin(1, yi), lin(2, zi)


def _bone_coords(px, py, pz, aff_ref, bbox_ref, k, dims):
    """Warp obs positions by bone k's affine, to fractional volume coords."""
    D, H, W = dims
    def a(i, j):
        return aff_ref[k, 3 * i + j]
    def t(i):
        return aff_ref[k, 9 + i]
    qx = px * a(0, 0) + py * a(0, 1) + pz * a(0, 2) + t(0)
    qy = px * a(1, 0) + py * a(1, 1) + pz * a(1, 2) + t(1)
    qz = px * a(2, 0) + py * a(2, 1) + pz * a(2, 2) + t(2)
    # (q - cnl_min) * cnl_scale - 1 -> [-1, 1]; then to fractional index
    def frac(q, d, size):
        c = (q - bbox_ref[0, d]) * bbox_ref[0, 3 + d] - 1.0
        return (c + 1.0) * 0.5 * (size - 1)
    return (frac(qx, 0, W), frac(qy, 1, H), frac(qz, 2, D),
            (qx, qy, qz))


def _bwd_kernel(G, dims, dtype, tile, lv_ref, vols_ref, aff_ref, bbox_ref,
                g_ref, dvols_ref, dA_ref, dT_ref):
    """lv_ref (scalar prefetch, (nblk,) i32): per-block bone liveness
    bitmask; 0 = the whole block is skipped. Bits are cleared when
    (a) the block's incoming cotangent is exactly zero (contributes
    nothing to any output -- unconditionally exact) or (b) the bone's
    weight support never intersects the block's warped stencil (dA/dT
    are exactly zero there; dvols entries land on zero-weight voxels --
    see resample_all_bones's support_skip contract). mask == 0 skips the
    whole block; otherwise each bone k runs under bit k's predicate."""
    D, H, W = dims
    blk = g_ref.shape[0]
    K = vols_ref.shape[0]

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero():
        dvols_ref[:] = jnp.zeros_like(dvols_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dT_ref[:] = jnp.zeros_like(dT_ref)

    mask = lv_ref[pid]

    @pl.when(mask != 0)
    def _body():
        # per-bone pl.when gating is free on fully-live blocks (measured
        # 28.4 ms either way at G=48/K=24/blk=512 isolated) and the
        # kernel time scales ~linearly with live (block, bone) pairs
        px, py, pz = _grid_cols(pid, blk, G, bbox_ref, tile)
        Ry, Rx = _rep_mats(H, W)
        prec = _HI if dtype == jnp.float32 else None
        g = g_ref[:]
        for k in range(K):

            @pl.when((mask >> k) & 1 != 0)
            def _bone(k=k):
                fx, fy, fz, _q = _bone_coords(px, py, pz, aff_ref,
                                              bbox_ref, k, dims)
                phz, hz0, hz1, wz, vz0, vz1 = _phi(fz, D)
                phy, hy0, hy1, wy, vy0, vy1 = _phi(fy, H)
                phx, hx0, hx1, wx, vx0, vx1 = _phi(fx, W)
                volk = vols_ref[k].astype(dtype)
                # MXU-heavy formulation: one (B, H*W) elementwise product
                # feeds two group-reduction matmuls, instead of three
                # triple products (the VPU passes over (B, 1024) dominate
                # this kernel's runtime)
                t1 = jnp.dot(phz.astype(dtype), volk, precision=prec,
                             preferred_element_type=jnp.float32)
                yrep = jnp.dot(phy.astype(dtype), Ry.astype(dtype),
                               precision=prec,
                               preferred_element_type=jnp.float32)
                u = t1 * yrep                                   # (B, H*W)
                t2 = jax.lax.dot_general(                       # (B, W)
                    u.astype(dtype), Rx.astype(dtype),
                    (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)

                gk = g[:, k:k + 1]                              # (B, 1)
                dphx = gk * t2
                dt2 = gk * phx                                  # (B, W)
                du = jnp.dot(dt2.astype(dtype), Rx.astype(dtype),
                             precision=prec,
                             preferred_element_type=jnp.float32)
                dt1 = du * yrep
                dyrep = du * t1
                dvols_ref[k] += jax.lax.dot_general(
                    phz.astype(dtype), dt1.astype(dtype),
                    (((0,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                dphz = jax.lax.dot_general(
                    dt1.astype(dtype), volk, (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                dphy = jax.lax.dot_general(
                    dyrep.astype(dtype), Ry.astype(dtype),
                    (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)

                # d(phi)/d(frac): phi = h0*(1-w)*v0 + h1*w*v1
                #   -> h1*v1 - h0*v0
                dfz = jnp.sum(dphz * (hz1 * vz1 - hz0 * vz0), axis=1,
                              keepdims=True)
                dfy = jnp.sum(dphy * (hy1 * vy1 - hy0 * vy0), axis=1,
                              keepdims=True)
                dfx = jnp.sum(dphx * (hx1 * vx1 - hx0 * vx0), axis=1,
                              keepdims=True)
                # frac = ((q - cnl_min)*scale)/2 * (size-1)
                #   -> dq = df * scale/2*(s-1)
                dqx = dfx * (bbox_ref[0, 3] * 0.5 * (W - 1))
                dqy = dfy * (bbox_ref[0, 4] * 0.5 * (H - 1))
                dqz = dfz * (bbox_ref[0, 5] * 0.5 * (D - 1))
                # q = A p + t (A row-major in aff[:9], t in aff[9:12])
                dq = jnp.concatenate([dqx, dqy, dqz], axis=-1)   # (B, 3)
                p = jnp.concatenate([px, py, pz], axis=-1)       # (B, 3)
                dA = jax.lax.dot_general(
                    dq, p, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (3, 3)
                dT = jnp.sum(dq, axis=0, keepdims=True)          # (1, 3)
                dA_ref[k] += dA
                dT_ref[k:k + 1, :] += dT


def _bwd_kernel_win(G, dims, dtype, tile, lv_ref, zb_ref, h0_ref, h1_ref,
                    vols_ref, aff_ref, bbox_ref, g_ref,
                    dvols_ref, dA_ref, dT_ref):
    """Windowed variant of _bwd_kernel (see the module-level comment at
    _DW): per live bone, all volume contractions run on a
    (_DW, _HW_ROWS*W) window of bone k's (D, H*W) volume, read and
    accumulated at dynamic (8-aligned sublane, 128-aligned lane) offsets
    decoded from the prefetched zbits/hidx tables. The liveness bitmask
    lv carries only pairs whose stencil range FITS the window
    (_window_tables); leftovers go to the legacy kernel."""
    D, H, W = dims
    blk = g_ref.shape[0]
    K = vols_ref.shape[0]
    HWW = _HW_ROWS * W

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _zero():
        dvols_ref[:] = jnp.zeros_like(dvols_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dT_ref[:] = jnp.zeros_like(dT_ref)

    mask = lv_ref[pid]
    zbits = zb_ref[pid]
    h16 = (h0_ref[pid], h1_ref[pid])

    @pl.when(mask != 0)
    def _body():
        px, py, pz = _grid_cols(pid, blk, G, bbox_ref, tile)
        Ry, Rx = _rep_mats(_HW_ROWS, W)                 # (Hw, HWW), (W, HWW)
        prec = _HI if dtype == jnp.float32 else None
        g = g_ref[:]
        for k in range(K):

            @pl.when((mask >> k) & 1 != 0)
            def _bone(k=k):
                zoff = pl.multiple_of(((zbits >> k) & 1) * 8, 8)
                hidx = (h16[k // 16] >> (2 * (k % 16))) & 3
                hrow = hidx * 4
                hlane = pl.multiple_of(hidx * (4 * W), 128)
                fx, fy, fz, _q = _bone_coords(px, py, pz, aff_ref,
                                              bbox_ref, k, dims)
                phz, hz0, hz1, wz, vz0, vz1 = _phi_win(fz, D, zoff, _DW)
                phy, hy0, hy1, wy, vy0, vy1 = _phi_win(fy, H, hrow,
                                                       _HW_ROWS)
                phx, hx0, hx1, wx, vx0, vx1 = _phi(fx, W)
                volk = vols_ref[k, pl.ds(zoff, _DW),
                                pl.ds(hlane, HWW)].astype(dtype)
                t1 = jnp.dot(phz.astype(dtype), volk, precision=prec,
                             preferred_element_type=jnp.float32)
                yrep = jnp.dot(phy.astype(dtype), Ry.astype(dtype),
                               precision=prec,
                               preferred_element_type=jnp.float32)
                u = t1 * yrep                                   # (B, HWW)
                t2 = jax.lax.dot_general(                       # (B, W)
                    u.astype(dtype), Rx.astype(dtype),
                    (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)

                gk = g[:, k:k + 1]                              # (B, 1)
                dphx = gk * t2
                dt2 = gk * phx                                  # (B, W)
                du = jnp.dot(dt2.astype(dtype), Rx.astype(dtype),
                             precision=prec,
                             preferred_element_type=jnp.float32)
                dt1 = du * yrep
                dyrep = du * t1
                dvols_ref[k, pl.ds(zoff, _DW), pl.ds(hlane, HWW)] += \
                    jax.lax.dot_general(
                        phz.astype(dtype), dt1.astype(dtype),
                        (((0,), (0,)), ((), ())),
                        precision=prec, preferred_element_type=jnp.float32)
                dphz = jax.lax.dot_general(
                    dt1.astype(dtype), volk, (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                dphy = jax.lax.dot_general(
                    dyrep.astype(dtype), Ry.astype(dtype),
                    (((1,), (1,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)

                dfz = jnp.sum(dphz * (hz1 * vz1 - hz0 * vz0), axis=1,
                              keepdims=True)
                dfy = jnp.sum(dphy * (hy1 * vy1 - hy0 * vy0), axis=1,
                              keepdims=True)
                dfx = jnp.sum(dphx * (hx1 * vx1 - hx0 * vx0), axis=1,
                              keepdims=True)
                dqx = dfx * (bbox_ref[0, 3] * 0.5 * (W - 1))
                dqy = dfy * (bbox_ref[0, 4] * 0.5 * (H - 1))
                dqz = dfz * (bbox_ref[0, 5] * 0.5 * (D - 1))
                dq = jnp.concatenate([dqx, dqy, dqz], axis=-1)   # (B, 3)
                p = jnp.concatenate([px, py, pz], axis=-1)       # (B, 3)
                dA = jax.lax.dot_general(
                    dq, p, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)          # (3, 3)
                dT = jnp.sum(dq, axis=0, keepdims=True)          # (1, 3)
                dA_ref[k] += dA
                dT_ref[k:k + 1, :] += dT


def _const_spec(shape, ms=pltpu.VMEM):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, *s: (0,) * nd, memory_space=ms)


def _block_axis_ranges(nblk, blk, G, tile=None):
    """Conservative per-axis index ranges of each point block.

    Raster layout (tile=None, id = (z*G + y)*G + x): x is always the full
    row (blk >= G in practice); y falls back to the full range whenever
    the block's row interval wraps a z boundary. Tiled layout: a block is
    blk // (tz*ty*tx) consecutive compact sub-cubes; ranges are the exact
    union of the covered tiles' AABBs. Returns ((xlo, xhi), (ylo, yhi),
    (zlo, zhi)) as (nblk,) i32 vectors.
    """
    a = jnp.arange(nblk, dtype=jnp.int32) * blk
    b = a + blk - 1
    if tile is not None:
        tz, ty, tx = tile
        ntx, nty = G // tx, G // ty
        tilesz = tz * ty * tx
        c = blk // tilesz
        t = a[:, None] // tilesz + jnp.arange(c, dtype=jnp.int32)[None]
        # tiles past the point count (padded tail) clamp to the last tile
        t = jnp.minimum(t, G * G * G // tilesz - 1)
        xlo = jnp.min((t % ntx) * tx, axis=1)
        xhi = jnp.max((t % ntx) * tx, axis=1) + tx - 1
        ylo = jnp.min(((t // ntx) % nty) * ty, axis=1)
        yhi = jnp.max(((t // ntx) % nty) * ty, axis=1) + ty - 1
        zlo = jnp.min((t // (ntx * nty)) * tz, axis=1)
        zhi = jnp.max((t // (ntx * nty)) * tz, axis=1) + tz - 1
        return (xlo, xhi), (ylo, yhi), (zlo, zhi)
    zlo, zhi = a // (G * G), b // (G * G)
    rlo, rhi = a // G, b // G                      # global row ids
    ylo_raw, yhi_raw = rlo % G, rhi % G
    full = (rhi - rlo >= G - 1) | (yhi_raw < ylo_raw)
    ylo = jnp.where(full, 0, ylo_raw)
    yhi = jnp.where(full, G - 1, yhi_raw)
    # x: conservative full row (blocks span >= 1 row whenever blk >= G;
    # for blk < G a block can still straddle a row boundary, so stay full)
    xlo = jnp.zeros_like(a)
    xhi = jnp.full_like(a, G - 1)
    return (xlo, xhi), (ylo, yhi), (zlo, zhi)


def _warped_frac_ranges(aff, bbox, nblk, blk, G, dims, tile=None):
    """Conservative per-(block, bone, axis) fractional-coord intervals.

    Warps each point block's obs-space AABB through every bone affine
    (interval arithmetic: |A| on half-extents) and converts to fractional
    volume coordinates. Returns (flo, fhi), each (nblk, K, 3) with axis
    order (x/W, y/H, z/D) -- the frac convention of _bone_coords.
    """
    K = aff.shape[0]
    D, H, W = dims
    sizes = (W, H, D)
    rngs = _block_axis_ranges(nblk, blk, G, tile)
    lo3, hi3 = [], []
    for d, (ilo, ihi) in enumerate(rngs):
        base, step = bbox[0, 6 + d], bbox[0, 9 + d]
        lo3.append(base + ilo.astype(jnp.float32) * step)
        hi3.append(base + ihi.astype(jnp.float32) * step)
    c = jnp.stack([(l + h) * 0.5 for l, h in zip(lo3, hi3)], axis=1)
    h = jnp.stack([(hh - l) * 0.5 for l, hh in zip(lo3, hi3)], axis=1)

    A = aff[:, :9].reshape(K, 3, 3)
    T = aff[:, 9:12]
    qc = jnp.einsum("kij,bj->bki", A, c) + T[None]       # (nblk, K, 3)
    qh = jnp.einsum("kij,bj->bki", jnp.abs(A), h)        # (nblk, K, 3)

    flo, fhi = [], []
    for d in range(3):
        size = sizes[d]
        # frac = ((q - cnl_min) * cnl_scale) / 2 * (size - 1); scale > 0
        def frac(q, d=d, size=size):
            return (q - bbox[0, d]) * bbox[0, 3 + d] * 0.5 * (size - 1)
        flo.append(frac(qc[..., d] - qh[..., d]))
        fhi.append(frac(qc[..., d] + qh[..., d]))
    return jnp.stack(flo, axis=-1), jnp.stack(fhi, axis=-1)


def _support_mask(vols2d, aff, bbox, nblk, blk, G, dims, tile=None):
    """(nblk,) i32 bitmask: bit k = bone k's weight support can intersect
    the block's warped trilinear stencil. Cleared bits are exactly-zero
    contributions to dA/dT, and dvols contributions landing on
    zero-weight voxels only (see resample_all_bones support_skip)."""
    K = vols2d.shape[0]
    D, H, W = dims
    vols = vols2d.reshape(K, D, H, W)
    sizes = (W, H, D)

    def support_range(nz, size):
        # nz: (K, size) bool -> frac-coord live window [imin-1, imax+1]
        idx = jnp.arange(size, dtype=jnp.float32)
        imin = jnp.min(jnp.where(nz, idx, float(size)), axis=1) - 1.0
        imax = jnp.max(jnp.where(nz, idx, -1.0), axis=1) + 1.0
        return imin, imax

    nzx = jnp.any(vols != 0, axis=(1, 2))          # (K, W)
    nzy = jnp.any(vols != 0, axis=(1, 3))          # (K, H)
    nzz = jnp.any(vols != 0, axis=(2, 3))          # (K, D)
    sup = [support_range(nz, s)
           for nz, s in zip((nzx, nzy, nzz), sizes)]

    flo, fhi = _warped_frac_ranges(aff, bbox, nblk, blk, G, dims, tile)
    live = jnp.ones((nblk, K), bool)
    for d in range(3):
        imin, imax = sup[d]
        live &= (fhi[..., d] >= imin[None]) & (flo[..., d] <= imax[None])
    bits = jnp.left_shift(
        live.astype(jnp.int32), jnp.arange(K, dtype=jnp.int32)[None])
    return jnp.sum(bits, axis=1).astype(jnp.int32)


# -- windowed backward: per-(block, bone) support windows ------------------
#
# A compact point tile warps through an affine to a small axis-aligned
# band of the canonical volume (measured at production shapes, G=48 /
# blk=512 / tile (8,8,8): z-extent <= 15 of 32, y-extent <= 8 of 32), so
# the per-bone contractions only ever touch a (Dw, Hw*W) window of the
# (D, H*W) volume. The windowed kernel reads volume windows at dynamic
# (8-aligned sublane, 128-aligned lane) offsets and accumulates d(vols)
# into the matching window -- cutting the matmul FLOPs to ~0.4x and the
# dominant (B, H*W) VPU passes to Hw/H. Pairs whose stencil range does
# not fit a window (possible only for exotic tile/affine combinations)
# keep their live bit in a leftover mask handled by the full-width legacy
# kernel, which is launched alongside and is ~free when fully dead.

_DW = 24      # z window (sublane dim): offsets {0, 8}, covers extents <= 17
_HW_ROWS = 20  # y window rows: lane offsets {0,4,8,12}*W, extents <= 17


def _window_tables(aff, bbox, nblk, blk, G, dims, tile=None):
    """Per-(block, bone) window offsets + fit mask for the windowed kernel.

    Returns (zbits, hidx0, hidx1, fit): zbits (nblk,) i32 bitmask (bit k =
    bone k uses zoff 8 instead of 0); hidx0/hidx1 (nblk,) i32 with 2-bit
    fields (bones 0-15 / 16-23) holding hoff/4 in {0..3}; fit (nblk, K)
    bool = the clipped stencil range fits the (8-aligned z, 4-aligned h)
    windows.
    """
    K = aff.shape[0]
    D, H, W = dims
    flo, fhi = _warped_frac_ranges(aff, bbox, nblk, blk, G, dims, tile)

    def stencil(d, size):
        lo = jnp.clip(jnp.floor(flo[..., d]), 0, size - 1).astype(jnp.int32)
        hi = jnp.clip(jnp.floor(fhi[..., d]) + 1, 0, size - 1) \
            .astype(jnp.int32)
        return lo, hi

    ylo, yhi = stencil(1, H)
    zlo, zhi = stencil(2, D)
    zoff = jnp.where(zhi <= _DW - 1, 0, 8)
    fit_z = (zlo >= zoff) & (zhi <= zoff + _DW - 1)
    hoff = jnp.clip((ylo // 4) * 4, 0, H - _HW_ROWS)
    fit_h = yhi <= hoff + _HW_ROWS - 1
    fit = fit_z & fit_h

    kk = jnp.arange(K, dtype=jnp.int32)[None]
    zbits = jnp.sum(jnp.left_shift((zoff == 8).astype(jnp.int32), kk),
                    axis=1).astype(jnp.int32)
    hidx = hoff // 4                                     # (nblk, K) in 0..3
    lo16 = jnp.sum(jnp.left_shift(hidx[:, :16], 2 * kk[:, :16]), axis=1)
    hi16 = jnp.sum(
        jnp.left_shift(hidx[:, 16:], 2 * kk[:, :K - 16]), axis=1) \
        if K > 16 else jnp.zeros((nblk,), jnp.int32)
    return (zbits.astype(jnp.int32), lo16.astype(jnp.int32),
            hi16.astype(jnp.int32), fit)


@functools.partial(jax.jit,
                   static_argnames=("G", "dims", "dtype_str", "blk",
                                    "support_skip", "interpret", "tiled",
                                    "windowed"))
def _bwd_call(vols2d, aff, bbox, g, *, G, dims, dtype_str, blk,
              support_skip, interpret, tiled=True, windowed=True):
    K = vols2d.shape[0]
    N = G * G * G
    # spatial-tile point order (see _tile_dims): one block = compact
    # sub-cubes instead of thin z-slab strips, so empty space is
    # block-coherent and both skips actually fire. The output grads are
    # point-order independent (bone-space accumulators), so only the
    # incoming cotangent needs permuting -- a bijection, exact.
    tile = _tile_dims(G, blk) if tiled else None
    if tile is not None:
        g = jnp.take(g, _tiled_raster_ids(G, tile), axis=0)
    npad = -(-N // blk) * blk
    if npad != N:
        g = jnp.concatenate(
            [g, jnp.zeros((npad - N, K), g.dtype)], axis=0)
    nblk = npad // blk
    # per-block cotangent liveness: a block whose incoming cotangent is
    # exactly zero contributes nothing to dvols/dA/dT (unconditionally
    # exact; fires on fg==0 empty-space samples whose MLP-skip zeroed the
    # whole downstream gradient, and on the padded tail)
    g_live = jnp.max(jnp.abs(g).reshape(nblk, blk * K), axis=1) > 0
    if support_skip and K <= 30:
        bone_bits = _support_mask(vols2d, aff, bbox, nblk, blk, G, dims,
                                  tile)
    else:
        bone_bits = jnp.full((nblk,), (1 << K) - 1, jnp.int32)
    lv = jnp.where(g_live, bone_bits, 0)
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32

    def legacy_call(lv_mask, vols_in):
        kern = functools.partial(_bwd_kernel, G, dims, dtype, tile)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblk,),
                in_specs=[_const_spec(vols_in.shape),
                          _const_spec(aff.shape, pltpu.SMEM),
                          _const_spec(bbox.shape, pltpu.SMEM),
                          pl.BlockSpec((blk, K), lambda i, *s: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=(_const_spec(vols_in.shape),
                           _const_spec((K, 3, 3)), _const_spec((K, 3))),
            ),
            out_shape=(jax.ShapeDtypeStruct(vols_in.shape, jnp.float32),
                       jax.ShapeDtypeStruct((K, 3, 3), jnp.float32),
                       jax.ShapeDtypeStruct((K, 3), jnp.float32)),
            interpret=interpret,
        )(lv_mask, vols_in, aff, bbox, g)

    D, H, W = dims
    use_window = (windowed and D >= _DW and H >= _HW_ROWS
                  and (4 * W) % 128 == 0 and D % 8 == 0 and K <= 32)
    if not use_window:
        return legacy_call(lv, vols2d)

    zbits, hb0, hb1, fit = _window_tables(aff, bbox, nblk, blk, G, dims,
                                          tile)
    kk = jnp.arange(K, dtype=jnp.int32)[None]
    fit_bits = jnp.sum(jnp.left_shift(fit.astype(jnp.int32), kk),
                       axis=1).astype(jnp.int32)
    lv_win = lv & fit_bits
    lv_left = lv & ~fit_bits
    # window slicing needs f32 sublane granularity (8); bf16 tiles at 16
    vols32 = vols2d.astype(jnp.float32)
    kern = functools.partial(_bwd_kernel_win, G, dims, dtype, tile)
    dvols, dA, dT = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblk,),
            in_specs=[_const_spec(vols32.shape),
                      _const_spec(aff.shape, pltpu.SMEM),
                      _const_spec(bbox.shape, pltpu.SMEM),
                      pl.BlockSpec((blk, K), lambda i, *s: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(_const_spec(vols32.shape), _const_spec((K, 3, 3)),
                       _const_spec((K, 3))),
        ),
        out_shape=(jax.ShapeDtypeStruct(vols32.shape, jnp.float32),
                   jax.ShapeDtypeStruct((K, 3, 3), jnp.float32),
                   jax.ShapeDtypeStruct((K, 3), jnp.float32)),
        interpret=interpret,
    )(lv_win, zbits, hb0, hb1, vols32, aff, bbox, g)
    # leftover pairs (stencil range exceeds the windows -- rare to never
    # in production) run through the full-width kernel; when lv_left is
    # all-zero this costs only the grid's block DMAs
    dv2, dA2, dT2 = legacy_call(lv_left, vols2d)
    return dvols + dv2, dA + dA2, dT + dT2


def _einsum_forward(vols2d, aff, bbox, G, dims, dtype_str):
    """Reference einsum forward (ops.fused_warp) on the packed operands.

    Used as the custom_vjp primal: measured on v5e at G=48/K=24, XLA's
    fused einsum forward (5.9 ms) beats the Pallas forward kernel
    (14.6 ms) -- its (N, D, H) intermediate stays bf16 and fuses -- while
    the Pallas BACKWARD (13.5 ms) beats XLA's transpose program (47 ms),
    whose scatter-style volume grad does not fuse. Hybrid wins both ways.
    """
    from humannerf_tpu.ops.fused_warp import (make_obs_grid,
                                              resample_bone_weights)
    K = vols2d.shape[0]
    D, H, W = dims
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    obs_min = bbox[0, 6:9]
    step = bbox[0, 9:12]
    obs_max = obs_min + step * (G - 1)
    grid = make_obs_grid(obs_min, obs_max, G)
    Rs = aff[:, :9].reshape(K, 3, 3)
    Ts = aff[:, 9:12]
    cnl_min, cnl_scale = bbox[0, 0:3], bbox[0, 3:6]
    ws = []
    for k in range(K):
        pos = grid @ Rs[k].T + Ts[k]
        ws.append(resample_bone_weights(vols2d[k].reshape(D, H, W), pos,
                                        cnl_min, cnl_scale, dtype))
    return jnp.stack(ws, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _resample_op(vols2d, aff, bbox, G, dims, dtype_str, blk, support_skip,
                 windowed):
    return _einsum_forward(vols2d, aff, bbox, G, dims, dtype_str)


def _resample_fwd(vols2d, aff, bbox, G, dims, dtype_str, blk, support_skip,
                  windowed):
    out = _resample_op(vols2d, aff, bbox, G, dims, dtype_str, blk,
                       support_skip, windowed)
    return out, (vols2d, aff, bbox)


def _resample_bwd(G, dims, dtype_str, blk, support_skip, windowed, res, g):
    vols2d, aff, bbox = res
    interpret = jax.default_backend() != "tpu"
    dvols, dA, dT = _bwd_call(vols2d, aff, bbox, g, G=G, dims=dims,
                              dtype_str=dtype_str, blk=blk,
                              support_skip=support_skip,
                              interpret=interpret, windowed=windowed)
    K = vols2d.shape[0]
    daff = jnp.concatenate(
        [dA.reshape(K, 9), dT, jnp.zeros((K, 4), jnp.float32)], axis=-1)
    # bounding boxes are data-derived (non-trainable): zero grad
    return (dvols.astype(vols2d.dtype), daff.astype(aff.dtype),
            jnp.zeros_like(bbox))


_resample_op.defvjp(_resample_fwd, _resample_bwd)


def resample_all_bones(motion_weights, motion_scale_Rs, motion_Ts,
                       cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                       obs_min, obs_max, grid_size: int,
                       dtype=jnp.bfloat16, blk: int = 512,
                       support_skip: bool = True,
                       windowed: bool = True) -> jnp.ndarray:
    """All-bone obs-grid resample -> (G^3, K) weights.

    Drop-in for the fused_warp per-bone loop: identical forward (it IS the
    einsum forward), Pallas-accelerated backward via custom_vjp.

    The backward always skips point blocks whose incoming cotangent is
    exactly zero (unconditionally exact). With support_skip=True
    (default) it additionally skips (block, bone) pairs whose warped
    trilinear stencil cannot intersect bone k's nonzero-weight support:
    dA/dT contributions there are exactly zero, and the skipped dvols
    entries all land on voxels where motion_weights[k] == 0. In the
    production chain those voxels come from softmax(decoded + log prior)
    with prior == 0, and the softmax VJP multiplies their cotangent by
    the zero output -- so end-to-end parameter gradients are exact. Pass
    support_skip=False when the volume gradient at zero-weight voxels
    must itself be reference-exact (e.g. raw-op gradient tests). The
    per-bone pl.when gating is free on fully-live blocks (measured) and
    kernel time scales ~linearly with live (block, bone) pairs.

    windowed=True (default) runs the support-window kernel (_DW) for
    pairs whose stencil range fits; False forces the full-width legacy
    kernel everywhere (debugging escape hatch, cfg pallas.resample_window).
    Both are exact -- same outputs either way.
    """
    K, D, H, W = motion_weights.shape
    if dtype == jnp.float32:
        # f32 volumes + f32 intermediates double the backward kernel's
        # VMEM footprint (22.3 MB measured at blk 512)
        blk = min(blk, 256)
    vols2d = motion_weights.reshape(K, D, H * W)
    aff = jnp.concatenate(
        [motion_scale_Rs.reshape(K, 9), motion_Ts.reshape(K, 3),
         jnp.zeros((K, 4), jnp.float32)], axis=-1)          # (K, 16)
    step = (obs_max - obs_min) / (grid_size - 1)
    bbox = jnp.concatenate([
        jnp.asarray(cnl_bbox_min_xyz, jnp.float32).reshape(3),
        jnp.asarray(cnl_bbox_scale_xyz, jnp.float32).reshape(3),
        jnp.asarray(obs_min, jnp.float32).reshape(3),
        jnp.asarray(step, jnp.float32).reshape(3),
        jnp.zeros(4, jnp.float32)]).reshape(1, 16)
    dtype_str = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    return _resample_op(vols2d, aff, bbox, grid_size, (D, H, W), dtype_str,
                        blk, bool(support_skip), bool(windowed))
