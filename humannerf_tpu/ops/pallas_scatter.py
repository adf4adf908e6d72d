"""Pallas TPU backward kernel for the packed-volume sample gather.

The training step's inverse-LBS lookup gathers one (8*C)-channel row per
sample from the packed fused volume (ops.fused_warp.sample_packed_volume;
reference semantics: core/nets/human_nerf/network.py:407-425). Its
transpose is an (N, 128) -> (G^3, 128) scatter-add at per-sample voxel
ids -- XLA's scatter (an internal sort + serialized update loop) costs
~11 ms at N=786k, G=48 on v5e, every training step.

TPU-native replacement -- a blocked segment-sum on the MXU:

  1. Sort the voxel keys with their (w8, dacc) payload columns (bf16
     payloads bitcast-packed into u32 pairs to halve the sort width).
  2. Tile the G^3 output rows into windows of R rows. Because the keys
     are sorted, a block of B consecutive samples touches few windows:
     the total number of (sample-block, window) SLOTS is provably
     <= n_blocks + n_windows (spans telescope across sorted blocks), so
     the slot list is a STATIC-shape array built with cumsum/searchsorted.
  3. The kernel runs one grid step per slot (scalar-prefetched block and
     window indices drive the in/out index maps -- the body is straight
     line, no data-dependent control flow): build a (B, R) one-hot of
     (row - window_base), masked to the window, and contract it against
     the (B, 128) per-sample payload rows on the MXU, accumulating into
     the window's (R, 128) out block. Window indices are nondecreasing,
     so out-block revisits are always consecutive (the supported Pallas
     accumulation pattern: zero-init on first visit, += after).

The kernel scatters into the PACKED volume cotangent d(U8); the 8-way
shifted unpack-add back to d(U) is XLA's transpose of
build_packed_volume (~1 ms, jax.vjp of a linear function).

The custom_vjp wraps pack+gather+einsum in one op; gathered rows are
stored as a residual (re-gathering under remat is latency-bound, storing
is bandwidth-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _fractional(pts, obs_min, obs_max, G):
    """Shared fwd/bwd coordinate math; matches sample_packed_volume."""
    scale = (G - 1) / (obs_max - obs_min)
    f = (pts - obs_min) * scale

    def axis(fr):
        i0 = jnp.clip(jnp.floor(fr), 0, G - 2)
        return (i0.astype(jnp.int32), fr - i0, (fr >= 0) & (fr <= G - 1))

    x0, wx, vx = axis(f[:, 0])
    y0, wy, vy = axis(f[:, 1])
    z0, wz, vz = axis(f[:, 2])
    flat = (z0 * G + y0) * G + x0
    valid = vx & vy & vz
    return flat, (wx, wy, wz), valid, scale


def _corner_weights(wx, wy, wz):
    return jnp.stack([
        (1 - wz) * (1 - wy) * (1 - wx), (1 - wz) * (1 - wy) * wx,
        (1 - wz) * wy * (1 - wx),       (1 - wz) * wy * wx,
        wz * (1 - wy) * (1 - wx),       wz * (1 - wy) * wx,
        wz * wy * (1 - wx),             wz * wy * wx], axis=1)


def _slot_kernel(R, dtype, C, s_ref, flat_ref, dw_ref, out_ref):
    """One (sample-block, window) slot -> masked one-hot MXU scatter.

    Slot rows: [input block, window, valid, first_visit, compute]. The
    zero-init on a window's first visit runs unconditionally (cheap, reads
    nothing); the one-hot contraction is gated on `compute`, which is off
    for padding slots AND for sample blocks whose every key is the
    out-of-range sentinel G^3-1 (scatter_grad_volume's padding / the
    band-dead tail) -- their input DMAs are also collapsed onto block 0
    by _build_slots.

    dw_ref (B, C + 8) carries the sorted per-sample cotangent row (C
    lanes) and the 8 trilinear corner weights; the (B, 8*C) payload rows
    are built in VMEM (corner k's product lands at lanes [k*C:(k+1)*C]).
    Building in-kernel instead of XLA removes a (N, 8*C) HBM
    materialization + per-slot fetch (~4x the DMA bytes at C=16).
    """
    B = flat_ref.shape[0]
    j = pl.program_id(0)

    @pl.when(s_ref[3, j] == 1)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(s_ref[4, j] == 1)
    def _acc():
        w = s_ref[1, j]
        off = flat_ref[:] - w * R                        # (B, 1) i32
        act = jnp.logical_and(off >= 0, off < R)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
        oh = jnp.logical_and(cols == off, act).astype(dtype)
        d32 = dw_ref[:, :C].astype(jnp.float32)          # (B, C)
        p = jnp.concatenate(
            [(dw_ref[:, C + k:C + k + 1].astype(jnp.float32) * d32)
             .astype(dtype) for k in range(8)], axis=1)  # (B, 8*C)
        out_ref[:] += jax.lax.dot_general(
            oh, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, 8*C)


def _build_slots(flat_s, nb, blk, R, n_win, M, G3):
    """Static-shape (5, M) slot table [block, window, valid, first_visit,
    compute] plus the per-window visited mask (unvisited out blocks hold
    garbage and are zeroed by the caller).

    Keys equal to the sentinel G3-1 never come from in-range samples (the
    base corner is clipped to G-2 per axis, so the max real key is
    (G-2)(G^2+G+1) < G3-1): they are padding rows or band-dead samples.
    Sorted, they form a strict tail; sample blocks made only of sentinel
    keys get compute=0 (the kernel skips their one-hot matmul) and their
    input DMA collapses onto block 0 -- the contiguous dead tail then
    costs ~one input fetch total (Mosaic's block-revisit optimization),
    mirroring pallas_mlp._block_sched."""
    rb = flat_s.reshape(nb, blk)
    fw = rb[:, 0] // R                                   # (nb,)
    lw = rb[:, -1] // R
    blk_live = rb[:, 0] < G3 - 1                         # sorted: min first
    nwin = lw - fw + 1
    c = jnp.concatenate([jnp.zeros(1, nwin.dtype),
                         jnp.cumsum(nwin)[:-1]])         # exclusive cumsum
    j = jnp.arange(M, dtype=jnp.int32)
    b_of = jnp.clip(jnp.searchsorted(c, j, side="right") - 1, 0, nb - 1) \
        .astype(jnp.int32)
    rel = j - c[b_of]
    valid = rel < nwin[b_of]
    w_of = jnp.clip(fw[b_of] + rel, 0, n_win - 1).astype(jnp.int32)
    first = jnp.concatenate(
        [jnp.ones(1, bool), w_of[1:] != w_of[:-1]])
    compute = valid & blk_live[b_of]
    b_in = jnp.where(compute, b_of, 0)
    slots = jnp.stack([b_in, w_of, valid.astype(jnp.int32),
                       first.astype(jnp.int32),
                       compute.astype(jnp.int32)], axis=0)
    vis = jnp.zeros((n_win,), jnp.float32).at[w_of].max(
        valid.astype(jnp.float32))
    return slots, vis


@functools.partial(jax.jit,
                   static_argnames=("G", "dtype_str", "blk", "R",
                                    "interpret"))
def _scatter_call(flat_s, dw_s, *, G, dtype_str, blk, R, interpret):
    """Sorted keys (npad,) + (cotangent | corner-weight) rows (npad, C+8)
    -> d(U8) (G^3, 8*C). Payload rows are built in-kernel."""
    npad = flat_s.shape[0]
    C = dw_s.shape[1] - 8
    nb = npad // blk
    G3 = G * G * G
    n_win = -(-G3 // R)
    M = nb + n_win
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    slots, vis = _build_slots(flat_s, nb, blk, R, n_win, M, G3)
    kern = functools.partial(_slot_kernel, R, dtype, C)
    acc = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M,),
            in_specs=[pl.BlockSpec((blk, 1), lambda j, s: (s[0, j], 0)),
                      pl.BlockSpec((blk, C + 8),
                                   lambda j, s: (s[0, j], 0))],
            out_specs=pl.BlockSpec((R, 8 * C), lambda j, s: (s[1, j], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_win * R, 8 * C), jnp.float32),
        interpret=interpret,
    )(slots, flat_s.reshape(npad, 1), dw_s)
    # unvisited out blocks hold uninitialized garbage (can be NaN/Inf):
    # select, don't multiply
    acc = jnp.where(vis[:, None, None] > 0, acc.reshape(n_win, R, 8 * C),
                    0.0).reshape(n_win * R, 8 * C)
    return acc[:G3]


def _pack_u32(x):
    """(N, 2k) f32 -> (N, k) u32 of bf16 pairs: halves the sort width."""
    n, c = x.shape
    xb = x.astype(jnp.bfloat16).reshape(n, c // 2, 2)
    return jax.lax.bitcast_convert_type(xb, jnp.uint32)


def scatter_grad_volume(flat, dacc, w8, *, grid_size, dtype=jnp.bfloat16,
                        blk=1024, window=256, interpret=False):
    """d(U) (G, G, G, 16) from per-sample cotangents.

    flat: (N,) i32 base-corner voxel ids; dacc: (N, 16) f32 cotangent of
    the interpolated row (already masked by validity); w8: (N, 8) f32
    trilinear corner weights.
    """
    G = grid_size
    n = flat.shape[0]
    npad = -(-n // blk) * blk
    if npad != n:
        # pad with the max in-range key and zero payloads
        flat = jnp.concatenate(
            [flat, jnp.full((npad - n,), G * G * G - 1, flat.dtype)])
        dacc = jnp.concatenate(
            [dacc, jnp.zeros((npad - n, 16), dacc.dtype)])
        w8 = jnp.concatenate([w8, jnp.zeros((npad - n, 8), w8.dtype)])
    if dtype == jnp.bfloat16:
        cols = ([_pack_u32(dacc)[:, i] for i in range(8)]
                + [_pack_u32(w8)[:, i] for i in range(4)])
        order = jax.lax.sort([flat] + cols, num_keys=1)
        flat_s = order[0]
        # post-sort, debitcast the u32 pair columns straight into one
        # (npad, 24) = (cotangent | corner weights) row array; the
        # (npad, 128) payload rows themselves are built INSIDE the
        # scatter kernel (corner k's product lands at channels
        # [k*16:(k+1)*16], one VPU pass per slot), saving their HBM
        # materialization + per-slot fetch (~4x the DMA bytes)
        dw_s = jnp.concatenate(
            [jax.lax.bitcast_convert_type(c, jnp.bfloat16)
             for c in order[1:13]], axis=1)                # (npad, 24) bf16
    else:
        order = jax.lax.sort(
            [flat] + [dacc[:, i] for i in range(16)]
            + [w8[:, i] for i in range(8)], num_keys=1)
        flat_s = order[0]
        dw_s = jnp.stack(order[1:25], axis=1)              # (npad, 24) f32
    dtype_str = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    dU8 = _scatter_call(flat_s, dw_s, G=G, dtype_str=dtype_str,
                        blk=blk, R=window, interpret=interpret)
    # transpose of build_packed_volume's 8-way shifted edge-replicated
    # concat (a linear map): d(U8) -> d(U)
    from humannerf_tpu.ops.fused_warp import build_packed_volume
    _, pack_vjp = jax.vjp(build_packed_volume,
                          jnp.zeros((G, G, G, 16), jnp.float32))
    return pack_vjp(dU8.reshape(G, G, G, 128))[0]


# -- the fused pack+gather+einsum op with the Pallas transpose -------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def packed_sample_acc(U, pts, obs_min, obs_max, live, dtype_str, blk,
                      window):
    """acc (N, 16) = trilinear read of the packed fused volume.

    Forward == build_packed_volume + sample_packed_volume's gather/einsum
    (ops/fused_warp.py:162-226); backward scatters d(U8) with the Pallas
    kernel above instead of XLA's scatter-add.

    live: (N,) f32 conservative liveness mask (1 live / 0 dead; pass ones
    when unknown). Dead samples clamp their gather row to the shared row 0
    (cache-hot) and output exactly 0 -- exact when liveness is the
    ops/liveness.py band guarantee (dead => every packed channel is 0).
    The forward `where` makes their cotangents exactly 0 by construction,
    so the backward sorts them onto the sentinel key G^3-1, where whole
    dead sample blocks skip the scatter kernel's matmul and DMAs.
    """
    acc, _ = _fwd_impl(U, pts, obs_min, obs_max, live)
    return acc


def _fwd_impl(U, pts, obs_min, obs_max, live):
    from humannerf_tpu.ops.fused_warp import build_packed_volume
    G = U.shape[0]
    U8 = build_packed_volume(U)
    rows = U8.reshape(G * G * G, 8 * U.shape[-1])
    flat, (wx, wy, wz), valid, scale = _fractional(pts, obs_min, obs_max, G)
    lv = live > 0
    valid = valid & lv
    flat = jnp.where(lv, flat, 0)                         # cache-hot rows
    g = rows[flat]                                        # (N, 128) 1 gather
    w8 = _corner_weights(wx, wy, wz)
    gc = g.reshape(-1, 8, 16).astype(jnp.float32)
    acc = jnp.einsum("nkc,nk->nc", gc, w8, precision=_HI)
    acc = jnp.where(valid[:, None], acc, 0.0)
    return acc, (g, flat, wx, wy, wz, valid, lv, scale)


def _psa_fwd(U, pts, obs_min, obs_max, live, dtype_str, blk, window):
    acc, res = _fwd_impl(U, pts, obs_min, obs_max, live)
    return acc, res + (U.shape[0],)


def _psa_bwd(dtype_str, blk, window, res, d_acc):
    g, flat, wx, wy, wz, valid, lv, scale, G = res
    d_accm = jnp.where(valid[:, None], d_acc, 0.0).astype(jnp.float32)
    w8 = _corner_weights(wx, wy, wz)
    interpret = jax.default_backend() != "tpu"
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    # dead samples' payloads are exactly 0 (d_accm is masked by valid,
    # which folds in liveness); remapping their keys to the sentinel
    # G^3-1 sorts them into the skippable tail next to the padding
    flat_b = jnp.where(lv, flat, G * G * G - 1)
    dU = scatter_grad_volume(flat_b, d_accm, w8, grid_size=G, dtype=dtype,
                             blk=blk, window=window, interpret=interpret)
    # d(pts): through the corner weights only (floor/clip have zero grad)
    gc = g.reshape(-1, 8, 16).astype(jnp.float32)
    d_w8 = jnp.einsum("nkc,nc->nk", gc, d_accm, precision=_HI)   # (N, 8)
    iz = jnp.array([0, 0, 0, 0, 1, 1, 1, 1], jnp.float32)
    iy = jnp.array([0, 0, 1, 1, 0, 0, 1, 1], jnp.float32)
    ix = jnp.array([0, 1, 0, 1, 0, 1, 0, 1], jnp.float32)
    # d w8_k / d w_axis = +-(product of the other two axis factors)
    fx0, fx1 = 1.0 - wx, wx
    fy0, fy1 = 1.0 - wy, wy
    fz0, fz1 = 1.0 - wz, wz
    fzy = jnp.stack([fz0 * fy0, fz0 * fy0, fz0 * fy1, fz0 * fy1,
                     fz1 * fy0, fz1 * fy0, fz1 * fy1, fz1 * fy1], axis=1)
    fzx = jnp.stack([fz0 * fx0, fz0 * fx1, fz0 * fx0, fz0 * fx1,
                     fz1 * fx0, fz1 * fx1, fz1 * fx0, fz1 * fx1], axis=1)
    fyx = jnp.stack([fy0 * fx0, fy0 * fx1, fy1 * fx0, fy1 * fx1,
                     fy0 * fx0, fy0 * fx1, fy1 * fx0, fy1 * fx1], axis=1)
    sx = jnp.where(ix[None, :] > 0, 1.0, -1.0)
    sy = jnp.where(iy[None, :] > 0, 1.0, -1.0)
    sz = jnp.where(iz[None, :] > 0, 1.0, -1.0)
    d_wx = jnp.sum(d_w8 * fzy * sx, axis=1)
    d_wy = jnp.sum(d_w8 * fzx * sy, axis=1)
    d_wz = jnp.sum(d_w8 * fyx * sz, axis=1)
    d_pts = jnp.stack([d_wx, d_wy, d_wz], axis=1) * scale[None, :]
    # bounding boxes are data-derived (non-trainable): zero grad; the
    # liveness mask is a non-trainable gate
    return (dU, d_pts.astype(jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.zeros(flat.shape, jnp.float32))


packed_sample_acc.defvjp(_psa_fwd, _psa_bwd)


def sample_packed_grad(U, pts, obs_min, obs_max, *, dtype=jnp.bfloat16,
                       blk=1024, window=256, live=None):
    """Drop-in for pack+sample on the C=16 training path.

    Returns (x_skel, fg, None) like sample_packed_volume with a plain
    (non-bone-weight) volume. live: optional (N,) bool/f32 conservative
    sample liveness (ops/liveness.py bands) -- see packed_sample_acc.
    """
    dtype_str = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    if live is None:
        live = jnp.ones(pts.shape[:1], jnp.float32)
    else:
        live = jax.lax.stop_gradient(live).astype(jnp.float32)
    acc = packed_sample_acc(U, pts, obs_min, obs_max, live, dtype_str, blk,
                            window)
    B = acc[:, :9].reshape(-1, 3, 3)
    c = acc[:, 9:12]
    S = acc[:, 12:13]
    x_skel = (jnp.einsum("nij,nj->ni", B, pts, precision=_HI) + c) \
        / jnp.clip(S, 1e-4)
    return x_skel, S, None
