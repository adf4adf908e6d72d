"""Pallas TPU backward kernel for the packed-volume sample gather.

The training step's inverse-LBS lookup gathers one (8*C)-channel row per
sample from the packed fused volume (ops.fused_warp.sample_packed_volume;
reference semantics: core/nets/human_nerf/network.py:407-425). Its
transpose is a (N, 128) -> (G^3, 128) scatter-add at per-sample voxel
ids -- XLA's scatter (an internal sort + serialized update loop) costs
~11 ms at N=786k, G=48 on v5e, every training step.

TPU-native replacement, exploiting two structural facts:

  1. Sorting the voxel keys is nearly free on TPU (~1 ms for 786k i32),
     and with ~57 samples/voxel-row on average, a sorted block of B
     samples touches a SMALL contiguous range of volume rows.
  2. A scatter whose targets fit a window of R rows is a dense matmul:
     build a (B, R) one-hot of (row - window_base) and contract over
     samples on the MXU -- no per-row stores at all.

The kernel keeps the whole gradient volume VMEM-resident in a packed
(G^3/8, 128) f32 layout (8 voxels x C=16 channels per row, ~7 MB at
G=48) across a sequential grid over sorted sample blocks. Each block
processes its samples in a data-dependent number of row-windows (a
while_loop; almost always one window). Per window, per corner, one
(R, B) @ (B, 128) MXU contraction accumulates into the volume at a
dynamic row offset.

Because all 8 trilinear corner offsets {dz*G^2 + dy*G + dx} are congruent
to 0 or 1 mod 8 when G % 8 == 0, a corner's contribution lands at packed
row floor(flat/8) + {0, G/8, G^2/8, (G^2+G)/8} (+1 carry for dx=1 when
flat % 8 == 7) and lane group (flat % 8) or (flat % 8 + 1) % 8 -- so two
one-hot matrices (even/odd dx) and lane-group masks cover all corners.

The custom_vjp wraps pack+gather+einsum in one op, so the backward also
eliminates XLA's 8-way shifted unpack-add (build_packed_volume's
transpose) and the gather recompute under remat (gathered rows are stored
as a residual: re-gathering is latency-bound, storing is bandwidth-bound).
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


def _scatter_kernel(G, R, dtype, flat_ref, dacc_ref, w8_ref, acc_ref):
    """One sorted sample block -> windowed one-hot MXU scatter."""
    B = flat_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    flat = flat_ref[:]                                   # (B, 1) i32
    r0 = flat // 8
    gx0 = flat % 8
    carry = (gx0 == 7).astype(jnp.int32)
    dacc = dacc_ref[:]                                   # (B, 16) f32
    w8 = w8_ref[:]                                       # (B, 8) f32

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    group = lane // 16
    dacc_t = jnp.concatenate([dacc] * 8, axis=1)         # (B, 128)
    p_even = jnp.where(group == gx0, dacc_t, 0.0)
    p_odd = jnp.where(group == (gx0 + 1) % 8, dacc_t, 0.0)

    cols = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
    rows_delta = (0, G // 8, G * G // 8, (G * G + G) // 8)

    def window(state):
        c, _ = state
        done = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) < c
        base = jnp.min(jnp.where(done, jnp.int32(2 ** 30), r0))
        off = r0 - base
        # off == R-1 with carry would push the odd one-hot out of range:
        # the window advances through off <= R-2 only
        active = jnp.logical_and(off >= 0, off <= R - 2)
        oh_e = jnp.logical_and(cols == off, active).astype(dtype)
        oh_c = jnp.logical_and(cols == off + carry, active).astype(dtype)
        for dx, (oh, pay) in enumerate(((oh_e, p_even), (oh_c, p_odd))):
            for j, dr in enumerate(rows_delta):
                k = 2 * j + dx
                pk = (w8[:, k:k + 1] * pay).astype(dtype)
                tile = jax.lax.dot_general(
                    oh, pk, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (R, 128)
                start = base + dr
                acc_ref[pl.ds(start, R), :] += tile
        return c + jnp.sum(active.astype(jnp.int32)), base

    jax.lax.while_loop(lambda s: s[0] < B, window, (jnp.int32(0),
                                                    jnp.int32(0)))


def _pad_rows(G, R):
    # base <= G^3/8 - 1; farthest write start+R = base + (G^2+G)/8 + R
    n = G * G * G // 8 + (G * G + G) // 8 + R
    return -(-n // 8) * 8


@functools.partial(jax.jit,
                   static_argnames=("G", "dtype_str", "blk", "R",
                                    "interpret"))
def _scatter_call(flat_s, dacc_s, w8_s, *, G, dtype_str, blk, R, interpret):
    n = flat_s.shape[0]
    npad = -(-n // blk) * blk
    if npad != n:
        # pad with the max key (stays in-range) and zero payloads
        flat_s = jnp.concatenate(
            [flat_s, jnp.broadcast_to(flat_s[-1:], (npad - n,))])
        dacc_s = jnp.concatenate(
            [dacc_s, jnp.zeros((npad - n, 16), dacc_s.dtype)])
        w8_s = jnp.concatenate(
            [w8_s, jnp.zeros((npad - n, 8), w8_s.dtype)])
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    rows = _pad_rows(G, R)
    kern = functools.partial(_scatter_kernel, G, R, dtype)
    acc = pl.pallas_call(
        kern, grid=(npad // blk,),
        in_specs=[pl.BlockSpec((blk, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((blk, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((blk, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )(flat_s.reshape(npad, 1), dacc_s, w8_s)
    return acc[:G * G * G // 8]


def scatter_grad_volume(flat, dacc, w8, *, grid_size, dtype=jnp.bfloat16,
                        blk=1024, window=256, interpret=False):
    """d(U) (G, G, G, 16) from per-sample cotangents.

    flat: (N,) i32 base-corner voxel ids; dacc: (N, 16) f32 cotangent of
    the interpolated row (already masked by validity); w8: (N, 8) f32
    trilinear corner weights.
    """
    G = grid_size
    assert G % 8 == 0, G
    order = jax.lax.sort(
        [flat] + [dacc[:, i] for i in range(16)]
        + [w8[:, i] for i in range(8)], num_keys=1)
    flat_s = order[0]
    dacc_s = jnp.stack(order[1:17], axis=1)
    w8_s = jnp.stack(order[17:25], axis=1)
    dtype_str = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    acc = _scatter_call(flat_s, dacc_s, w8_s, G=G, dtype_str=dtype_str,
                        blk=blk, R=window, interpret=interpret)
    return acc.reshape(G * G * G, 16).reshape(G, G, G, 16)


# -- the fused pack+gather+einsum op with the Pallas transpose -------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def packed_sample_acc(U, pts, obs_min, obs_max, dtype_str, blk, window):
    """acc (N, 16) = trilinear read of the packed fused volume.

    Forward == build_packed_volume + sample_packed_volume's gather/einsum
    (ops/fused_warp.py:162-226); backward scatters d(U) with the Pallas
    kernel above instead of XLA's scatter-add, and skips the 8-way
    unpack-add entirely by accumulating the UNPACKED volume cotangent.
    """
    acc, _ = _fwd_impl(U, pts, obs_min, obs_max)
    return acc


def _fwd_impl(U, pts, obs_min, obs_max):
    from humannerf_tpu.ops.fused_warp import build_packed_volume
    G = U.shape[0]
    U8 = build_packed_volume(U)
    rows = U8.reshape(G * G * G, 8 * U.shape[-1])
    flat, (wx, wy, wz), valid, scale = _fractional(pts, obs_min, obs_max, G)
    g = rows[flat]                                        # (N, 128) 1 gather
    w8 = _corner_weights(wx, wy, wz)
    gc = g.reshape(-1, 8, 16).astype(jnp.float32)
    acc = jnp.einsum("nkc,nk->nc", gc, w8, precision=_HI)
    acc = jnp.where(valid[:, None], acc, 0.0)
    return acc, (g, flat, wx, wy, wz, valid, scale)


def _psa_fwd(U, pts, obs_min, obs_max, dtype_str, blk, window):
    acc, res = _fwd_impl(U, pts, obs_min, obs_max)
    return acc, res + (U.shape[0],)


def _psa_bwd(dtype_str, blk, window, res, d_acc):
    g, flat, wx, wy, wz, valid, scale, G = res
    d_accm = jnp.where(valid[:, None], d_acc, 0.0).astype(jnp.float32)
    w8 = _corner_weights(wx, wy, wz)
    interpret = jax.default_backend() != "tpu"
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    dU = scatter_grad_volume(flat, d_accm, w8, grid_size=G, dtype=dtype,
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
    # bounding boxes are data-derived (non-trainable): zero grad
    return (dU, d_pts.astype(jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32))


packed_sample_acc.defvjp(_psa_fwd, _psa_bwd)


def sample_packed_grad(U, pts, obs_min, obs_max, *, dtype=jnp.bfloat16,
                       blk=1024, window=256):
    """Drop-in for pack+sample on the C=16 training path.

    Returns (x_skel, fg, None) like sample_packed_volume with a plain
    (non-bone-weight) volume.
    """
    dtype_str = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    acc = packed_sample_acc(U, pts, obs_min, obs_max, dtype_str, blk,
                            window)
    B = acc[:, :9].reshape(-1, 3, 3)
    c = acc[:, 9:12]
    S = acc[:, 12:13]
    x_skel = (jnp.einsum("nij,nj->ni", B, pts, precision=_HI) + c) \
        / jnp.clip(S, 1e-4)
    return x_skel, S, None
