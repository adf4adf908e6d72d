"""Transposed-layout packed-volume sampling for eval renders.

`sample_packed_volume` (ops/fused_warp.py) is semantically one row gather
plus a little arithmetic, but its (N, 3) sample-major interface makes XLA
materialize every coordinate intermediate in a 42x lane-padded tiling --
measured on v5e at 8.4M samples, the stage costs ~42 ms while the bare row
gather costs ~20 ms (benchmarks/micro_gather.py: 419M rows/s XLA vs 13.8M
rows/s for per-row DMAs inside a Pallas kernel, which rules out moving the
gather itself in-kernel).

This module keeps the gather in XLA -- dense (N,) int32 ids in, (N, 128)
rows out, both layouts XLA-native -- and moves ALL surrounding math into
layouts that waste nothing:

  * fractional coords / voxel ids: computed on the (3, N) lane-dense
    transpose outside the kernel;
  * corner weights, the 8-corner reduction, validity masking, and the
    affine warp x_skel = (B p + c) / clamp(S): a small forward-only
    Pallas kernel over (blk, 128) row blocks, transposing (3, blk) <->
    (blk, 3) on the MXU (the pallas_mlp _pack/_unpack pattern).

Forward-only by design: training uses ops/pallas_scatter.packed_sample_acc
(whose custom_vjp feeds the segment-sum scatter kernel); this path serves
eval renders, which never differentiate. Reference semantics match
core/nets/human_nerf/network.py:407-434 via fused_warp.sample_packed_volume
(parity pinned in tests/test_pallas_trilerp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from humannerf_tpu.ops.pallas_mlp import _pack_cols, _unpack_cols

_HI = jax.lax.Precision.HIGHEST


def _kernel(G, rows_ref, xp_ref, bbox_ref, out_ref):
    p = _unpack_cols(xp_ref[:])                         # (blk, 3) f32
    cols = []
    for d in range(3):
        fd = (p[:, d:d + 1] - bbox_ref[0, d]) * bbox_ref[0, 3 + d]
        i0 = jnp.clip(jnp.floor(fd), 0.0, float(G - 2))
        w = fd - i0
        v = (fd >= 0.0) & (fd <= float(G - 1))
        cols.append((w, v))
    (wx, vx), (wy, vy), (wz, vz) = cols
    valid = (vx & vy & vz).astype(jnp.float32)          # (blk, 1)
    w8 = [(1 - wz) * (1 - wy) * (1 - wx), (1 - wz) * (1 - wy) * wx,
          (1 - wz) * wy * (1 - wx),       (1 - wz) * wy * wx,
          wz * (1 - wy) * (1 - wx),       wz * (1 - wy) * wx,
          wz * wy * (1 - wx),             wz * wy * wx]
    rows = rows_ref[:].astype(jnp.float32)              # (blk, 128)
    acc = w8[0] * rows[:, 0:16]
    for k in range(1, 8):
        acc += w8[k] * rows[:, 16 * k:16 * (k + 1)]     # (blk, 16)
    acc *= valid
    S = jnp.clip(acc[:, 12:13], 1e-4, None)
    xs = []
    for i in range(3):
        xi = (acc[:, 3 * i + 0:3 * i + 1] * p[:, 0:1]
              + acc[:, 3 * i + 1:3 * i + 2] * p[:, 1:2]
              + acc[:, 3 * i + 2:3 * i + 3] * p[:, 2:3]
              + acc[:, 9 + i:10 + i])
        xs.append(xi / S)
    out = jnp.concatenate(xs + [acc[:, 12:13]], axis=1)  # (blk, 4)
    out_ref[:] = _pack_cols(out)


@functools.partial(jax.jit, static_argnames=("G", "blk", "interpret"))
def _trilerp_call(rows_g, pts_t, bbox, *, G, blk, interpret):
    N = pts_t.shape[1]
    kern = functools.partial(_kernel, G)
    return pl.pallas_call(
        kern,
        grid=(N // blk,),
        in_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((4, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
        interpret=interpret,
    )(rows_g, pts_t, bbox)


def sample_packed_volume_t(U8: jnp.ndarray, pts_t: jnp.ndarray,
                           obs_min, obs_max, *, blk: int = 2048,
                           interpret: bool | None = None):
    """Transposed-interface twin of fused_warp.sample_packed_volume.

    U8: (G, G, G, 128) packed volume (C = 16, the default train/render
    family); pts_t: (3, N) observation-space points, N % blk == 0.
    Returns (x_skel_t (3, N) f32, fg (1, N) f32). Forward-only (eval).
    """
    G = U8.shape[0]
    assert U8.shape[-1] == 128, "packed C=16 volumes only"
    N = pts_t.shape[1]
    assert N % blk == 0, (N, blk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = U8.reshape(G * G * G, 128)
    pts_t = pts_t.astype(jnp.float32)
    scale = (G - 1) / (jnp.asarray(obs_max, jnp.float32)
                       - jnp.asarray(obs_min, jnp.float32))
    f = (pts_t - jnp.asarray(obs_min, jnp.float32)[:, None]) \
        * scale[:, None]                                  # (3, N) dense
    i0 = jnp.clip(jnp.floor(f), 0, G - 2).astype(jnp.int32)
    flat = (i0[2] * G + i0[1]) * G + i0[0]                # (N,) dense
    rows_g = rows[flat]                                   # ONE XLA gather
    bbox = jnp.concatenate([
        jnp.asarray(obs_min, jnp.float32).reshape(3), scale.reshape(3),
        jnp.zeros(2, jnp.float32)]).reshape(1, 8)
    out = _trilerp_call(rows_g, pts_t, bbox, G=G, blk=blk,
                        interpret=bool(interpret))
    return out[:3], out[3:4]
