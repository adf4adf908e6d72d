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


def _lane_masks():
    """Static per-lane selectors for the packed (8-corner x 16-chan) row.

    Lane j holds corner k = j // 16, channel c = j % 16. Corner bit 0/1/2
    selects the +x/+y/+z neighbor (fused_warp packing order). Channel
    c = 3i+d multiplies p_d into output i; c = 9+i is output i's
    translation; c = 12 is the weight sum S. Everything from iota --
    pallas kernels cannot capture array constants.
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    k, c = j // 16, j % 16
    corner = [((k >> b) & 1).astype(jnp.float32) for b in range(3)]
    pd = [((c < 9) & (c % 3 == d)).astype(jnp.float32) for d in range(3)]
    one = ((c >= 9) & (c <= 12)).astype(jnp.float32)
    return corner, pd, one


def _out_selector():
    """(128, 8) static matmul selector: lane j -> output column i.

    c = 3i+d and c = 9+i land on output i (i in 0..2); c = 12 lands on
    output 3 (the weight sum). Columns 4..7 pad to an MXU-friendly width.
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1)
    c = j % 16
    tgt = jnp.where(c < 9, c // 3, jnp.where(c <= 11, c - 9, 3))
    return ((i == tgt) & (c <= 12)).astype(jnp.float32)


def _kernel(G, rows_ref, xp_ref, bbox_ref, out_ref):
    # Lane-dense formulation: every (blk, 1)/(blk, 16) op costs the same
    # vector tiles as a dense (blk, 128) op on TPU, so the math runs as a
    # handful of (blk, 128) ops + one static-selector MXU matmul instead
    # of ~40 lane-padded column ops (which measured ~80 ms at 8.4M
    # samples vs ~6 ms for this form).
    pT = xp_ref[:]                                       # (3, blk) dense
    fds = [(pT[d:d + 1] - bbox_ref[0, d]) * bbox_ref[0, 3 + d]
           for d in range(3)]                            # (1, blk) thin
    wT = [fd - jnp.clip(jnp.floor(fd), 0.0, float(G - 2)) for fd in fds]
    vT = [((fd >= 0.0) & (fd <= float(G - 1))).astype(jnp.float32)
          for fd in fds]
    cols = _unpack_cols(jnp.concatenate([pT] + wT + vT, axis=0))  # (blk,9)
    px, py, pz = (cols[:, d:d + 1] for d in range(3))
    w3 = [cols[:, 3 + d:4 + d] for d in range(3)]        # (blk, 1) each
    valid = cols[:, 6:7] * cols[:, 7:8] * cols[:, 8:9]
    corner, pd, one = _lane_masks()
    # per-lane trilinear weight: prod_d (corner_d ? w_d : 1-w_d)
    w8 = valid
    for d in range(3):
        w8 = w8 * (corner[d] * (2.0 * w3[d] - 1.0) + (1.0 - w3[d]))
    # per-lane affine coefficient: p_d on A-matrix lanes, 1 on t/S lanes
    pcoef = pd[0] * px + pd[1] * py + pd[2] * pz + one
    prod = rows_ref[:].astype(jnp.float32) * (w8 * pcoef)  # (blk, 128)
    out8 = jax.lax.dot_general(
        prod, _out_selector(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (blk, 8)
    S = out8[:, 3:4]
    rcp = 1.0 / jnp.clip(S, 1e-4, None)
    out = jnp.concatenate([out8[:, 0:3] * rcp, S], axis=1)  # (blk, 4)
    out_ref[:] = _pack_cols(out)


def _sched_kernel(G, sched_ref, rows_ref, xp_ref, bbox_ref, out_ref):
    @pl.when(sched_ref[0, pl.program_id(0)] > 0)
    def _():
        _kernel(G, rows_ref, xp_ref, bbox_ref, out_ref)


@functools.partial(jax.jit, static_argnames=("G", "blk", "interpret"))
def _trilerp_call(rows_g, pts_t, bbox, live, *, G, blk, interpret):
    from humannerf_tpu.ops.pallas_mlp import _block_sched
    N = pts_t.shape[1]
    kern = functools.partial(_sched_kernel, G)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda i, s: (s[1, i], 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, blk), lambda i, s: (0, s[1, i]),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 8), lambda i, s: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((4, blk), lambda i, s: (0, s[2, i]),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
        interpret=interpret,
    )(_block_sched(live), rows_g, pts_t, bbox)
    return out


def sample_packed_volume_t(U8: jnp.ndarray, pts_t: jnp.ndarray,
                           obs_min, obs_max, *, blk: int = 2048,
                           live: jnp.ndarray | None = None,
                           interpret: bool | None = None):
    """Transposed-interface twin of fused_warp.sample_packed_volume.

    U8: (G, G, G, 128) packed volume (C = 16, the default train/render
    family); pts_t: (3, N) observation-space points, N % blk == 0.
    live: optional (N,) bool conservative sample liveness known BEFORE
    the gather (ops/liveness.py band test) -- dead samples' gather rows
    collapse to row 0 and dead kernel blocks skip compute + DMA; their
    outputs are exactly (x_skel = 0, fg = 0), which is what the full
    computation produces wherever the conservative band test says dead.
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
    if live is None:
        live_blk = jnp.ones((N // blk,), jnp.int32)
    else:
        live = live.reshape(N)
        flat = jnp.where(live, flat, 0)                   # cache-hot rows
        live_blk = jnp.any(live.reshape(N // blk, blk),
                           axis=1).astype(jnp.int32)
    rows_g = rows[flat]                                   # ONE XLA gather
    bbox = jnp.concatenate([
        jnp.asarray(obs_min, jnp.float32).reshape(3), scale.reshape(3),
        jnp.zeros(2, jnp.float32)]).reshape(1, 8)
    out = _trilerp_call(rows_g, pts_t, bbox, live_blk, G=G, blk=blk,
                        interpret=bool(interpret))
    if live is not None:
        # per-sample mask, not per-block: (a) dead blocks' output slots
        # are never visited (DMA-collapsed; may hold NaN), (b) dead
        # samples inside live blocks computed on the clamped row-0 gather.
        # Both are exactly (0, 0) in the unclamped computation: band-dead
        # means outside every bone's support, so S = 0 there.
        out = jnp.where(live[None, :], out, 0.0)
    return out[:3], out[3:4]
