"""Measure the resample backward kernel's liveness skips at production
shapes (G=48, K=24, blk=512) with realistic bone supports + cotangent
sparsity.

Run on the real chip: python benchmarks/micro_resample.py
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def amort(fn, iters=10):
    float(fn()); float(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    float(out)
    tt = time.perf_counter() - t0
    t0 = time.perf_counter(); float(fn()); t1 = time.perf_counter() - t0
    return max(tt - t1, 1e-9) / (iters - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--blk", type=int, default=512)
    ap.add_argument("--dead", type=float, default=0.5,
                    help="fraction of obs-grid blocks with zero cotangent")
    args = ap.parse_args()

    from humannerf_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from humannerf_tpu.models.mweight import decode_mweight_volume
    from humannerf_tpu.models import mweight as mw
    from humannerf_tpu.ops import pallas_resample as prs
    from __graft_entry__ import _synthetic_inputs
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.models.motion import motion_basis

    G = args.grid
    cfg = make_cfg(opts=["warp.grid_size", str(G)])
    frame, _ = _synthetic_inputs(cfg, n_rays=16)
    params = mw.init_mweight_decoder(
        jax.random.key(0), embedding_size=cfg.mweight_volume.embedding_size,
        volume_size=cfg.mweight_volume.volume_size,
        total_bones=cfg.total_bones)
    vols = decode_mweight_volume(params, frame["motion_weights_priors"],
                                 dtype=jnp.bfloat16)[:-1]
    K, D = vols.shape[0], vols.shape[1]
    scale_Rs, Ts = motion_basis(frame["dst_Rs"], frame["dst_Ts"],
                                frame["cnl_gtfms"])
    sup = np.asarray(vols != 0)
    print(f"# support fraction per bone: mean "
          f"{sup.reshape(K, -1).mean(axis=1).mean():.3f}", flush=True)

    vols2d = vols.reshape(K, D, D * D).astype(jnp.float32)
    aff = jnp.concatenate(
        [scale_Rs.reshape(K, 9), Ts.reshape(K, 3),
         jnp.zeros((K, 4), jnp.float32)], axis=-1)
    margin = cfg.warp.bbox_margin
    obs_min = frame["dst_bbox_min_xyz"] - margin
    obs_max = frame["dst_bbox_max_xyz"] + margin
    step = (obs_max - obs_min) / (G - 1)
    bbox = jnp.concatenate([
        frame["cnl_bbox_min_xyz"], frame["cnl_bbox_scale_xyz"],
        obs_min, step, jnp.zeros(4, jnp.float32)]).reshape(1, 16)

    rng = np.random.RandomState(0)
    nblk = -(-G ** 3 // args.blk)
    # spatially-coherent cotangent deadness: live cotangents cluster
    # around the body (live samples' gather stencils), modeled as a
    # centered ball whose radius hits the requested dead fraction --
    # raster z-slab blocks almost all intersect a centered ball, compact
    # tiles outside it are wholly dead, which is the layout contrast
    # that matters on real frames
    ii = np.arange(G, dtype=np.float32) - (G - 1) / 2
    zz, yy, xx = np.meshgrid(ii, ii, ii, indexing="ij")
    r2 = (xx ** 2 + yy ** 2 + zz ** 2).reshape(-1)
    r_live = np.quantile(r2, 1.0 - args.dead)
    live_pts = r2 <= r_live
    g_sparse = rng.randn(G ** 3, K).astype(np.float32)
    g_sparse[~live_pts] = 0.0
    print(f"# cot-live points: {live_pts.mean():.3f}", flush=True)
    g_sparse = jnp.asarray(g_sparse)
    g_dense = jnp.asarray(rng.randn(G ** 3, K).astype(np.float32))

    # report the mask statistics
    bits = prs._support_mask(vols2d, aff, bbox, nblk, args.blk, G,
                             (D, D, D))
    popcount = np.asarray(
        jnp.sum(jnp.stack([(bits >> k) & 1 for k in range(K)]), axis=0))
    print(f"# support-mask live (block,bone) pairs: "
          f"{popcount.mean() / K:.3f}", flush=True)

    # tiled-layout mask statistics (the shipped default)
    tile = prs._tile_dims(G, args.blk)
    if tile is not None:
        bits_t = prs._support_mask(vols2d, aff, bbox, nblk, args.blk, G,
                                   (D, D, D), tile)
        pc_t = np.asarray(jnp.sum(
            jnp.stack([(bits_t >> k) & 1 for k in range(K)]), axis=0))
        print(f"# tiled {tile} support-mask live (block,bone) pairs: "
              f"{pc_t.mean() / K:.3f}", flush=True)

    def run(gv, support, tiled):
        def f():
            dv, dA, dT = prs._bwd_call(
                vols2d, aff, bbox, gv, G=G, dims=(D, D, D),
                dtype_str="bfloat16", blk=args.blk, support_skip=support,
                interpret=False, tiled=tiled)
            return dv.sum() + dA.sum() + dT.sum()
        return amort(jax.jit(f))

    for tiled in ([False, True] if tile is not None else [False]):
        lay = "tiled " if tiled else "raster"
        print(f"bwd {lay} dense-cot  no-skip : "
              f"{run(g_dense, False, tiled):7.2f} ms", flush=True)
        print(f"bwd {lay} dense-cot  support : "
              f"{run(g_dense, True, tiled):7.2f} ms", flush=True)
        print(f"bwd {lay} {args.dead:.0%}-dead support : "
              f"{run(g_sparse, True, tiled):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
