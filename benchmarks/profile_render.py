"""Decompose the eval render: where do the ~181 ms of a 64K-ray block go?

The bench headline (bench.py:54-77) renders one 64K-ray x 128-sample block
(8.39M samples) through `render_rays`. The fused MLP kernel's marginal
throughput is ~160M samples/s, but end-to-end render is ~46M -- this probe
times each stage in isolation at the exact bench shapes to find the other
~2/3 (VERDICT r2 weak #8 / next #8).

Stages (all jitted separately, amortized over the axon tunnel like
bench.py's `_amortized_time`):
  full          render_rays end-to-end (the headline)
  full+pcomp    same with pallas.composite=True
  prepare       prepare_frame only (volume build; amortized once per frame)
  gather        sample_packed_volume on the block's points
  mlp           fused Pallas MLP on a precomputed x_skel
  composite     raw2outputs on precomputed raws
  zpts          z sampling + point generation

Run on the real chip: `python benchmarks/profile_render.py [--rays 65536]`.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def amort(fn, iters=12):
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
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from humannerf_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp

    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.models.network import HumanNeRF
    from humannerf_tpu.ops.fused_warp import sample_packed_volume
    from humannerf_tpu.ops.raymarch import (raw2outputs, sample_along_rays)
    from __graft_entry__ import _synthetic_inputs

    R, S = args.rays, args.samples
    M = R * S / 1e6
    cfg = make_cfg(opts=["N_samples", str(S), "dtype", args.dtype])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    frame, rays = _synthetic_inputs(cfg, n_rays=R)
    iv = jnp.asarray(1e7)

    def report(name, ms):
        print(f"{name:>14}: {ms:8.2f} ms  ({M / (ms / 1e3):6.1f} M samp/s)",
              flush=True)

    # full end-to-end
    @jax.jit
    def full(p, f, r):
        return net.render_rays(p, f, r, iv)["rgb"].sum()
    ms_full = amort(lambda: full(params, frame, rays))
    report("full", ms_full)

    # empty-space-skip ablation: off / on-unordered / on+reorder
    def full_variant(name, *opts):
        cfgv = make_cfg(opts=["N_samples", str(S), "dtype", args.dtype,
                              *opts])
        netv = HumanNeRF(cfgv)

        @jax.jit
        def f(p, fr, r):
            return netv.render_rays(p, fr, r, iv)["rgb"].sum()
        report(name, amort(lambda: f(params, frame, rays)))

    full_variant("full-noband", "pallas.analytic_bands", "False")
    full_variant("full-noskip", "pallas.skip_empty", "False")
    # z-major (sample, ray) layout + ray sort are the defaults; ablate both
    full_variant("full-nosort", "pallas.skip_sort_rays", "False")
    full_variant("full-zoff", "pallas.skip_zmajor", "False")
    # default is reorder-off at eval ("train" tri-state): measure the cost
    # the partition would add to a forward-only render
    full_variant("full+reord", "pallas.skip_reorder", "True")

    # with the Pallas compositor
    cfg2 = make_cfg(opts=["N_samples", str(S), "dtype", args.dtype,
                          "pallas.composite", "True"])
    net2 = HumanNeRF(cfg2)

    @jax.jit
    def full_pc(p, f, r):
        return net2.render_rays(p, f, r, iv)["rgb"].sum()
    report("full+pcomp", amort(lambda: full_pc(params, frame, rays)))

    # prepare_frame alone
    @jax.jit
    def prep(p, f):
        ctx = net.prepare_frame(p, f, iv)
        return sum(jnp.sum(v) for v in ctx.values()
                   if isinstance(v, jnp.ndarray)
                   and jnp.issubdtype(v.dtype, jnp.floating))
    ms_prep = amort(lambda: prep(params, frame))
    report("prepare", ms_prep)

    # stage inputs: ctx + points, computed once
    ctx = jax.jit(lambda p, f: net.prepare_frame(p, f, iv))(params, frame)
    ctx = jax.tree.map(lambda x: x, ctx)
    z_vals = sample_along_rays(rays["near"], rays["far"], S)
    pts = (rays["rays_o"][:, None, :]
           + rays["rays_d"][:, None, :] * z_vals[..., None])
    pts_flat = jnp.asarray(pts.reshape(-1, 3))

    # z sampling + points
    @jax.jit
    def zpts(r):
        z = sample_along_rays(r["near"], r["far"], S)
        p = r["rays_o"][:, None, :] + r["rays_d"][:, None, :] * z[..., None]
        return p.sum()
    report("zpts", amort(lambda: zpts(rays)))

    # packed-volume gather
    key = ("packed_volume" if "packed_volume" in ctx else
           "scatter_U" if "scatter_U" in ctx else "fused_volume")
    print(f"# volume key in ctx: {key}", flush=True)
    vol = ctx.get("packed_volume", ctx.get("scatter_U",
                                           ctx.get("fused_volume")))

    @jax.jit
    def gather(v, p):
        x, fgm, bw = sample_packed_volume(v, p, ctx["obs_min"],
                                          ctx["obs_max"])
        return x.sum() + fgm.sum()
    ms_gather = amort(lambda: gather(vol, pts_flat))
    report("gather", ms_gather)

    x_skel, fg, _ = jax.jit(lambda v, p: sample_packed_volume(
        v, p, ctx["obs_min"], ctx["obs_max"]))(vol, pts_flat)
    fg_np = np.asarray(fg).reshape(-1).astype(np.float32)
    occ = float((fg_np > 0).mean())
    print(f"# fg occupancy: {occ:.3f} of samples are non-empty "
          f"(empty-space-skip headroom {1/max(occ,1e-3):.1f}x)", flush=True)
    # block-level coherence: fraction of fully-empty fwd blocks decides
    # in-kernel @pl.when skip (needs coherence) vs compaction (doesn't)
    for blk in (512, 1024, 2048):
        nb = fg_np.size // blk
        bmax = fg_np[:nb * blk].reshape(nb, blk).max(axis=1)
        print(f"# fully-empty {blk}-sample blocks: "
              f"{float((bmax == 0).mean()):.3f}", flush=True)

    # fused MLP on precomputed x_skel
    plan = net.pallas_mlp_plans[0]
    if plan is not None:
        from humannerf_tpu.ops import pallas_mlp
        sub = {k: params[k] for k in ("non_rigid_mlp", "cnl_mlp")
               if k in params}
        cc = ctx["condition_code"]

        @jax.jit
        def mlp(x, p, c):
            return pallas_mlp.query_points_fused(
                plan, p, x, ctx["hann_alpha"], c, blk_fwd=2048,
                blk_bwd=512).sum()
        ms_mlp = amort(lambda: mlp(x_skel, sub, cc))
        report("mlp", ms_mlp)

        # the shipped fast path: ray-sorted z-major + per-block liveness
        # through the transposed kernel entry
        @jax.jit
        def mlp_skip(x, p, c, f):
            fg_rs = f.reshape(R, S)
            order, inv = pallas_mlp.ray_sort_order(fg_rs)
            x3 = pallas_mlp.permute_cols3(
                x.astype(jnp.float32).T.reshape(3, R, S), order, inv)
            xp = x3.transpose(0, 2, 1).reshape(3, R * S)
            fgz = fg_rs[order].T.reshape(-1)
            lf = (fgz.reshape(-1, 2048).max(axis=1) > 0).astype(jnp.int32)
            lb = (fgz.reshape(-1, 512).max(axis=1) > 0).astype(jnp.int32)
            return pallas_mlp.query_points_fused_t(
                plan, p, xp, ctx["hann_alpha"], c, lf, lb, 2048, 512).sum()
        report("mlp+skip", amort(lambda: mlp_skip(x_skel, sub, cc,
                                                  fg.reshape(-1))))
    else:
        ms_mlp = float("nan")
        print("# no pallas MLP plan for this config", flush=True)

    # compositing on precomputed raws
    raw = jax.random.normal(jax.random.key(2), (R, S, 4),
                            net.compute_dtype)

    @jax.jit
    def comp(rw, fgm, z):
        out = raw2outputs(rw, fgm.reshape(R, S, 1), z, rays["rays_d"],
                          jnp.zeros(3, jnp.float32))
        return out["rgb"].sum()
    ms_comp = amort(lambda: comp(raw, fg, z_vals))
    report("composite", ms_comp)

    from humannerf_tpu.ops.pallas_composite import composite_pallas

    @jax.jit
    def comp_pl(rw, fgm, z):
        out = composite_pallas(rw, fgm.reshape(R, S, 1), z,
                               rays["rays_d"], jnp.zeros(3, jnp.float32),
                               block=1024)
        return out["rgb"].sum()
    report("composite_pl", amort(lambda: comp_pl(raw, fg, z_vals)))

    acc = ms_prep + ms_gather + ms_mlp + ms_comp
    print(f"# sum(prep+gather+mlp+comp) = {acc:.2f} ms "
          f"vs full {ms_full:.2f} ms -> unaccounted "
          f"{ms_full - acc:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
