"""Fused Pallas MLP kernel vs jnp path, on the real chip.

Times the raw point-query stack (embed -> non-rigid MLP -> embed ->
canonical MLP) both ways, forward and forward+backward.

Usage: python benchmarks/bench_pallas_mlp.py [--n 1048576] [--dtype bfloat16]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def median_time(fn, iters=10, warmup=2):
    """Amortized per-call time (bench._amortized_time: K async dispatches +
    one fetch, minus the ~30 ms axon sync). fn returns a device array."""
    from bench import _amortized_time
    return _amortized_time(fn, max(iters, 2), warmup)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--blk", type=int, default=1024)
    ap.add_argument("--blk-bwd", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from humannerf_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from humannerf_tpu.models import mlps
    from humannerf_tpu.models.embedders import (fourier_embed,
                                                hannw_fourier_embed)
    from humannerf_tpu.ops import pallas_mlp

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    NR_E, CNL_M = 36, 10
    key = jax.random.key(0)
    nr = mlps.init_nonrigid_mlp(key, pos_embed_size=NR_E,
                                condition_code_size=69)
    cnl = mlps.init_canonical_mlp(jax.random.key(1), input_ch=63)
    params = {"non_rigid_mlp": nr, "cnl_mlp": cnl}
    plan = pallas_mlp.Plan(
        nr_depth=6, nr_skips=(4,), nr_width=128, nr_multires=6,
        cnl_depth=8, cnl_skips=(4,), cnl_width=256, cnl_multires=CNL_M,
        skip_nr=False, compute_dtype=dt)
    pallas_mlp.register_plan(plan)

    N = args.n
    x = jax.random.normal(jax.random.key(2), (N, 3)) * 0.5
    cc = jax.random.normal(jax.random.key(3), (69,)) * 0.1
    alpha = jnp.asarray(4.3)

    @jax.jit
    def fwd_fused(p, x, cc):
        return jnp.sum(pallas_mlp.query_points_fused(
            plan, p, x, alpha, cc, blk_fwd=args.blk, blk_bwd=args.blk_bwd))

    @jax.jit
    def fwd_jnp(p, x, cc):
        e = hannw_fourier_embed(x, 6, alpha)
        res = mlps.apply_nonrigid_mlp(p["non_rigid_mlp"], e, x, cc,
                                      skips=(4,), dtype=dt)
        pe = fourier_embed(jax.lax.optimization_barrier(res["xyz"]), CNL_M)
        return jnp.sum(mlps.apply_canonical_mlp(p["cnl_mlp"], pe, skips=(4,),
                                                dtype=dt))

    grad_fused = jax.jit(jax.grad(fwd_fused, argnums=(0, 1)))
    grad_jnp = jax.jit(jax.grad(fwd_jnp, argnums=(0, 1)))

    v1 = float(fwd_fused(params, x, cc))
    v2 = float(fwd_jnp(params, x, cc))
    print(f"forward sums: fused={v1:.4f} jnp={v2:.4f} "
          f"rel={abs(v1 - v2) / max(abs(v2), 1e-9):.2e}", flush=True)

    t = median_time(lambda: fwd_fused(params, x, cc), args.iters)
    print(f"fwd fused: {t * 1e3:8.2f} ms  {N / t / 1e6:8.1f} M samples/s",
          flush=True)
    t = median_time(lambda: fwd_jnp(params, x, cc), args.iters)
    print(f"fwd jnp:   {t * 1e3:8.2f} ms  {N / t / 1e6:8.1f} M samples/s",
          flush=True)

    def run_grad(g):
        gp, gx = g(params, x, cc)
        return gx[0, 0]

    t = median_time(lambda: run_grad(grad_fused), args.iters)
    print(f"fwd+bwd fused: {t * 1e3:8.2f} ms  {N / t / 1e6:8.1f} M samples/s",
          flush=True)
    t = median_time(lambda: run_grad(grad_jnp), args.iters)
    print(f"fwd+bwd jnp:   {t * 1e3:8.2f} ms  {N / t / 1e6:8.1f} M samples/s",
          flush=True)


if __name__ == "__main__":
    main()
