"""Decompose scatter_grad_volume (the train step's Pallas segment-sum
backward, ops/pallas_scatter.py): sort vs payload build vs kernel.

Run on the real chip: python benchmarks/micro_scatter.py
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
    ap.add_argument("--n", type=int, default=6 * 32 * 32 * 128)  # 786k
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--blk", type=int, default=1024)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--dead", type=float, default=0.55,
                    help="fraction of samples with zero cotangent")
    args = ap.parse_args()

    from humannerf_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from humannerf_tpu.ops import pallas_scatter as ps

    N, G = args.n, args.grid
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randint(0, G ** 3, N).astype(np.int32))
    dacc = rng.randn(N, 16).astype(np.float32)
    # zero out a contiguous-band dead population (like fg==0 samples)
    dead = rng.rand(N) < args.dead
    dacc[dead] = 0.0
    dacc = jnp.asarray(dacc)
    w8 = jnp.asarray(np.abs(rng.rand(N, 8)).astype(np.float32))

    @jax.jit
    def full(f, d, w):
        return ps.scatter_grad_volume(f, d, w, grid_size=G, blk=args.blk,
                                      window=args.window).sum()
    ms = amort(lambda: full(flat, dacc, w8))
    print(f"scatter bwd full : {ms:7.2f} ms", flush=True)

    # sort stage alone (13-column bf16-packed sort, as in the bf16 path)
    @jax.jit
    def sort_only(f, d, w):
        cols = ([ps._pack_u32(d)[:, i] for i in range(8)]
                + [ps._pack_u32(w)[:, i] for i in range(4)])
        order = jax.lax.sort([f] + cols, num_keys=1)
        return order[0].sum() + order[1].sum()
    ms = amort(lambda: sort_only(flat, dacc, w8))
    print(f"  sort (13 col)  : {ms:7.2f} ms", flush=True)

    # sort with only an index payload (2 columns), then gather payloads
    @jax.jit
    def sort_idx(f, d, w):
        idx = jnp.arange(f.shape[0], dtype=jnp.int32)
        fs, ixs = jax.lax.sort([f, idx], num_keys=1)
        ds = d[ixs]
        ws = w[ixs]
        return fs.sum() + ds.sum() + ws.sum()
    ms = amort(lambda: sort_idx(flat, dacc, w8))
    print(f"  sort2 + gather : {ms:7.2f} ms", flush=True)

    # payload outer product alone
    @jax.jit
    def payload(d, w):
        return (w[:, :, None] * d[:, None, :]).reshape(N, 128) \
            .astype(jnp.bfloat16).sum()
    ms = amort(lambda: payload(dacc, w8))
    print(f"  payload build  : {ms:7.2f} ms", flush=True)

    # kernel alone on presorted inputs (in-kernel payload build: takes
    # the (N, 24) = (cotangent | corner-weight) rows)
    flat_s = jnp.sort(flat)
    dw_s = jnp.asarray(rng.randn(N, 24).astype(np.float32)) \
        .astype(jnp.bfloat16)

    @jax.jit
    def kernel_only(f, dw):
        return ps._scatter_call(f, dw, G=G, dtype_str="bfloat16",
                                blk=args.blk, R=args.window,
                                interpret=False).sum()
    ms = amort(lambda: kernel_only(flat_s, dw_s))
    print(f"  slot kernel    : {ms:7.2f} ms", flush=True)

    # XLA scatter-add reference
    @jax.jit
    def xla_scatter(f, d, w):
        p = (w[:, :, None] * d[:, None, :]).reshape(N, 128)
        out = jnp.zeros((G ** 3, 128), jnp.float32)
        return out.at[f].add(p).sum()
    ms = amort(lambda: xla_scatter(flat, dacc, w8))
    print(f"  xla scatter-add: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
