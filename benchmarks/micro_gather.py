"""Microbench: Pallas per-row HBM gather rate vs XLA's row gather.

Decides whether the render's packed-volume sample gather (42 ms for 8.4M
256-B rows at 64K rays, latency-bound at ~200M rows/s via XLA) can move
inside a Pallas kernel -- per live block, issue one DMA per row with a
deep in-flight window -- so dead blocks skip their rows entirely and live
rows hide under MLP compute.

Variants:
  xla        XLA's gather (the current production path)
  issue      Pallas DMA issue-rate probe: per-row DMAs into round-robin
             (1, 128) scratch slots, nothing landed -- an upper bound on
             any per-row-DMA kernel
  land       full landing path: groups of 8 rows DMA into per-slot
             scratches, then one aligned (8, 128) store per group

Run on the real chip: python benchmarks/micro_gather.py
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def amort(fn, iters=8):
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
    ap.add_argument("--n", type=int, default=2 ** 23)   # 8.4M rows
    ap.add_argument("--rows", type=int, default=48 ** 3)
    ap.add_argument("--blk", type=int, default=2048)
    ap.add_argument("--inflight", type=int, default=16)
    args = ap.parse_args()

    from humannerf_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, R, BLK, W = args.n, args.rows, args.blk, args.inflight
    key = jax.random.key(0)
    table = jax.random.normal(key, (R, 128)).astype(jnp.bfloat16)
    ids = jax.random.randint(jax.random.key(1), (N,), 0, R, jnp.int32)

    # XLA baseline
    @jax.jit
    def xla_gather(t, i):
        return t[i].astype(jnp.float32).sum()
    ms = amort(lambda: xla_gather(table, ids))
    print(f"xla gather   : {ms:8.2f} ms  ({N/ms/1e3:6.1f} M rows/s)",
          flush=True)

    # Pallas DMA issue-rate probe (no landing)
    def kern_issue(ids_ref, tab_ref, out_ref, scratch, sems):
        def issue(j):
            rid = ids_ref[j, 0]
            base = pl.multiple_of((rid // 8) * 8, 8)
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(base, 8), :],
                scratch.at[j % W],
                sems.at[j % W])

        def warm(j, _):
            issue(j).start()
            return 0
        jax.lax.fori_loop(0, W, warm, 0)

        def body(j, _):
            issue(j).wait()

            @pl.when(j + W < BLK)
            def _():
                issue(j + W).start()
            return 0
        jax.lax.fori_loop(0, BLK, body, 0)
        out_ref[:] = scratch[0, :1] + scratch[W - 1, :1]

    @jax.jit
    def pl_issue(t, i):
        out = pl.pallas_call(
            kern_issue,
            grid=(N // BLK,),
            in_specs=[pl.BlockSpec((BLK, 1), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, 128), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((W, 8, 128), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((W,))],
        )(i.reshape(N, 1), t)
        return out.astype(jnp.float32).sum()

    ms = amort(lambda: pl_issue(table, ids))
    print(f"pallas issue : {ms:8.2f} ms  ({N/ms/1e3:6.1f} M rows/s)  "
          f"blk={BLK} inflight={W}", flush=True)

    # full landing path: DMA rows into per-slot (1,128) scratches; after
    # each group of 16, concatenate and store one aligned (16, 128) block
    GRP = 16
    NW = GRP  # one scratch slot per group lane -> static slot indices

    def kern_land(ids_ref, tab_ref, out_ref, scratch, sems):
        def issue(j):
            rid = ids_ref[j, 0]
            base = pl.multiple_of((rid // 8) * 8, 8)
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(base, 8), :],
                scratch.at[j % NW],
                sems.at[j % NW])

        def warm(j, _):
            issue(j).start()
            return 0
        jax.lax.fori_loop(0, NW, warm, 0)

        def body(g, _):
            j0 = g * GRP

            def wait_one(m, _):
                issue(j0 + m).wait()
                return 0
            jax.lax.fori_loop(0, GRP, wait_one, 0)
            rows = []
            for m in range(GRP):
                rid = ids_ref[j0 + m, 0]
                sel = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                       == (rid % 8))
                rows.append(jnp.sum(jnp.where(sel, scratch[m], 0),
                                    axis=0, keepdims=True,
                                    dtype=jnp.float32))
            out_ref[pl.ds(j0, GRP), :] = jnp.concatenate(
                rows, axis=0).astype(jnp.bfloat16)

            def reissue(m, _):
                @pl.when(j0 + m + NW < BLK)
                def _():
                    issue(j0 + m + NW).start()
                return 0
            jax.lax.fori_loop(0, GRP, reissue, 0)
            return 0
        jax.lax.fori_loop(0, BLK // GRP, body, 0)

    @jax.jit
    def pl_land(t, i):
        out = pl.pallas_call(
            kern_land,
            grid=(N // BLK,),
            in_specs=[pl.BlockSpec((BLK, 1), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((BLK, 128), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((NW, 8, 128), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((NW,))],
        )(i.reshape(N, 1), t)
        return out.astype(jnp.float32).sum()

    try:
        ms = amort(lambda: pl_land(table, ids))
        print(f"pallas land  : {ms:8.2f} ms  ({N/ms/1e3:6.1f} M rows/s)",
              flush=True)
        ok = bool(jnp.allclose(pl_land(table, ids), xla_gather(table, ids),
                               rtol=1e-3))
        print(f"# land parity vs xla: {ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# land variant failed: {type(e).__name__}: {e}"[:400],
              flush=True)


if __name__ == "__main__":
    main()
