"""Train-step time ablation on the real chip: where do the ms go?

Times the full jitted train step under one-factor-at-a-time config changes
so optimization effort lands on the actual bottleneck.

Usage: python benchmarks/ablate_train.py [--iters 8]
"""
import argparse
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

ABLATIONS = [
    ("baseline", {}),
    ("mlp_bwd_768", {"pallas.mlp_block_bwd": "768"}),
    ("rs_blk_256", {"pallas.resample_block": "256"}),
    ("rs_blk_1024", {"pallas.resample_block": "1024"}),
    ("no_pallas_mlp", {"pallas.mlp": "False"}),
    ("no_pallas_resample", {"pallas.resample": "False"}),
    ("no_support_skip", {"pallas.resample_support_skip": "False"}),
    ("no_pallas_scatter", {"pallas.scatter": "False"}),
    ("no_band_gather", {"pallas.band_gather": "False"}),
    ("scatter_blk2048", {"pallas.scatter_block": "2048"}),
    ("scatter_win512", {"pallas.scatter_window": "512"}),
    ("no_lpips", {"train.lossweights.lpips": "0.0",
                  "train.lossweights.mse": "1.0"}),
    ("no_remat", {"train.remat": "False"}),
    ("samples_64", {"N_samples": "64"}),
    ("samples_4", {"N_samples": "4"}),
    ("grid_24", {"warp.grid_size": "24"}),
    ("f32", {"dtype": "'float32'"}),
]


def time_config(name, extra, iters):
    import jax
    import jax.numpy as jnp
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_inputs

    opts = [
        "N_samples", "128", "dtype", "bfloat16",
        "patch.size", "32", "patch.N_patches", "6",
        "train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2",
        "train.remat", "True",
    ]
    for k, v in extra.items():
        opts += [k, str(v)]
    cfg = make_cfg(opts=opts)
    cfg.logdir = tempfile.mkdtemp()
    cfg.resume = False
    trainer = Trainer(cfg, log=lambda *a: None)

    n_rays = 6 * 32 * 32
    frame, rays = _synthetic_inputs(cfg, n_rays=n_rays)
    rng = np.random.RandomState(0)
    batch = dict(frame)
    batch.update(rays)
    batch["target_patches"] = jnp.asarray(
        rng.rand(6, 32, 32, 3).astype(np.float32))
    batch["patch_ray_idx"] = jnp.asarray(
        np.arange(n_rays, dtype=np.int32).reshape(6, 32, 32))
    batch["bgcolor"] = jnp.zeros(3, jnp.float32)
    batch["head_id"] = jnp.asarray(0, jnp.int32)
    db = mesh_lib.put_batch(batch, trainer.mesh)

    state = {"i": 0}

    def step():
        state["i"] += 1
        trainer.params, trainer.opt_state, loss, _ = trainer._train_step(
            trainer.params, trainer.opt_state, db,
            jax.random.key(state["i"]), jnp.asarray(float(state["i"])))
        return loss

    t0 = time.perf_counter()
    float(step())
    compile_s = time.perf_counter() - t0
    from bench import _amortized_time
    dt = _amortized_time(step, iters, warmup=1) * 1e3
    print(f"{name:22s} {dt:8.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    from humannerf_tpu import runtime
    runtime.setup()
    for name, extra in ABLATIONS:
        if args.only and args.only != name:
            continue
        time_config(name, extra, args.iters)


if __name__ == "__main__":
    main()
