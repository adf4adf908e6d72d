"""Full training-step benchmark on the real TPU (honest host-fetch sync).

Usage: python benchmarks/bench_train_step.py [--grid 64] [--frames 1]
"""
import argparse
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from humannerf_tpu import runtime
    runtime.setup()
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_inputs

    cfg = make_cfg(opts=[
        "N_samples", "128", "dtype", "bfloat16",
        "patch.size", "32", "patch.N_patches", "6",
        "warp.grid_size", str(args.grid),
        "train.frames_per_step", str(args.frames),
        "train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2",
        "train.remat", str(not args.no_remat),
    ])
    cfg.logdir = tempfile.mkdtemp()
    cfg.resume = False
    trainer = Trainer(cfg, log=lambda *a: None)

    n_rays = 6 * 32 * 32
    rng = np.random.RandomState(0)

    def one_frame(seed):
        frame, rays = _synthetic_inputs(cfg, n_rays=n_rays, seed=seed)
        b = dict(frame)
        b.update(rays)
        b["target_patches"] = jnp.asarray(
            rng.rand(6, 32, 32, 3).astype(np.float32))
        b["patch_ray_idx"] = jnp.asarray(
            np.arange(n_rays, dtype=np.int32).reshape(6, 32, 32))
        b["bgcolor"] = jnp.zeros(3, jnp.float32)
        b["head_id"] = jnp.asarray(0, jnp.int32)
        return b

    if args.frames == 1:
        db = mesh_lib.put_batch(one_frame(0), trainer.mesh)
    else:
        db = mesh_lib.put_frame_batch(
            mesh_lib.collate_frames([one_frame(i) for i in range(args.frames)]),
            trainer.mesh)

    t0 = time.perf_counter()
    p, o, loss, d = trainer._train_step(trainer.params, trainer.opt_state,
                                        db, jax.random.key(0),
                                        jnp.asarray(1.0))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s loss={float(loss):.4f}")
    trainer.params, trainer.opt_state = p, o

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        trainer.params, trainer.opt_state, loss, d = trainer._train_step(
            trainer.params, trainer.opt_state, db, jax.random.key(i),
            jnp.asarray(float(i + 2)))
        float(loss)  # host fetch = honest sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    total = n_rays * 128 * args.frames
    print(f"train step: {dt*1e3:.1f} ms -> {args.frames/dt:.2f} frames/s "
          f"({total/dt/1e6:.2f} M samples/s fwd+bwd)")


if __name__ == "__main__":
    main()
