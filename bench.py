"""Render + train-step benchmark on the full model (one JSON line).

Primary metric: render ray-samples/sec/chip in bfloat16 (the TPU production
config; baseline target 5M/s/chip from BASELINE.json). The same line also
reports the float32 render number (the reference-parity default dtype) and
the full training-step time at the reference's per-step workload (6 patches
x 32^2 rays x 128 samples, LPIPS 1.0 + MSE 0.2 -- default.yaml:352-357,278-281)
so both quality-critical and throughput-critical configs are on record.

  {"metric": "ray_samples_per_sec_per_chip", "value": N, "unit": "samples/s",
   "vs_baseline": N/5e6, "render_f32_samples_per_sec": N,
   "train_step_ms": N, "train_it_per_sec": N}
"""

import argparse
import json
import time

import numpy as np


def _amortized_time(dispatch, iters, warmup):
    """Seconds per step, amortizing the axon host<->device round trip.

    On this machine's axon tunnel a host fetch costs ~30 ms regardless of
    payload (measured: a jitted no-op sum takes 33 ms, 16 chained steps add
    0.76 ms each), and block_until_ready returns early, so a float() fetch
    is the only honest sync. A real train/render loop dispatches steps
    asynchronously and fetches rarely, so the honest per-step cost is

        [K dispatches + 1 fetch] - [1 dispatch + 1 fetch]  over  K - 1.

    `dispatch` must return a (small) device array; the device queue
    serializes execution, so fetching the last result syncs them all.
    """
    assert iters >= 2
    for _ in range(warmup):
        float(dispatch())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = dispatch()
    float(out)
    t_total = time.perf_counter() - t0
    one = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(dispatch())
        one.append(time.perf_counter() - t0)
    t_one = float(np.median(one))
    return max(t_total - t_one, 1e-9) / (iters - 1)


def bench_render(args, dtype: str) -> float:
    import jax
    import jax.numpy as jnp
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.models.network import HumanNeRF
    from __graft_entry__ import _synthetic_inputs

    cfg = make_cfg(opts=["N_samples", str(args.samples), "dtype", dtype,
                         "pallas.skip_reorder", args.skip_reorder,
                         "pallas.skip_group", str(args.skip_group)])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    # f32 activations at 64K rays x 128 samples are 8 GB/layer; a 16K-ray
    # single block (2 GB peak) fits HBM and still saturates the chip, and
    # avoids the slow-to-compile lax.map loop
    n_rays = args.rays if dtype == "bfloat16" else min(args.rays, 16384)
    frame, rays = _synthetic_inputs(cfg, n_rays=n_rays)

    @jax.jit
    def render(params, frame, rays):
        return net.render_rays(params, frame, rays,
                               jnp.asarray(1e7))["rgb"].sum()

    dt = _amortized_time(lambda: render(params, frame, rays),
                         args.iters, args.warmup + 1)
    return n_rays * args.samples / dt


def bench_train_step(args) -> float:
    """Median seconds per full training step (fwd+loss+bwd+adam)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_inputs

    cfg = make_cfg(opts=[
        "N_samples", "128", "dtype", args.train_dtype,
        "patch.size", "32", "patch.N_patches", "6",
        "train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2",
        "train.remat", args.train_remat,
        "pallas.scatter", args.train_scatter,
        "pallas.skip_empty", args.skip_empty,
        "pallas.skip_reorder", args.skip_reorder,
        "pallas.skip_group", str(args.skip_group),
    ])
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

    return _amortized_time(step, args.iters, args.warmup + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--train-dtype", default="bfloat16")
    ap.add_argument("--train-remat", default="True")
    ap.add_argument("--train-scatter", default="True",
                    help="pallas.scatter for the train step (A/B the "
                         "Pallas scatter backward vs XLA scatter-add)")
    ap.add_argument("--skip-empty", default="True",
                    help="pallas.skip_empty for the train step (A/B the "
                         "exact empty-block skip in the MLP kernel)")
    ap.add_argument("--skip-reorder", default="train",
                    help="pallas.skip_reorder (tri-state: train/True/False; "
                         "'train' = live-first group partition inside "
                         "training steps only, the shipped default)")
    ap.add_argument("--skip-group", type=int, default=8,
                    help="pallas.skip_group partition granularity")
    ap.add_argument("--skip-f32", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    import sys

    from humannerf_tpu import runtime
    runtime.setup()

    def note(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    note("render bf16...")
    sps_bf16 = bench_render(args, "bfloat16")
    note(f"render bf16: {sps_bf16/1e6:.1f} M samples/s")
    out = {
        "metric": "ray_samples_per_sec_per_chip",
        "value": round(sps_bf16, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps_bf16 / 5e6, 4),
    }
    if not args.skip_f32:
        note("render f32...")
        out["render_f32_samples_per_sec"] = round(bench_render(args,
                                                               "float32"), 1)
        note(f"render f32: {out['render_f32_samples_per_sec']/1e6:.1f} M")
    if not args.skip_train:
        note("train step...")
        dt = bench_train_step(args)
        out["train_step_ms"] = round(dt * 1e3, 1)
        out["train_it_per_sec"] = round(1.0 / dt, 2)
        note(f"train step: {out['train_step_ms']} ms")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
