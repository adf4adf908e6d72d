"""Op-level device-time budget of the training step (real chip).

Captures a jax.profiler trace of a few steady-state train steps and
aggregates the TPU plane's per-op durations from the raw xplane proto
(the tensorboard summarization plugin is broken in this image), so
optimization effort lands on measured hot spots instead of guesses.

Usage: python benchmarks/profile_train.py [--steps 4] [--top 40]
"""
import argparse
import collections
import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(extra_opts=()):
    import jax
    import jax.numpy as jnp
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer
    from __graft_entry__ import _synthetic_inputs

    cfg = make_cfg(opts=[
        "N_samples", "128", "dtype", "bfloat16",
        "patch.size", "32", "patch.N_patches", "6",
        "train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2",
        "train.remat", "True",
    ] + list(extra_opts))
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

    return step


def aggregate_xplane(logdir, top, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    device_planes = [p for p in xspace.planes
                     if "TPU" in p.name or "/device" in p.name.lower()]
    if not device_planes:
        print("planes found:", [p.name for p in xspace.planes])
        return
    by_name = collections.Counter()
    total_ps = 0
    for plane in device_planes:
        names = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA op lines carry the per-op events; step lines duplicate them
            if "XLA Op" not in line.name and "Ops" not in line.name \
                    and "step" in line.name.lower():
                continue
            for ev in line.events:
                nm = names.get(ev.metadata_id, "?")
                by_name[nm] += ev.duration_ps
        # use only the busiest line set per plane: avoid double counting
        # (heuristic: XLA Modules line vs XLA Ops line). We sum the "Ops"
        # granularity if present, else everything.
    # Fall back: if we double counted modules + ops, drop entries that look
    # like whole-module fusions containing '.' module names
    total_ps = sum(by_name.values())
    print(f"\n# device planes: {[p.name for p in device_planes]}")
    print(f"# total device-op time: {total_ps/1e9/steps:.2f} ms/step "
          f"(over {steps} steps)\n")
    print(f"{'op':72s} {'ms/step':>9s} {'%':>6s}")
    for nm, ps in by_name.most_common(top):
        print(f"{nm[:72]:72s} {ps/1e9/steps:9.3f} {100.0*ps/total_ps:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    import jax
    from humannerf_tpu import runtime
    runtime.setup()

    step = build_step(tuple(args.opts))
    float(step())  # compile
    float(step())  # steady state
    logdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(args.steps):
            out = step()
        float(out)
    aggregate_xplane(logdir, args.top, args.steps)


if __name__ == "__main__":
    main()
