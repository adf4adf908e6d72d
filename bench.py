"""Render-throughput benchmark: ray-samples/sec/chip on the full model.

Runs the complete HumanNeRF forward (motion-weight volume decode, inverse-
LBS warp, non-rigid + canonical MLPs, compositing) on one chip and reports
ray-samples/sec. Baseline target from BASELINE.json: 5M ray-samples/sec/chip.

Prints ONE JSON line:
  {"metric": "ray_samples_per_sec_per_chip", "value": N, "unit": "samples/s",
   "vs_baseline": N/5e6}
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from humannerf_tpu import runtime
    runtime.setup()
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.models.network import HumanNeRF
    from __graft_entry__ import _synthetic_inputs

    cfg = make_cfg(opts=[
        "N_samples", str(args.samples),
        "dtype", args.dtype,
    ])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    frame, rays = _synthetic_inputs(cfg, n_rays=args.rays)

    @jax.jit
    def render(params, frame, rays):
        # returns a scalar: forces the full render while keeping the
        # host sync transfer at 4 bytes (the dev-tunnel transfers at
        # ~6 MB/s, which would otherwise dominate the measurement)
        return net.render_rays(params, frame, rays, jnp.asarray(1e7))["rgb"].sum()

    # NOTE: on the experimental axon platform block_until_ready returns
    # before execution completes; a host fetch is the only honest sync.
    float(render(params, frame, rays))
    for _ in range(args.warmup):
        float(render(params, frame, rays))

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        float(render(params, frame, rays))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    sps = args.rays * args.samples / dt
    baseline = 5e6
    print(json.dumps({
        "metric": "ray_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / baseline, 4),
    }))


if __name__ == "__main__":
    main()
