"""End-to-end training convergence on the REAL chip with the fast path.

tests/test_convergence.py proves the f32 jnp path converges on CPU; this
script proves the production TPU configuration -- bf16, fused/packed warp,
Pallas MLP + resample kernels -- actually trains: it runs N steps on the
synthetic dataset and reports PSNR vs ground truth before/after.

Usage: python benchmarks/tpu_convergence.py [--steps 400] [--loss production]
Prints one JSON line: {"psnr_start": ..., "psnr_end": ..., "steps": N}

--loss mse         trains with MSE only (the round-1/2 headline curve).
--loss production  trains with the reference's shipped weights
                   LPIPS 1.0 + MSE 0.2 (/root/reference/configs/default.yaml
                   lossweights) -- LPIPS is the PRIMARY loss in the
                   reference's training dynamics, so the convergence proof
                   must cover it.
"""
import argparse
import json
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--loss", choices=["mse", "production"], default="mse")
    args = ap.parse_args()

    from humannerf_tpu import runtime
    runtime.setup()

    from synthetic_data import write_synthetic_dataset

    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.data.loader import create_dataset
    from humannerf_tpu.train.trainer import Trainer
    from humannerf_tpu.utils.image import unpack_to_image
    from humannerf_tpu.utils.metrics import compute_psnr

    root = tempfile.mkdtemp(prefix="tpu_conv_")
    write_synthetic_dataset(f"{root}/dataset", n_frames=4, size=128)

    if args.loss == "production":
        # the reference's shipped training loss (default.yaml lossweights)
        lw = ["train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2"]
    else:
        lw = ["train.lossweights.lpips", "0.0", "train.lossweights.mse", "1.0"]
    cfg = make_cfg(opts=[
        "dtype", "bfloat16",
        "N_samples", "64",
        "patch.size", "20", "patch.N_patches", "4",
        "train.dataset", f"{root}/dataset",
        *lw,
        "train.maxiter", str(args.steps),
        "train.log_interval", "100",
        "progress.dump_interval", "100000",
        "movement.dataset", f"{root}/dataset",
    ])
    cfg.logdir = f"{root}/log"
    cfg.resume = False
    trainer = Trainer(cfg, log=print)

    eval_ds = create_dataset(cfg, "movement")

    def eval_psnr():
        vals = []
        for i in range(len(eval_ds)):
            item = eval_ds[i]
            out = trainer.renderer.render_frame(trainer.params, item,
                                                trainer.iter)
            W, H = item["img_width"], item["img_height"]
            bg = np.array(cfg.bgcolor, np.float32) / 255.0
            rgb, _, truth = unpack_to_image(
                W, H, item["ray_mask"], bg, out["rgb"],
                truth=item["target_rgbs"])
            vals.append(compute_psnr(rgb / 255.0, truth / 255.0))
        return float(np.mean(vals))

    p0 = eval_psnr()
    print(f"# psnr at init: {p0:.2f} dB", flush=True)
    curve = []
    done = 0
    while done < args.steps:
        n = min(args.eval_every, args.steps - done)
        trainer.train(max_steps=n)
        done += n
        p = eval_psnr()
        curve.append(round(p, 2))
        print(f"# psnr after {done} steps: {p:.2f} dB", flush=True)
    print(json.dumps({"psnr_start": round(p0, 2), "psnr_end": curve[-1],
                      "curve": curve, "steps": args.steps,
                      "loss": args.loss}))
    assert curve[-1] > p0 + 3.0, (p0, curve)
    # no destabilization: the curve never collapses by >1.5 dB from its
    # running best (catches e.g. an LPIPS gradient blowing up mid-run)
    best = p0
    for p in curve:
        assert p > best - 1.5, ("training destabilized", p0, curve)
        best = max(best, p)


if __name__ == "__main__":
    main()
