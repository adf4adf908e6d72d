"""Quantify the fast-warp quality tax + synthetic convergence (TPU or CPU).

Trains the full default model on a synthetic capture, reports PSNR/SSIM
against ground truth over training (the reference's empirical QA story,
metrics_util.py:81-106), then renders identical frames through every warp
config and reports PSNR vs the exact reference-parity warp:

  exact f32 (parity path)  vs  fused / packed x {f32, bf16} x grid {32,48,64}

Output: a markdown table for docs/architecture.md.

Usage: python benchmarks/quality_tax.py [--steps 600] [--size 128]
"""
import argparse
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--train-dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from humannerf_tpu import runtime
    runtime.setup()
    from synthetic_data import write_synthetic_dataset

    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.data.datasets import Dataset
    from humannerf_tpu.data.loader import Loader
    from humannerf_tpu.models.network import HumanNeRF
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import EvalRenderer, Trainer
    from humannerf_tpu.utils.image import unpack_to_image
    from humannerf_tpu.utils.metrics import compute_psnr, compute_ssim

    tmp = tempfile.mkdtemp(prefix="quality_tax_")
    data_path = write_synthetic_dataset(f"{tmp}/ds", n_frames=args.frames,
                                        size=args.size)

    def cfg_with(**extra):
        opts = [
            "N_samples", "128",
            "patch.size", "20", "patch.N_patches", "4",
            "train.lossweights.lpips", "0.0",
            "train.lossweights.mse", "1.0",
            "train.log_interval", "1000000",
            "progress.dump_interval", "1000000",
            "train.save_checkpt_interval", "1000000",
            "save_all", "False",
            "dtype", f"'{args.train_dtype}'",
        ]
        for k, v in extra.items():
            opts += [k, str(v)]
        c = make_cfg(opts=opts, base_dir=tmp)
        c.logdir = f"{tmp}/logs"
        c.train.dataset = data_path
        return c

    cfg = cfg_with()
    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh(1), log=print)
    ds_eval = Dataset(cfg, data_path, keyfilter=cfg.test_keyfilter,
                      ray_shoot_mode="image", bgcolor=[0, 0, 0])
    ds_train = Dataset(cfg, data_path, keyfilter=cfg.train_keyfilter,
                       ray_shoot_mode="patch", bgcolor=[0, 0, 0], seed=0)
    bg = np.zeros(3, np.float32)

    def eval_metrics(renderer, params):
        ps, ss = [], []
        for i in range(len(ds_eval)):
            item = ds_eval[i]
            out = renderer.render_frame(params, item, 1e7)
            W, H = item["img_width"], item["img_height"]
            img, _, truth = unpack_to_image(W, H, item["ray_mask"], bg,
                                            out["rgb"],
                                            truth=item["target_rgbs"])
            ps.append(compute_psnr(img / 255.0, truth / 255.0))
            ss.append(compute_ssim(img / 255.0, truth / 255.0))
        return float(np.mean(ps)), float(np.mean(ss))

    r0 = EvalRenderer(trainer.net, chunk=4096)
    curve = [(0,) + eval_metrics(r0, trainer.params)]
    print(f"iter 0: psnr {curve[0][1]:.2f} ssim {curve[0][2]:.4f}")
    done = 0
    while done < args.steps:
        n = min(args.eval_every, args.steps - done)
        trainer.train(loader=Loader(ds_train, shuffle=True, seed=done),
                      max_steps=n)
        done += n
        p, s = eval_metrics(r0, trainer.params)
        curve.append((done, p, s))
        print(f"iter {done}: psnr {p:.2f} ssim {s:.4f}")

    print("\n## Synthetic convergence (PSNR/SSIM vs ground truth)\n")
    print("| iter | PSNR | SSIM |\n|---|---|---|")
    for it, p, s in curve:
        print(f"| {it} | {p:.2f} | {s:.4f} |")

    # -- warp-config sweep vs exact ------------------------------------------------
    params = trainer.params
    item = ds_eval[0]
    W, H = item["img_width"], item["img_height"]

    def render_img(**extra):
        c = cfg_with(**extra)
        net = HumanNeRF(c)
        out = EvalRenderer(net, chunk=4096).render_frame(params, item, 1e7)
        img, _, _ = unpack_to_image(W, H, item["ray_mask"], bg, out["rgb"])
        return img / 255.0

    exact = render_img(**{"warp.mode": "'exact'", "dtype": "'float32'"})
    truth = np.asarray(item["target_rgbs"], np.float32)
    full_truth = np.zeros((H * W, 3), np.float32)
    full_truth[item["ray_mask"]] = truth
    full_truth = full_truth.reshape(H, W, 3)
    print(f"\nexact-f32 vs GT: psnr {compute_psnr(exact, full_truth):.2f}")

    rows = []
    for packed in (False, True):
        for dtype in ("float32", "bfloat16"):
            for grid in (32, 48, 64):
                img = render_img(**{"warp.mode": "'fused'",
                                    "warp.packed": str(packed),
                                    "warp.grid_size": str(grid),
                                    "dtype": f"'{dtype}'"})
                rows.append((("packed" if packed else "fused"), dtype, grid,
                             compute_psnr(img, exact),
                             compute_psnr(img, full_truth)))
                print(f"{rows[-1][0]} {dtype} grid{grid}: "
                      f"vs-exact {rows[-1][3]:.2f} dB, vs-GT {rows[-1][4]:.2f}")

    print("\n## Warp fast-path quality tax (PSNR, dB)\n")
    print("| warp | dtype | grid | vs exact-f32 | vs ground truth |")
    print("|---|---|---|---|---|")
    for m, d, g, pe, pg in rows:
        print(f"| {m} | {d} | {g} | {pe:.2f} | {pg:.2f} |")


if __name__ == "__main__":
    main()
