"""End-to-end synthetic training convergence + fast-warp quality pins
(VERDICT r1 next-steps #3 and #4).

Trains the full model on the synthetic capture and asserts the *metric*
story the reference relies on (trainer.py:271-350, metrics_util.py:81-88):
PSNR against ground truth improves from init and clears a floor -- not just
"loss goes down". Then, with the same trained weights, pins the quality tax
of the fused/packed warp approximations against the exact reference-parity
warp path. `benchmarks/quality_tax.py` runs the full-size version of that
sweep on TPU hardware; these tests are the regression pins.
"""

import jax
import numpy as np
import pytest

from synthetic_data import write_synthetic_dataset

from humannerf_tpu.config import make_cfg
from humannerf_tpu.data.datasets import Dataset
from humannerf_tpu.data.loader import Loader
from humannerf_tpu.utils.image import unpack_to_image
from humannerf_tpu.utils.metrics import compute_psnr


def _cfg(tmp_path, data_path, **extra):
    opts = [
        # pinned f32: this file is the CPU regression twin of the
        # reference-parity path (the shipped default is bfloat16)
        "dtype", "'float32'",
        "N_samples", "16", "patch.size", "16", "patch.N_patches", "2",
        "warp.grid_size", "24",
        "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16",
        "canonical_mlp.mlp_width", "64", "canonical_mlp.mlp_depth", "4",
        "non_rigid_motion_mlp.mlp_width", "16",
        "non_rigid_motion_mlp.mlp_depth", "3",
        "non_rigid_motion_mlp.skips", "[]",
        "non_rigid_motion_mlp.kick_in_iter", "0",
        "non_rigid_motion_mlp.full_band_iter", "0",
        "pose_decoder.mlp_width", "16", "pose_decoder.mlp_depth", "2",
        "train.lossweights.lpips", "0.0",
        "train.lossweights.mse", "1.0",
        "train.log_interval", "1000000",
        "progress.dump_interval", "1000000",
        "train.save_checkpt_interval", "1000000",
        "save_all", "False",
    ]
    for k, v in extra.items():
        opts += [k, str(v)]
    cfg = make_cfg(opts=opts, base_dir=str(tmp_path))
    cfg.logdir = str(tmp_path / "logs")
    cfg.train.dataset = data_path
    return cfg


def _eval_psnr(cfg, net, params, data_path, renderer=None, n_frames=2):
    """Mean full-image PSNR over the first eval frames."""
    from humannerf_tpu.train.trainer import EvalRenderer
    ds = Dataset(cfg, data_path, keyfilter=cfg.test_keyfilter,
                 ray_shoot_mode="image", bgcolor=[0, 0, 0])
    r = renderer or EvalRenderer(net, chunk=1024)
    bg = np.zeros(3, np.float32)
    vals = []
    for i in range(min(n_frames, len(ds))):
        item = ds[i]
        out = r.render_frame(params, item, 1e7)
        W, H = item["img_width"], item["img_height"]
        rgb_img, _, truth_img = unpack_to_image(
            W, H, item["ray_mask"], bg, out["rgb"], truth=item["target_rgbs"])
        vals.append(compute_psnr(rgb_img / 255.0, truth_img / 255.0))
    return float(np.mean(vals))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train 150 steps on a 2-frame synthetic capture; return everything
    needed by the metric assertions."""
    tmp_path = tmp_path_factory.mktemp("conv")
    data_path = write_synthetic_dataset(str(tmp_path / "ds"), n_frames=2,
                                        size=64)
    cfg = _cfg(tmp_path, data_path)
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh(1), log=lambda *a: None)
    psnr_init = _eval_psnr(cfg, trainer.net, trainer.params, data_path)

    ds = Dataset(cfg, data_path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=[0, 0, 0], seed=0)
    psnr_curve = [psnr_init]
    for chunk in (50, 50):
        trainer.train(loader=Loader(ds, shuffle=True, seed=0, prefetch=0),
                      max_steps=chunk)
        psnr_curve.append(_eval_psnr(cfg, trainer.net, trainer.params,
                                     data_path))
    return dict(cfg=cfg, trainer=trainer, data_path=data_path,
                psnr_curve=psnr_curve, tmp_path=tmp_path)


def test_synthetic_convergence_psnr(trained):
    curve = trained["psnr_curve"]
    print("PSNR curve:", [f"{p:.2f}" for p in curve])
    # improves from init, monotone-ish (each eval >= previous - 0.5 dB
    # jitter allowance), and clears an absolute floor
    assert curve[-1] > curve[0] + 3.0, curve
    for a, b in zip(curve, curve[1:]):
        assert b > a - 0.5, curve
    assert curve[-1] > 16.0, curve


def test_production_loss_convergence(tmp_path):
    """CPU regression twin of the PRODUCTION loss (LPIPS 1.0 + MSE 0.2,
    /root/reference/configs/default.yaml lossweights): training under the
    perceptual loss must improve PSNR and never destabilize. The full-length
    TPU curve lives in PARITY.md (benchmarks/tpu_convergence.py
    --loss production: 10.1 -> 30.1 dB over 1200 steps)."""
    data_path = write_synthetic_dataset(str(tmp_path / "ds"), n_frames=2,
                                        size=64)
    cfg = _cfg(tmp_path, data_path,
               **{"train.lossweights.lpips": "1.0",
                  "train.lossweights.mse": "0.2"})
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, mesh=mesh_lib.make_mesh(1), log=lambda *a: None)
    psnr_init = _eval_psnr(cfg, trainer.net, trainer.params, data_path,
                           n_frames=1)

    ds = Dataset(cfg, data_path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=[0, 0, 0], seed=0)
    curve = [psnr_init]
    for chunk in (40, 40):
        trainer.train(loader=Loader(ds, shuffle=True, seed=0, prefetch=0),
                      max_steps=chunk)
        curve.append(_eval_psnr(cfg, trainer.net, trainer.params, data_path,
                                n_frames=1))
    print("production-loss PSNR curve:", [f"{p:.2f}" for p in curve])
    assert curve[-1] > curve[0] + 2.0, curve
    for a, b in zip(curve, curve[1:]):
        assert b > a - 0.5, curve


def test_fused_vs_exact_quality_pin(trained):
    """PSNR between the exact-parity warp render and each fast-path warp
    config on the same trained weights must clear a floor (the fast path is
    an approximation, VERDICT r1 weak #2)."""
    from humannerf_tpu.models.network import HumanNeRF
    from humannerf_tpu.train.trainer import EvalRenderer

    tmp_path, data_path = trained["tmp_path"], trained["data_path"]
    params = trained["trainer"].params
    ds_item = Dataset(trained["cfg"], data_path,
                      keyfilter=trained["cfg"].test_keyfilter,
                      ray_shoot_mode="image", bgcolor=[0, 0, 0])[0]
    bg = np.zeros(3, np.float32)

    def render(**warp_opts):
        cfg = _cfg(tmp_path, data_path, **warp_opts)
        net = HumanNeRF(cfg)
        out = EvalRenderer(net, chunk=1024).render_frame(params, ds_item, 1e7)
        W, H = ds_item["img_width"], ds_item["img_height"]
        img, _, _ = unpack_to_image(W, H, ds_item["ray_mask"], bg, out["rgb"])
        return img / 255.0

    exact = render(**{"warp.mode": "'exact'"})
    results = {}
    for name, opts in (
            ("packed_f32", {"warp.mode": "'fused'", "warp.packed": "True",
                            "dtype": "'float32'"}),
            ("packed_bf16_grid24", {"warp.mode": "'fused'",
                                    "warp.packed": "True",
                                    "dtype": "'bfloat16'"})):
        results[name] = compute_psnr(render(**opts), exact)
    print("fused-vs-exact PSNR:", {k: f"{v:.2f}" for k, v in results.items()})
    # pins: the approximation must stay visually negligible on the trained
    # model (>= 30 dB vs exact; see docs/architecture.md for the full sweep)
    for name, v in results.items():
        assert v > 30.0, (name, v, results)
