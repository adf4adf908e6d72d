"""Multihead outputs: head selection, all-head rendering, argmin loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.config import make_cfg
from humannerf_tpu.models import mlps
from humannerf_tpu.models.network import HumanNeRF
from humannerf_tpu.train.loss import argmin_multihead_loss

from test_network import make_rays, make_synthetic_frame


def mh_cfg(head_depth=1, split="view"):
    return make_cfg(opts=[
        "N_samples", "8", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
        "non_rigid_motion_mlp.mlp_width", "16",
        "non_rigid_motion_mlp.mlp_depth", "3",
        "non_rigid_motion_mlp.skips", "[]",
        "multihead.head_num", "3", "multihead.split", f"'{split}'",
        "canonical_mlp.multihead.enable", "True",
        "canonical_mlp.multihead.head_depth", str(head_depth),
        "non_rigid_motion_mlp.multihead.enable", "True",
        "non_rigid_motion_mlp.multihead.head_depth", str(head_depth),
    ])


@pytest.mark.parametrize("head_depth", [1, 2])
def test_all_heads_render_distinct(head_depth):
    cfg = mh_cfg(head_depth)
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    frame, rays = make_synthetic_frame(), make_rays(16)
    out = net.render_rays(params, frame, rays, iter_val=1e7, head_mode="all")
    assert out["rgb"].shape == (3, 16, 3)
    assert out["alpha"].shape == (3, 16)
    # density heads are independently initialized -> distinct outputs
    r = np.asarray(out["rgb"])
    assert not np.allclose(r[0], r[1], atol=1e-6)


def test_select_matches_all_per_head():
    cfg = mh_cfg(1)
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(1))
    frame, rays = make_synthetic_frame(), make_rays(16)
    allout = np.asarray(net.render_rays(params, frame, rays, iter_val=1e7,
                                        head_mode="all")["rgb"])
    for h in range(3):
        sel = np.asarray(net.render_rays(
            params, frame, rays, iter_val=1e7, head_mode="select",
            head_id=jnp.asarray(h))["rgb"])
        np.testing.assert_allclose(sel, allout[h], atol=1e-5)


def test_multihead_mlp_params_shapes():
    p1 = mlps.init_canonical_mlp(jax.random.key(0), input_ch=63, head_num=4,
                                 head_depth=1)
    assert p1["output"]["w"].shape == (256, 16)
    p2 = mlps.init_canonical_mlp(jax.random.key(0), input_ch=63, head_num=4,
                                 head_depth=2)
    assert len(p2["multihead"]) == 4
    assert p2["multihead"][0]["output"]["w"].shape == (256, 4)
    # non-rigid heads keep tiny-init output layers
    p3 = mlps.init_nonrigid_mlp(jax.random.key(0), pos_embed_size=36,
                                head_num=4, head_depth=2)
    for head in p3["multihead"]:
        assert np.abs(np.asarray(head["output"]["w"])).max() <= 1e-5


def test_argmin_loss_selects_best_head():
    cfg = mh_cfg(1, split="argmin")
    K, R = 3, 32
    rng = np.random.RandomState(0)
    target = rng.rand(2, 4, 4, 3).astype(np.float32)
    idx = np.arange(2 * 16, dtype=np.int32).reshape(2, 4, 4)
    target_rays = target.reshape(-1, 3)
    rgb_heads = np.stack([
        target_rays + 0.5,          # bad head
        target_rays + 0.01,         # best head
        target_rays + 0.2,          # mediocre head
    ]).astype(np.float32)
    loss, d = argmin_multihead_loss(
        jnp.asarray(rgb_heads), jnp.asarray(idx), jnp.zeros(3),
        jnp.asarray(target), {"mse": 1.0},
        cfg.multihead.argmin_cfg)
    assert int(d["best_head"]) == 1
    np.testing.assert_allclose(float(d["mse"]), 0.01 ** 2, rtol=1e-4)
    # unselected heads have zero weight by default -> total == best mse
    np.testing.assert_allclose(float(loss), 0.01 ** 2, rtol=1e-4)


def test_dataset_head_assignment(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from synthetic_data import write_synthetic_dataset
    from humannerf_tpu.data.datasets import Dataset
    path = write_synthetic_dataset(str(tmp_path / "ds"), n_frames=3, size=64)
    cfg = mh_cfg(1, split="random")
    cfg.patch.size, cfg.patch.N_patches = 8, 2
    ds = Dataset(cfg, path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=[0, 0, 0], seed=0)
    ids = [int(ds[i]["head_id"]) for i in range(3)]
    assert all(0 <= h < 3 for h in ids)
    cfg.multihead.split = "argmin"
    assert int(ds[0]["head_id"]) == -1
    cfg.multihead.split = "view"
    assert int(ds[0]["head_id"]) == 0  # single synthetic view
