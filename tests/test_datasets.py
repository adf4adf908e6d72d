"""Data-layer tests over a synthetic preprocessed capture."""

import numpy as np
import pytest

from humannerf_tpu.config import make_cfg
from humannerf_tpu.data.datasets import Dataset, FreeviewDataset, TposeDataset
from humannerf_tpu.data.loader import Loader

from synthetic_data import write_synthetic_dataset


@pytest.fixture(scope="module")
def ds_path(tmp_path_factory):
    return write_synthetic_dataset(
        str(tmp_path_factory.mktemp("synth")), n_frames=4, size=128)


@pytest.fixture(scope="module")
def cfg():
    return make_cfg(opts=[
        "N_samples", "16", "patch.size", "8", "patch.N_patches", "2",
        "mweight_volume.volume_size", "16",
    ])


def test_patch_mode_fixed_shapes(ds_path, cfg):
    ds = Dataset(cfg, ds_path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=None, seed=0)
    item = ds[0]
    cap = cfg.patch.N_patches * cfg.patch.size ** 2
    assert item["rays_o"].shape == (cap, 3)
    assert item["rays_d"].shape == (cap, 3)
    assert item["near"].shape == (cap,)
    assert item["far"].shape == (cap,)
    assert item["target_patches"].shape == (2, 8, 8, 3)
    assert item["patch_ray_idx"].shape == (2, 8, 8)
    assert item["dst_Rs"].shape == (24, 3, 3)
    assert item["cnl_gtfms"].shape == (24, 4, 4)
    assert item["motion_weights_priors"].shape == (25, 16, 16, 16)
    assert item["dst_posevec"].shape == (69,)
    # gather map invariants
    idx = item["patch_ray_idx"]
    valid = idx[idx >= 0]
    assert len(np.unique(valid)) == len(valid)       # slots unique
    assert valid.max() < item["num_valid_rays"] <= cap
    # fixed shapes across items (critical: one jit compilation)
    item2 = ds[1]
    assert item2["rays_o"].shape == item["rays_o"].shape
    assert item2["target_patches"].shape == item["target_patches"].shape


def test_patch_pixels_reference_correct_rays(ds_path, cfg):
    """Gathered ray target colors must equal the patch target pixels."""
    ds = Dataset(cfg, ds_path, keyfilter=cfg.train_keyfilter + ["target_rgbs"],
                 ray_shoot_mode="image", bgcolor=[0, 0, 0], seed=1)
    # use image mode to get full per-ray colors, then re-run patch logic
    item = ds[0]
    H, W = item["img_height"], item["img_width"]
    img = item["raw_rgbs"]
    sel, targets, patch_ray_idx, n_valid = ds.sample_patch_rays(
        img, H, W, np.ones((H, W), bool), item["ray_mask"])
    ray_img = img.reshape(-1, 3)[item["ray_mask"]]
    gathered = ray_img[sel]                          # (n_valid, 3)
    for p in range(targets.shape[0]):
        m = patch_ray_idx[p] >= 0
        np.testing.assert_allclose(
            targets[p][m], gathered[patch_ray_idx[p][m]], atol=1e-6)


def test_image_mode(ds_path, cfg):
    ds = Dataset(cfg, ds_path, keyfilter=cfg.test_keyfilter,
                 ray_shoot_mode="image", bgcolor=[255, 255, 255], seed=0)
    item = ds[0]
    n = item["rays_o"].shape[0]
    assert item["ray_mask"].sum() == n
    assert item["target_rgbs"].shape == (n, 3)
    assert item["near"].shape == (n,)
    assert n > 0


def test_tpose_dataset(ds_path, cfg):
    ds = TposeDataset(cfg, ds_path, keyfilter=cfg.test_keyfilter,
                      total_frames=4)
    item = ds[1]
    assert item["img_width"] == 512
    assert item["rays_o"].shape[0] == item["ray_mask"].sum()
    assert item["dst_Rs"].shape == (24, 3, 3)
    # root rotated between frames
    i0, i2 = ds[0], ds[2]
    assert not np.allclose(i0["dst_Rs"][0], i2["dst_Rs"][0], atol=1e-3)


def test_freeview_dataset(ds_path, cfg):
    # src_type 'wild' orbits about y; the synthetic camera sits on the z
    # axis, so a y-orbit moves it (a z-orbit would be a fixed point).
    ds = FreeviewDataset(cfg, ds_path, keyfilter=cfg.test_keyfilter,
                         frame_idx=0, total_frames=6, src_type="wild")
    i0, i3 = ds[0], ds[3]
    assert i0["rays_o"].shape[-1] == 3
    assert "rays_d_camera" in i0          # the fixed fork bug
    # camera moved between orbit frames
    assert not np.allclose(i0["rays_o"][0], i3["rays_o"][0], atol=1e-3)


def test_loader_shuffle_and_prefetch(ds_path, cfg):
    ds = Dataset(cfg, ds_path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=[0, 0, 0], seed=0)
    loader = Loader(ds, shuffle=True, seed=0, prefetch=2)
    items = list(loader)
    assert len(items) == 4
    names = [i["frame_name"] for i in items]
    assert sorted(names) == sorted(ds.framelist)


def test_random_bgcolor_applied(ds_path, cfg):
    ds = Dataset(cfg, ds_path, keyfilter=cfg.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=None, seed=7)
    a = ds[0]["bgcolor"]
    b = ds[0]["bgcolor"]
    assert a.shape == (3,)
    assert not np.allclose(a, b)  # fresh random bg per item (train.py:542-545)


def test_host_cache_parity(ds_path):
    """Cached and uncached batches are bitwise identical at the same seed
    (the decode / ray-intersect caches hold deterministic per-frame work)."""
    def batches(cache):
        opts = ["N_samples", "16", "patch.size", "8", "patch.N_patches", "2",
                "mweight_volume.volume_size", "16"]
        if not cache:
            opts += ["host_cache.decoded", "0", "host_cache.isect", "0"]
        c = make_cfg(opts=opts)
        ds = Dataset(c, ds_path, keyfilter=c.train_keyfilter,
                     ray_shoot_mode="patch", bgcolor=None, seed=7)
        # two epochs: the second pass hits the warm cache
        return [ds[i % len(ds)] for i in range(2 * len(ds))]

    for a, b in zip(batches(True), batches(False)):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_host_cache_entries_frozen(ds_path):
    """Cache consumers must copy-on-write: cached arrays are read-only."""
    c = make_cfg(opts=["N_samples", "16", "patch.size", "8",
                       "patch.N_patches", "2",
                       "mweight_volume.volume_size", "16"])
    ds = Dataset(c, ds_path, keyfilter=c.train_keyfilter,
                 ray_shoot_mode="patch", bgcolor=None, seed=0)
    ds[0]; ds[0]
    img, mask = ds._decode_frame(ds.framelist[0])
    assert not img.flags.writeable and not mask.flags.writeable
    cached = ds._isect_cache.get(ds.framelist[0])
    assert cached is not None
    assert all(not a.flags.writeable for a in cached if a is not None)
