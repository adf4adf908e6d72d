"""Compositing parity vs an independent torch transcription of the reference
`_raw2outputs` (network.py:355-388)."""

import jax
import numpy as np
import pytest

from humannerf_tpu.ops.raymarch import (raw2outputs, sample_along_rays,
                                        stratified_sampling)

torch = pytest.importorskip("torch")


def torch_raw2outputs(raw, raw_mask, z_vals, rays_d, bgcolor):
    raw = torch.from_numpy(raw)
    raw_mask = torch.from_numpy(raw_mask)
    z_vals = torch.from_numpy(z_vals)
    rays_d = torch.from_numpy(rays_d)
    bgcolor = torch.from_numpy(bgcolor)

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], dim=-1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    alpha = 1.0 - torch.exp(-torch.relu(raw[..., 3]) * dists)
    alpha = alpha * raw_mask[:, :, 0]
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones(alpha.shape[0], 1), 1.0 - alpha + 1e-10],
                  dim=-1), dim=-1)[:, :-1]
    rgb_map = torch.sum(weights[..., None] * rgb, dim=-2)
    depth_map = torch.sum(weights * z_vals, dim=-1)
    acc_map = torch.sum(weights, dim=-1)
    rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bgcolor[None, :] / 255.0
    return (rgb_map.numpy(), acc_map.numpy(), depth_map.numpy(),
            weights.numpy())


def test_raw2outputs_matches_reference_math():
    rng = np.random.RandomState(0)
    R, S = 16, 32
    raw = rng.randn(R, S, 4).astype(np.float32)
    raw_mask = rng.rand(R, S, 1).astype(np.float32)
    near = rng.uniform(1, 2, (R,)).astype(np.float32)
    far = near + rng.uniform(1, 2, (R,)).astype(np.float32)
    z_vals = np.asarray(sample_along_rays(near, far, S))
    rays_d = rng.randn(R, 3).astype(np.float32)
    bgcolor = np.array([20.0, 120.0, 250.0], np.float32)

    out = raw2outputs(raw, raw_mask, z_vals, rays_d, bgcolor)
    want_rgb, want_acc, want_depth, want_w = torch_raw2outputs(
        raw, raw_mask, z_vals, rays_d, bgcolor)
    np.testing.assert_allclose(np.asarray(out["rgb"]), want_rgb, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]), want_acc, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), want_depth,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights_on_rays"]), want_w,
                               atol=2e-5)


def test_masked_rays_composite_to_background():
    """Zero fg-likelihood (padded / out-of-body rays) -> exact bg color."""
    R, S = 4, 8
    raw = np.random.RandomState(1).randn(R, S, 4).astype(np.float32)
    mask = np.zeros((R, S, 1), np.float32)
    z = np.asarray(sample_along_rays(np.ones(R, np.float32),
                                     2 * np.ones(R, np.float32), S))
    rays_d = np.ones((R, 3), np.float32)
    bg = np.array([255.0, 0.0, 128.0], np.float32)
    out = raw2outputs(raw, mask, z, rays_d, bg)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.tile(bg / 255.0, (R, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["alpha"]), 0.0, atol=1e-6)


def test_stratified_sampling_stays_in_bins():
    rng = jax.random.key(0)
    near = np.ones((8,), np.float32)
    far = 3 * np.ones((8,), np.float32)
    z = sample_along_rays(near, far, 16)
    zj = np.asarray(stratified_sampling(z, rng))
    z = np.asarray(z)
    assert (zj >= z[..., :1] - 1e-6).all() and (zj <= z[..., -1:] + 1e-6).all()
    assert (np.diff(zj, axis=-1) > -1e-5).all()


def test_argmax_readouts():
    R, S = 3, 5
    raw = np.zeros((R, S, 4), np.float32)
    raw[:, 2, 3] = 100.0  # huge density at sample 2
    mask = np.ones((R, S, 1), np.float32)
    z = np.asarray(sample_along_rays(np.ones(R, np.float32),
                                     2 * np.ones(R, np.float32), S))
    xyz = np.random.RandomState(0).randn(R, S, 3).astype(np.float32)
    out = raw2outputs(raw, mask, z, np.ones((R, 3), np.float32),
                      np.zeros(3, np.float32), xyz=xyz)
    np.testing.assert_allclose(np.asarray(out["cnl_xyz"]), xyz[:, 2], atol=1e-6)
