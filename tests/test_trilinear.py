"""Parity tests: vectorized trilinear warp vs torch grid_sample.

The reference warp is 24 sequential F.grid_sample calls with
padding_mode='zeros', align_corners=True (network.py:407-415). Any
off-by-half-voxel error silently destroys quality, so we check against torch
exactly.
"""

import numpy as np
import pytest

from humannerf_tpu.ops.trilinear import (sample_motion_weights,
                                         trilinear_sample_per_channel)

torch = pytest.importorskip("torch")


def torch_grid_sample_per_channel(vol, coords):
    """Reference semantics: channel k sampled at coords[:, k, :]."""
    K = vol.shape[0]
    outs = []
    for k in range(K):
        v = torch.from_numpy(vol[k][None, None])          # (1,1,D,H,W)
        g = torch.from_numpy(coords[:, k, :][None, None, None])  # (1,1,1,N,3)
        w = torch.nn.functional.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=True)
        outs.append(w[0, 0, 0, 0, :].numpy())
    return np.stack(outs, axis=-1)                        # (N, K)


def test_trilinear_matches_torch_inside_and_outside():
    rng = np.random.RandomState(0)
    K, D, H, W = 5, 8, 7, 6
    vol = rng.randn(K, D, H, W).astype(np.float32)
    # coords straddle the boundary: some inside, some outside [-1, 1]
    coords = rng.uniform(-1.5, 1.5, size=(200, K, 3)).astype(np.float32)
    got = np.asarray(trilinear_sample_per_channel(vol, coords))
    want = torch_grid_sample_per_channel(vol, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trilinear_exact_at_voxel_centers():
    K, S = 2, 4
    vol = np.arange(K * S ** 3, dtype=np.float32).reshape(K, S, S, S)
    # voxel (z=1, y=2, x=3) in normalized coords with align_corners=True
    def norm(i):
        return 2.0 * i / (S - 1) - 1.0
    coords = np.array([[[norm(3), norm(2), norm(1)]] * K], np.float32)
    got = np.asarray(trilinear_sample_per_channel(vol, coords))
    want = np.stack([vol[k, 1, 2, 3] for k in range(K)])[None]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sample_motion_weights_identity_transform():
    rng = np.random.RandomState(1)
    K, S = 3, 8
    vol = rng.rand(K, S, S, S).astype(np.float32)
    pts = rng.uniform(-0.4, 0.4, size=(50, 3)).astype(np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    Ts = np.zeros((K, 3), np.float32)
    bbox_min = np.array([-1.0, -1.0, -1.0], np.float32)
    scale = np.array([1.0, 1.0, 1.0], np.float32)  # 2/(max-min) with max=1

    x_skel, fg, w = sample_motion_weights(vol, pts, Rs, Ts, bbox_min, scale)
    # identity bones: canonical point = weighted avg of identical positions = pts
    np.testing.assert_allclose(np.asarray(x_skel), pts, rtol=1e-4, atol=1e-5)
    assert np.asarray(fg).shape == (50, 1)
    # weights equal direct trilinear samples
    coords = np.repeat(pts[:, None, :], K, axis=1)
    want = torch_grid_sample_per_channel(vol, coords)
    np.testing.assert_allclose(np.asarray(w), want, rtol=1e-5, atol=1e-5)
