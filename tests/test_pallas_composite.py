"""Pallas compositing kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import numpy as np

from humannerf_tpu.ops.pallas_composite import composite_pallas
from humannerf_tpu.ops.raymarch import raw2outputs, sample_along_rays


def test_pallas_composite_matches_reference():
    rng = np.random.RandomState(0)
    R, S = 256, 32
    raw = rng.randn(R, S, 4).astype(np.float32)
    mask = rng.rand(R, S, 1).astype(np.float32)
    near = rng.uniform(1, 2, (R,)).astype(np.float32)
    far = near + 1.0
    z = np.asarray(sample_along_rays(near, far, S))
    rays_d = rng.randn(R, 3).astype(np.float32)
    bg = np.array([30.0, 90.0, 200.0], np.float32)

    want = raw2outputs(raw, mask, z, rays_d, bg)
    got = composite_pallas(raw, mask, z, rays_d, bg, block=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(want["rgb"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["alpha"]),
                               np.asarray(want["alpha"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(want["depth"]), rtol=1e-4,
                               atol=1e-4)


def test_pallas_composite_masked_rays_are_background():
    R, S = 128, 16
    raw = np.random.RandomState(1).randn(R, S, 4).astype(np.float32)
    mask = np.zeros((R, S, 1), np.float32)
    z = np.asarray(sample_along_rays(np.ones(R, np.float32),
                                     2 * np.ones(R, np.float32), S))
    bg = np.array([255.0, 0.0, 64.0], np.float32)
    out = composite_pallas(raw, mask, z, np.ones((R, 3), np.float32), bg,
                           block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.tile(bg / 255.0, (R, 1)), atol=1e-6)
