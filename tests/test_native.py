"""Native host-ops: build, parity with the numpy reference implementations."""

import numpy as np
import pytest

from humannerf_tpu.native import hostops
from humannerf_tpu.utils import camera


@pytest.fixture(scope="module")
def cam():
    K = np.array([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]], np.float64)
    R = camera.rodrigues(np.array([0.1, -0.2, 0.05])) \
        if hasattr(camera, "rodrigues") else np.eye(3)
    from humannerf_tpu.utils.body import rodrigues
    R = rodrigues(np.array([0.1, -0.2, 0.05])).astype(np.float64)
    T = np.array([0.1, -0.05, 3.0], np.float64)
    return K, R, T


def test_native_builds():
    assert hostops.available(), "g++ build of libhostops.so failed"


def test_rays_from_krt_parity(cam):
    K, R, T = cam
    H = W = 32
    o_np, d_np = camera.get_rays_from_KRT(H, W, K, R, T)
    o_c, d_c = hostops.get_rays_from_KRT(H, W, K, R, T)
    np.testing.assert_allclose(o_c, o_np, atol=1e-5)
    np.testing.assert_allclose(d_c, d_np, atol=1e-5)


def test_rays_intersect_bbox_parity(cam):
    K, R, T = cam
    H = W = 48
    o, d = camera.get_rays_from_KRT(H, W, K, R, T)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    # box in front of the camera (rays point roughly toward +z from ~-3)
    bounds = {"min_xyz": np.array([-1.5, -1.5, -1.0]),
              "max_xyz": np.array([1.5, 1.5, 1.0])}
    near_np, far_np, mask_np = camera.rays_intersect_3d_bbox(
        bounds, o.copy(), d.copy())
    near_c, far_c, mask_c = hostops.rays_intersect_3d_bbox(
        bounds, o.copy(), d.copy())
    assert mask_np.sum() > 100
    np.testing.assert_array_equal(mask_c, mask_np)
    np.testing.assert_allclose(near_c, near_np, atol=1e-4)
    np.testing.assert_allclose(far_c, far_np, atol=1e-4)


def test_composite_background():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 3).astype(np.float32) * 255
    mask = rng.rand(16, 16, 3).astype(np.float32)
    bg = np.array([10.0, 20.0, 30.0], np.float32)
    got = hostops.composite_background(img, mask, bg)
    want = mask * img + (1 - mask) * bg[None, None, :]
    np.testing.assert_allclose(got, want, atol=1e-4)
