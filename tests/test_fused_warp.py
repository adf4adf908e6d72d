"""Fused frame-volume warp: agreement with the exact per-bone path.

The fused path (ops/fused_warp.py) trades one extra interpolation for a 24x
reduction in gather traffic; on a smooth weight field and a sufficiently
fine observation grid it must agree with the exact reference-parity warp.
"""

import jax
import jax.numpy as jnp
import numpy as np

from humannerf_tpu.ops.fused_warp import (build_fused_volume, make_obs_grid,
                                          resample_bone_weights,
                                          sample_fused_volume)
from humannerf_tpu.ops.trilinear import (sample_motion_weights,
                                         trilinear_sample_per_channel)
from humannerf_tpu.utils.body import rodrigues


def _smooth_volume(rng, K, S):
    """Band-limited positive weight volumes (like softmaxed bone fields)."""
    base = rng.rand(K, 8, 8, 8).astype(np.float32)
    z = jnp.asarray(base)
    for axis in (1, 2, 3):
        z = jnp.repeat(z, S // 8, axis=axis)
    # smooth by averaging neighbors a few times
    for _ in range(2):
        z = (z + jnp.roll(z, 1, 1) + jnp.roll(z, 1, 2) + jnp.roll(z, 1, 3)) / 4
    return np.asarray(z)


def _random_rigid(rng, K):
    Rs = rodrigues(rng.uniform(-0.3, 0.3, (K, 3)))
    Ts = rng.uniform(-0.05, 0.05, (K, 3)).astype(np.float32)
    return Rs, Ts


def test_resample_bone_matches_gather_trilerp():
    """MXU 2-hot einsum resample == gather-based trilerp (same semantics)."""
    rng = np.random.RandomState(0)
    vol = rng.rand(6, 10, 11, 12).astype(np.float32)
    pos = rng.uniform(-1.2, 1.2, (300, 3)).astype(np.float32)
    cnl_min = np.array([-1.0, -1.0, -1.0], np.float32)
    cnl_scale = np.array([1.0, 1.0, 1.0], np.float32)
    for k in range(3):
        got = np.asarray(resample_bone_weights(
            vol[k], pos, cnl_min, cnl_scale, dtype=jnp.float32))
        coords = (pos - cnl_min) * cnl_scale - 1.0
        want = np.asarray(trilinear_sample_per_channel(
            vol[k:k + 1], coords[:, None, :]))[:, 0]
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_matches_exact_on_smooth_field():
    rng = np.random.RandomState(1)
    K, S = 8, 16
    vol = _smooth_volume(rng, K, S)
    Rs, Ts = _random_rigid(rng, K)
    cnl_min = np.full(3, -1.0, np.float32)
    cnl_scale = np.full(3, 1.0, np.float32)  # bbox [-1, 1]
    obs_min = np.full(3, -0.8, np.float32)
    obs_max = np.full(3, 0.8, np.float32)

    U = build_fused_volume(jnp.asarray(vol), jnp.asarray(Rs), jnp.asarray(Ts),
                           cnl_min, cnl_scale, obs_min, obs_max,
                           grid_size=48, dtype=jnp.float32)
    pts = rng.uniform(-0.6, 0.6, (300, 3)).astype(np.float32)
    x_f, fg_f, _ = sample_fused_volume(U, pts, obs_min, obs_max)
    x_e, fg_e, _ = sample_motion_weights(jnp.asarray(vol), pts,
                                         jnp.asarray(Rs), jnp.asarray(Ts),
                                         cnl_min, cnl_scale)
    fg_e_np = np.asarray(fg_e)
    np.testing.assert_allclose(np.asarray(fg_f), fg_e_np, atol=0.03)
    # canonical positions agree where the body is present
    mask = fg_e_np[:, 0] > 0.3
    np.testing.assert_allclose(np.asarray(x_f)[mask], np.asarray(x_e)[mask],
                               atol=0.02)


def test_fused_bone_weights_channel():
    rng = np.random.RandomState(2)
    K, S = 24, 16
    vol = _smooth_volume(rng, K, S)
    Rs, Ts = _random_rigid(rng, K)
    cnl_min = np.full(3, -1.0, np.float32)
    cnl_scale = np.full(3, 1.0, np.float32)
    obs_min, obs_max = np.full(3, -0.8, np.float32), np.full(3, 0.8, np.float32)
    U = build_fused_volume(jnp.asarray(vol), jnp.asarray(Rs), jnp.asarray(Ts),
                           cnl_min, cnl_scale, obs_min, obs_max,
                           grid_size=32, include_bone_weights=True,
                           dtype=jnp.float32)
    assert U.shape[-1] == 16 + 24
    pts = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
    _, fg, bw = sample_fused_volume(U, pts, obs_min, obs_max)
    assert bw is not None and bw.shape == (100, 24)
    np.testing.assert_allclose(np.asarray(bw).sum(-1), np.asarray(fg)[:, 0],
                               atol=1e-3)


def test_outside_grid_is_background():
    rng = np.random.RandomState(3)
    vol = _smooth_volume(rng, 6, 16)
    Rs = np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))
    Ts = np.zeros((6, 3), np.float32)
    obs_min, obs_max = np.full(3, -0.5, np.float32), np.full(3, 0.5, np.float32)
    U = build_fused_volume(jnp.asarray(vol), Rs, Ts,
                           np.full(3, -1.0, np.float32),
                           np.full(3, 1.0, np.float32),
                           obs_min, obs_max, grid_size=32, dtype=jnp.float32)
    pts = np.array([[2.0, 2.0, 2.0], [-3.0, 0.0, 0.0]], np.float32)
    _, fg, _ = sample_fused_volume(U, pts, obs_min, obs_max)
    np.testing.assert_allclose(np.asarray(fg), 0.0, atol=1e-6)


def test_fused_volume_differentiable():
    rng = np.random.RandomState(4)
    vol = jnp.asarray(_smooth_volume(rng, 4, 16))
    Rs, Ts = _random_rigid(rng, 4)
    obs_min, obs_max = np.full(3, -0.8, np.float32), np.full(3, 0.8, np.float32)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (50, 3)).astype(np.float32))

    def loss(v):
        U = build_fused_volume(v, jnp.asarray(Rs), jnp.asarray(Ts),
                               np.full(3, -1.0, np.float32),
                               np.full(3, 1.0, np.float32),
                               obs_min, obs_max, grid_size=16,
                               dtype=jnp.float32)
        x, fg, _ = sample_fused_volume(U, pts, obs_min, obs_max)
        return jnp.sum(x ** 2) + jnp.sum(fg)

    g = jax.grad(loss)(vol)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_packed_matches_fused():
    from humannerf_tpu.ops.fused_warp import (build_packed_volume,
                                              sample_packed_volume)
    rng = np.random.RandomState(7)
    K, S = 8, 16
    vol = _smooth_volume(rng, K, S)
    Rs, Ts = _random_rigid(rng, K)
    cnl_min = np.full(3, -1.0, np.float32)
    cnl_scale = np.full(3, 1.0, np.float32)
    obs_min, obs_max = np.full(3, -0.8, np.float32), np.full(3, 0.8, np.float32)
    U = build_fused_volume(jnp.asarray(vol), jnp.asarray(Rs), jnp.asarray(Ts),
                           cnl_min, cnl_scale, obs_min, obs_max,
                           grid_size=24, dtype=jnp.float32)
    U8 = build_packed_volume(U)
    assert U8.shape == (24, 24, 24, 128)
    pts = rng.uniform(-0.7, 0.7, (300, 3)).astype(np.float32)
    x_a, fg_a, _ = sample_fused_volume(U, pts, obs_min, obs_max)
    x_b, fg_b, _ = sample_packed_volume(U8, pts, obs_min, obs_max)
    np.testing.assert_allclose(np.asarray(fg_b), np.asarray(fg_a), atol=1e-5)
    mask = np.asarray(fg_a)[:, 0] > 0.1   # x_skel only meaningful on-body
    np.testing.assert_allclose(np.asarray(x_b)[mask], np.asarray(x_a)[mask],
                               atol=1e-4)
    # fully outside the grid -> fg exactly 0
    far_pts = np.full((4, 3), 5.0, np.float32)
    _, fg_o, _ = sample_packed_volume(U8, far_pts, obs_min, obs_max)
    np.testing.assert_allclose(np.asarray(fg_o), 0.0)
