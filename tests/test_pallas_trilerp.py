"""Parity of the transposed-layout eval sampler (ops/pallas_trilerp.py)
against fused_warp.sample_packed_volume (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.ops import fused_warp
from humannerf_tpu.ops.pallas_trilerp import sample_packed_volume_t


@pytest.fixture(scope="module")
def packed():
    K, D, G = 4, 8, 12
    rng = np.random.RandomState(0)
    vols = jnp.asarray(rng.rand(K, D, D, D).astype(np.float32))
    Rs = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)
                               * rng.uniform(0.8, 1.2) for _ in range(K)]))
    Ts = jnp.asarray(rng.uniform(-0.2, 0.2, (K, 3)).astype(np.float32))
    cnl_min = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)
    cnl_scale = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    obs_min = jnp.asarray([-1.1, -1.2, -1.0], jnp.float32)
    obs_max = jnp.asarray([1.2, 1.1, 1.3], jnp.float32)
    U = fused_warp.build_fused_volume(vols, Rs, Ts, cnl_min, cnl_scale,
                                      obs_min, obs_max, G, dtype=jnp.float32)
    return fused_warp.build_packed_volume(U), obs_min, obs_max


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_parity_vs_row_major(packed, dtype):
    U8, obs_min, obs_max = packed
    U8 = U8.astype(dtype)
    rng = np.random.RandomState(1)
    N = 512
    # include out-of-range points (validity masking parity)
    pts = rng.uniform(-1.6, 1.6, (N, 3)).astype(np.float32)
    x_ref, fg_ref, _ = fused_warp.sample_packed_volume(
        U8, jnp.asarray(pts), obs_min, obs_max)
    x_t, fg_t = sample_packed_volume_t(
        U8, jnp.asarray(pts.T), obs_min, obs_max, blk=128)
    np.testing.assert_allclose(np.asarray(x_t.T), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fg_t[0]),
                               np.asarray(fg_ref).reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_live_mask_parity(packed):
    """With a liveness mask, live samples match the unmasked run exactly
    and dead samples (including whole DMA-collapsed dead blocks) emit
    exactly (0, 0)."""
    U8, obs_min, obs_max = packed
    rng = np.random.RandomState(7)
    N, blk = 512, 128
    pts = rng.uniform(-1.4, 1.4, (N, 3)).astype(np.float32)
    x_base, fg_base = sample_packed_volume_t(
        U8, jnp.asarray(pts.T), obs_min, obs_max, blk=blk)
    live = rng.rand(N) < 0.6
    live[blk:2 * blk] = False            # one fully dead kernel block
    live[:blk] = True                    # one fully live kernel block
    x_m, fg_m = sample_packed_volume_t(
        U8, jnp.asarray(pts.T), obs_min, obs_max, blk=blk,
        live=jnp.asarray(live))
    np.testing.assert_allclose(np.asarray(x_m[:, live]),
                               np.asarray(x_base[:, live]),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(x_m[:, ~live]).max()) == 0.0
    assert float(jnp.abs(fg_m[:, ~live]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(fg_m[:, live]),
                               np.asarray(fg_base[:, live]),
                               rtol=1e-6, atol=1e-6)


def test_out_of_range_fg_zero(packed):
    U8, obs_min, obs_max = packed
    pts = np.full((128, 3), 9.0, np.float32)
    x_t, fg_t = sample_packed_volume_t(
        U8, jnp.asarray(pts.T), obs_min, obs_max, blk=128)
    assert float(jnp.abs(fg_t).max()) == 0.0
    assert float(jnp.abs(x_t).max()) == 0.0
