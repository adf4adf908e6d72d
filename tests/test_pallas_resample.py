"""Parity of the hybrid resample op (einsum fwd + Pallas bwd) vs the
plain einsum path. The gradient test is the substantive one -- the
backward runs the Pallas kernel in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.ops import fused_warp, pallas_resample


@pytest.fixture(scope="module")
def setup():
    K, D = 6, 8
    G = 12
    rng = np.random.RandomState(0)
    vols = jnp.asarray(rng.rand(K, D, D, D).astype(np.float32))
    # small rotations + translations
    Rs = []
    for k in range(K):
        a = rng.uniform(-0.3, 0.3)
        c, s = np.cos(a), np.sin(a)
        Rs.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
                  * rng.uniform(0.8, 1.2))
    Rs = jnp.asarray(np.stack(Rs))
    Ts = jnp.asarray(rng.uniform(-0.2, 0.2, (K, 3)).astype(np.float32))
    cnl_min = jnp.asarray([-1.0, -1.1, -0.9], jnp.float32)
    cnl_scale = jnp.asarray([1.0, 0.9, 1.1], jnp.float32)
    obs_min = jnp.asarray([-1.2, -1.2, -1.2], jnp.float32)
    obs_max = jnp.asarray([1.2, 1.3, 1.1], jnp.float32)
    return vols, Rs, Ts, cnl_min, cnl_scale, obs_min, obs_max, G


def _einsum_w(vols, Rs, Ts, cnl_min, cnl_scale, obs_min, obs_max, G, dtype):
    grid = fused_warp.make_obs_grid(obs_min, obs_max, G)
    ws = []
    for k in range(vols.shape[0]):
        pos = grid @ Rs[k].T + Ts[k]
        ws.append(fused_warp.resample_bone_weights(
            vols[k], pos, cnl_min, cnl_scale, dtype))
    return jnp.stack(ws, axis=-1)


def test_forward_parity_f32(setup):
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    ref = _einsum_w(vols, Rs, Ts, cmin, cscale, omin, omax, G, jnp.float32)
    out = pallas_resample.resample_all_bones(
        vols, Rs, Ts, cmin, cscale, omin, omax, G, dtype=jnp.float32,
        blk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16(setup):
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    ref = _einsum_w(vols, Rs, Ts, cmin, cscale, omin, omax, G, jnp.bfloat16)
    out = pallas_resample.resample_all_bones(
        vols, Rs, Ts, cmin, cscale, omin, omax, G, dtype=jnp.bfloat16,
        blk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.03, atol=0.03)


def test_grad_parity(setup):
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    cot = jnp.asarray(
        np.random.RandomState(1).randn(G ** 3, vols.shape[0])
        .astype(np.float32))

    def loss_ref(v, R, T):
        return jnp.sum(_einsum_w(v, R, T, cmin, cscale, omin, omax, G,
                                 jnp.float32) * cot)

    def loss_out(v, R, T):
        return jnp.sum(pallas_resample.resample_all_bones(
            v, R, T, cmin, cscale, omin, omax, G, dtype=jnp.float32,
            blk=128) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(vols, Rs, Ts)
    g_out = jax.grad(loss_out, argnums=(0, 1, 2))(vols, Rs, Ts)
    for name, a, b in zip("vols Rs Ts".split(), g_ref, g_out):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4 * scale,
            err_msg=name)


def test_build_fused_volume_gate(setup):
    """build_fused_volume(pallas_resample=True) == einsum path."""
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    kw = dict(cnl_bbox_min_xyz=cmin, cnl_bbox_scale_xyz=cscale,
              obs_min=omin, obs_max=omax, grid_size=G, dtype=jnp.float32)
    U_ref = fused_warp.build_fused_volume(vols, Rs, Ts, **kw)
    U_out = fused_warp.build_fused_volume(vols, Rs, Ts,
                                          pallas_resample=True, **kw)
    np.testing.assert_allclose(np.asarray(U_out), np.asarray(U_ref),
                               rtol=1e-5, atol=1e-5)