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

def test_grad_parity_zero_cotangent_blocks(setup):
    """Blocks whose incoming cotangent is exactly zero are skipped by the
    backward kernel (liveness bitmask); parity must hold regardless."""
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    K = vols.shape[0]
    rng = np.random.RandomState(2)
    cot = rng.randn(G ** 3, K).astype(np.float32)
    blk = 64                          # divides G^3 = 1728 exactly
    cb = cot.reshape(-1, blk, K)
    cb[::2] = 0.0                     # every other block fully dead
    cb[3] = 0.0
    cot = jnp.asarray(cb.reshape(G ** 3, K))

    def loss_ref(v, R, T):
        return jnp.sum(_einsum_w(v, R, T, cmin, cscale, omin, omax, G,
                                 jnp.float32) * cot)

    def loss_out(v, R, T):
        return jnp.sum(pallas_resample.resample_all_bones(
            v, R, T, cmin, cscale, omin, omax, G, dtype=jnp.float32,
            blk=blk) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(vols, Rs, Ts)
    g_out = jax.grad(loss_out, argnums=(0, 1, 2))(vols, Rs, Ts)
    for name, a, b in zip("vols Rs Ts".split(), g_ref, g_out):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4 * scale,
            err_msg=name)


def _sparse_setup(setup):
    """Volumes with compact support (zeros outside a sub-box per bone)."""
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    K, D = vols.shape[0], vols.shape[1]
    rng = np.random.RandomState(3)
    v = np.zeros_like(np.asarray(vols))
    for k in range(K):
        z0, y0, x0 = rng.randint(0, D - 3, 3)
        v[k, z0:z0 + 3, y0:y0 + 3, x0:x0 + 3] = \
            rng.rand(3, 3, 3).astype(np.float32) + 0.1
    return (jnp.asarray(v), Rs, Ts, cmin, cscale, omin, omax, G)


def test_support_skip_dA_dT_exact(setup):
    """With support_skip, dA/dT match the unskipped backward exactly, and
    dvols matches on the support (the skipped entries land only on
    zero-weight voxels by construction)."""
    vols, Rs, Ts, cmin, cscale, omin, omax, G = _sparse_setup(setup)
    cot = jnp.asarray(
        np.random.RandomState(4).randn(G ** 3, vols.shape[0])
        .astype(np.float32))

    def loss(skip):
        def f(v, R, T):
            return jnp.sum(pallas_resample.resample_all_bones(
                v, R, T, cmin, cscale, omin, omax, G, dtype=jnp.float32,
                blk=128, support_skip=skip) * cot)
        return jax.grad(f, argnums=(0, 1, 2))(vols, Rs, Ts)

    g_skip = loss(True)
    g_full = loss(False)
    np.testing.assert_allclose(np.asarray(g_skip[1]), np.asarray(g_full[1]),
                               rtol=1e-6, atol=1e-6, err_msg="Rs")
    np.testing.assert_allclose(np.asarray(g_skip[2]), np.asarray(g_full[2]),
                               rtol=1e-6, atol=1e-6, err_msg="Ts")
    sup = np.asarray(vols) != 0
    np.testing.assert_allclose(np.asarray(g_skip[0])[sup],
                               np.asarray(g_full[0])[sup],
                               rtol=1e-6, atol=1e-6, err_msg="dvols@support")


def test_support_skip_exact_through_softmax(setup):
    """End-to-end exactness of the support skip in the production chain:
    motion weights = softmax(logits + log prior) with a compact-support
    prior. The softmax VJP multiplies each voxel's cotangent by its output
    (zero off-support), so parameter gradients are identical with and
    without the skip."""
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup
    K, D = vols.shape[0], vols.shape[1]
    rng = np.random.RandomState(5)
    prior = np.zeros((K + 1, D, D, D), np.float32)
    prior[-1] = 1.0                                   # bg everywhere
    for k in range(K):
        z0, y0, x0 = rng.randint(0, D - 4, 3)
        prior[k, z0:z0 + 4, y0:y0 + 4, x0:x0 + 4] = \
            rng.rand(4, 4, 4).astype(np.float32) + 0.05
    prior = jnp.asarray(prior)
    logits = jnp.asarray(rng.randn(K + 1, D, D, D).astype(np.float32))
    cot = jnp.asarray(rng.randn(G ** 3, K).astype(np.float32))

    def loss(lg, skip):
        w = jax.nn.softmax(
            lg + jnp.log(jnp.clip(prior, 1e-38)) +
            jnp.where(prior > 0, 0.0, -jnp.inf), axis=0)
        w = jnp.where(prior > 0, w, 0.0)
        return jnp.sum(pallas_resample.resample_all_bones(
            w[:-1], Rs, Ts, cmin, cscale, omin, omax, G,
            dtype=jnp.float32, blk=128, support_skip=skip) * cot)

    g_skip = jax.grad(lambda lg: loss(lg, True))(logits)
    g_full = jax.grad(lambda lg: loss(lg, False))(logits)
    np.testing.assert_allclose(np.asarray(g_skip), np.asarray(g_full),
                               rtol=1e-6, atol=1e-6)


# -- windowed backward (support windows, pallas_resample._DW) --------------


def _win_setup(scale=1.0, K=4, D=32, G=24, seed=7):
    """Production-size (32^3) volumes so the windowed path engages."""
    rng = np.random.RandomState(seed)
    vols = jnp.asarray(
        (rng.rand(K, D, D, D) * (rng.rand(K, D, D, D) > 0.3))
        .astype(np.float32))
    Rs = []
    for k in range(K):
        a = rng.uniform(-0.4, 0.4)
        c, s = np.cos(a), np.sin(a)
        Rs.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
                  * rng.uniform(0.8, 1.2) * scale)
    Rs = jnp.asarray(np.stack(Rs))
    Ts = jnp.asarray(rng.uniform(-0.2, 0.2, (K, 3)).astype(np.float32))
    cnl_min = jnp.asarray([-1.0, -1.1, -0.9], jnp.float32)
    cnl_scale = jnp.asarray([1.0, 0.9, 1.1], jnp.float32)
    obs_min = jnp.asarray([-1.2, -1.2, -1.2], jnp.float32)
    obs_max = jnp.asarray([1.2, 1.3, 1.1], jnp.float32)
    return vols, Rs, Ts, cnl_min, cnl_scale, obs_min, obs_max, G


def _bwd_both(setup_vals, blk=512):
    vols, Rs, Ts, cmin, cscale, omin, omax, G = setup_vals
    K, D = vols.shape[0], vols.shape[1]
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.randn(G ** 3, K).astype(np.float32))
    vols2d = vols.reshape(K, D, D * D)
    aff = jnp.concatenate(
        [Rs.reshape(K, 9), Ts, jnp.zeros((K, 4), jnp.float32)], axis=-1)
    step = (omax - omin) / (G - 1)
    bbox = jnp.concatenate(
        [cmin, cscale, omin, step, jnp.zeros(4, jnp.float32)]).reshape(1, 16)
    kw = dict(G=G, dims=(D, D, D), dtype_str="float32", blk=blk,
              support_skip=False, interpret=True)
    legacy = pallas_resample._bwd_call(vols2d, aff, bbox, g,
                                       windowed=False, **kw)
    win = pallas_resample._bwd_call(vols2d, aff, bbox, g,
                                    windowed=True, **kw)
    nblk = -(-G ** 3 // blk)
    tile = pallas_resample._tile_dims(G, blk)
    fit = pallas_resample._window_tables(aff, bbox, nblk, blk, G,
                                         (D, D, D), tile)[3]
    return legacy, win, np.asarray(fit)


def test_windowed_bwd_parity():
    """Windowed kernel == legacy kernel when every pair fits its window."""
    legacy, win, fit = _bwd_both(_win_setup(scale=1.0))
    assert fit.mean() == 1.0, "expected full fit at production-like scales"
    for name, a, b in zip(("dvols", "dA", "dT"), legacy, win):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_windowed_bwd_leftover_path():
    """Affines scaled far up make stencil ranges exceed the windows: the
    non-fitting pairs must route through the legacy leftover kernel and
    the split total must still equal the all-legacy result."""
    legacy, win, fit = _bwd_both(_win_setup(scale=4.0))
    assert fit.mean() < 1.0, "test needs at least one non-fitting pair"
    for name, a, b in zip(("dvols", "dA", "dT"), legacy, win):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_windowed_gate_small_volume():
    """D < _DW volumes fall back to the legacy kernel (gate, not crash)."""
    vals = _win_setup(D=8, G=12)
    legacy, win, _ = _bwd_both(vals, blk=128)
    for a, b in zip(legacy, win):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


def test_windowed_flag_api_parity():
    """resample_all_bones(windowed=False) == windowed=True gradients:
    the cfg pallas.resample_window escape hatch must not change results."""
    vols, Rs, Ts, cmin, cscale, omin, omax, G = _win_setup(K=3)
    rng = np.random.RandomState(11)
    cot = jnp.asarray(rng.randn(G ** 3, 3).astype(np.float32))

    def loss(v, windowed):
        return jnp.sum(pallas_resample.resample_all_bones(
            v, Rs, Ts, cmin, cscale, omin, omax, G, dtype=jnp.float32,
            blk=512, windowed=windowed) * cot)

    g_on = jax.grad(lambda v: loss(v, True))(vols)
    g_off = jax.grad(lambda v: loss(v, False))(vols)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=1e-5, atol=1e-5)
