"""Analytic ray-band liveness (ops/liveness.py): the guarantee under test
is conservativeness -- a sample outside its ray's band must have fg == 0
exactly, through the REAL fused/packed volume chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.ops import fused_warp, liveness
from humannerf_tpu.ops.raymarch import sample_along_rays


@pytest.fixture(scope="module")
def world():
    K, D, G = 5, 16, 24
    rng = np.random.RandomState(0)
    vols = np.zeros((K, D, D, D), np.float32)
    for k in range(K):
        z0, y0, x0 = rng.randint(2, D - 6, 3)
        vols[k, z0:z0 + 4, y0:y0 + 4, x0:x0 + 4] = \
            rng.rand(4, 4, 4).astype(np.float32) + 0.05
    Rs = []
    for k in range(K):
        a = rng.uniform(-0.5, 0.5)
        c, s = np.cos(a), np.sin(a)
        Rs.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
                  * rng.uniform(0.7, 1.3))
    Rs = jnp.asarray(np.stack(Rs))
    Ts = jnp.asarray(rng.uniform(-0.3, 0.3, (K, 3)).astype(np.float32))
    cnl_min = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)
    cnl_scale = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    obs_min = jnp.asarray([-1.3, -1.3, -1.3], jnp.float32)
    obs_max = jnp.asarray([1.3, 1.3, 1.3], jnp.float32)
    U = fused_warp.build_fused_volume(
        jnp.asarray(vols), Rs, Ts, cnl_min, cnl_scale, obs_min, obs_max, G,
        dtype=jnp.float32)
    packed = fused_warp.build_packed_volume(U)
    return dict(vols=jnp.asarray(vols), Rs=Rs, Ts=Ts, cnl_min=cnl_min,
                cnl_scale=cnl_scale, obs_min=obs_min, obs_max=obs_max,
                G=G, packed=packed, dims=(D, D, D))


def _rays(world, R=256, seed=1):
    rng = np.random.RandomState(seed)
    # origins on a sphere shell, directions toward jittered volume points
    o = rng.randn(R, 3).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 4.0
    target = rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32)
    d = target - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    near = np.full((R,), 2.0, np.float32)
    far = np.full((R,), 7.0, np.float32)
    return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(near),
            jnp.asarray(far))


def test_band_conservative_fused(world):
    o, d, near, far = _rays(world)
    S = 64
    z = sample_along_rays(near, far, S)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    _, fg, _ = fused_warp.sample_packed_volume(
        world["packed"], pts.reshape(-1, 3), world["obs_min"],
        world["obs_max"])
    fg = np.asarray(fg).reshape(z.shape)

    sup_lo, sup_hi = liveness.bone_support_boxes(world["vols"])
    step = (world["obs_max"] - world["obs_min"]) / (world["G"] - 1)
    t0, t1 = liveness.ray_band_intervals(
        o, d, near, far, world["Rs"], world["Ts"], world["cnl_min"],
        world["cnl_scale"], world["dims"], sup_lo, sup_hi, obs_step=step)
    mask = np.asarray(liveness.sample_live_mask(z, t0, t1))

    outside_live = fg[~mask]
    assert outside_live.size == 0 or float(np.abs(outside_live).max()) == 0.0
    # the band must not be vacuous: some rays hit, and the mask culls
    live_frac = mask.mean()
    hit_frac = (np.asarray(t0) <= np.asarray(t1)).mean()
    assert hit_frac > 0.2
    assert live_frac < 0.9


def test_band_conservative_exact_warp(world):
    """Same guarantee through the exact (single-interpolation) warp."""
    from humannerf_tpu.ops.trilinear import sample_motion_weights
    o, d, near, far = _rays(world, seed=3)
    S = 48
    z = sample_along_rays(near, far, S)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    _, fg, _ = sample_motion_weights(
        world["vols"], pts.reshape(-1, 3), world["Rs"], world["Ts"],
        world["cnl_min"], world["cnl_scale"])
    fg = np.asarray(fg).reshape(z.shape)

    sup_lo, sup_hi = liveness.bone_support_boxes(world["vols"])
    t0, t1 = liveness.ray_band_intervals(
        o, d, near, far, world["Rs"], world["Ts"], world["cnl_min"],
        world["cnl_scale"], world["dims"], sup_lo, sup_hi, obs_step=None)
    mask = np.asarray(liveness.sample_live_mask(z, t0, t1))
    outside_live = fg[~mask]
    assert outside_live.size == 0 or float(np.abs(outside_live).max()) == 0.0


def test_empty_support_bone_never_hits(world):
    sup_lo, sup_hi = liveness.bone_support_boxes(
        jnp.zeros((2, 8, 8, 8), jnp.float32))
    assert bool(jnp.all(sup_lo > sup_hi))
    o, d, near, far = _rays(world, seed=4)
    t0, t1 = liveness.ray_band_intervals(
        o, d, near, far, world["Rs"][:2] * 0 + jnp.eye(3),
        world["Ts"][:2] * 0, world["cnl_min"], world["cnl_scale"],
        (8, 8, 8), sup_lo, sup_hi)
    assert bool(jnp.all(t0 > t1))


def test_band_sort_keys_shape(world):
    o, d, near, far = _rays(world, seed=5)
    z = sample_along_rays(near, far, 32)
    sup_lo, sup_hi = liveness.bone_support_boxes(world["vols"])
    t0, t1 = liveness.ray_band_intervals(
        o, d, near, far, world["Rs"], world["Ts"], world["cnl_min"],
        world["cnl_scale"], world["dims"], sup_lo, sup_hi)
    keys = liveness.band_sort_keys(z, t0, t1)
    assert keys.shape == (o.shape[0],)
    # empty-band rays sort after every live ray
    live = np.asarray(t0 <= t1)
    k = np.asarray(keys)
    if live.any() and (~live).any():
        assert k[~live].min() > k[live].max()


def test_band_gather_train_grads_parity():
    """Full-model training gradients with the band-gather skip ON equal
    the OFF run exactly-ish (the bands only remove provably-zero work):
    exercises the sentinel-key dead tail in the Pallas scatter backward
    (ops/pallas_scatter.py) through render_rays(train=True)."""
    import jax

    from __graft_entry__ import _small_cfg, _synthetic_inputs
    from humannerf_tpu.models.network import HumanNeRF

    frac = {}

    def grads(band_gather):
        cfg = _small_cfg(**{"dtype": "'float32'"})
        cfg.pallas.mlp_interpret = True
        cfg.pallas.band_gather = band_gather
        net = HumanNeRF(cfg)
        params = net.init_params(jax.random.key(0))
        frame, rays = _synthetic_inputs(cfg, n_rays=64)
        if band_gather and "frac" not in frac:
            from humannerf_tpu.ops import liveness
            ctx = net.prepare_frame(params, frame, jnp.asarray(1e7),
                                    train=True)
            assert "band_sup_lo" in ctx
            z = sample_along_rays(rays["near"], rays["far"],
                                  int(cfg.N_samples))
            t0, t1 = liveness.ray_band_intervals(
                rays["rays_o"], rays["rays_d"], rays["near"], rays["far"],
                ctx["band_Rs"], ctx["band_Ts"], ctx["cnl_bbox_min_xyz"],
                ctx["cnl_bbox_scale_xyz"], ctx["band_dims"],
                ctx["band_sup_lo"], ctx["band_sup_hi"],
                obs_step=ctx["band_obs_step"])
            frac["frac"] = float(
                liveness.sample_live_mask(z, t0, t1).mean())

        def loss(p):
            out = net.render_rays(p, frame, rays, jnp.asarray(1e7),
                                  jax.random.key(1), train=True)
            return jnp.sum(out["rgb"] ** 2)
        return jax.grad(loss)(params)

    g_off = grads(False)
    g_on = grads(True)
    # the skip must have something to skip in this fixture
    assert frac["frac"] < 0.95
    flat_ref, t1 = jax.tree_util.tree_flatten_with_path(g_off)
    flat_out, t2 = jax.tree_util.tree_flatten_with_path(g_on)
    assert t1 == t2
    for (path, a), (_, b) in zip(flat_ref, flat_out):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_analytic_render_path_parity():
    """render_rays through the analytic-band fast path == the legacy
    fg-sorted path (same kernels, bijective reorder), interpret mode."""
    import jax

    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.models.network import HumanNeRF
    from __graft_entry__ import _synthetic_inputs

    R, S = 64, 32                     # N = 2048 tiles the fwd block
    base = ["N_samples", str(S), "mweight_volume.volume_size", "32",
            "pallas.mlp_interpret", "True", "warp.grid_size", "24"]
    cfg_a = make_cfg(opts=base + ["pallas.analytic_bands", "True"])
    cfg_l = make_cfg(opts=base + ["pallas.analytic_bands", "False"])
    net_a = HumanNeRF(cfg_a)
    net_l = HumanNeRF(cfg_l)
    params = net_a.init_params(jax.random.key(0))
    frame, rays = _synthetic_inputs(cfg_a, n_rays=R)
    iv = jnp.asarray(1e7)

    out_a = jax.jit(lambda p, f, r: net_a.render_rays(p, f, r, iv))(
        params, frame, rays)
    out_l = jax.jit(lambda p, f, r: net_l.render_rays(p, f, r, iv))(
        params, frame, rays)
    # the analytic path must actually be taken: its ctx carries the bands
    ctx = net_a.prepare_frame(params, frame, iv)
    assert "band_sup_lo" in ctx
    np.testing.assert_allclose(np.asarray(out_a["alpha"]),
                               np.asarray(out_l["alpha"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_a["rgb"]),
                               np.asarray(out_l["rgb"]),
                               rtol=2e-4, atol=2e-4)
