"""Parity of the fused pack+gather+einsum op whose backward scatters the
volume cotangent with the Pallas windowed one-hot MXU kernel
(ops/pallas_scatter.py) instead of XLA's scatter-add.

Forward must equal build_packed_volume + sample_packed_volume exactly;
the gradient tests are the substantive ones -- the backward runs the
Pallas kernel in interpret mode on CPU. Replaces hot-loop #2's transpose
(reference semantics: core/nets/human_nerf/network.py:407-425).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.ops import fused_warp, pallas_scatter

G = 16
BLK, WIN = 256, 64


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    N = 3000
    U = jnp.asarray(rng.randn(G, G, G, 16).astype(np.float32))
    # include out-of-range points (valid-mask path) and exact-corner hits
    pts = rng.uniform(-1.45, 1.45, (N, 3)).astype(np.float32)
    pts[:64] = np.round(pts[:64] * 4) / 4          # land on voxel corners
    omin = jnp.asarray([-1.2, -1.2, -1.2], jnp.float32)
    omax = jnp.asarray([1.2, 1.2, 1.2], jnp.float32)
    cot = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    cot_s = jnp.asarray(rng.randn(N, 1).astype(np.float32))
    return U, jnp.asarray(pts), omin, omax, cot, cot_s


def _ref_loss(U, pts, omin, omax, cot, cot_s):
    U8 = fused_warp.build_packed_volume(U)
    x, s, _ = fused_warp.sample_packed_volume(U8, pts, omin, omax)
    return jnp.sum(x * cot) + jnp.sum(s * cot_s)


def _new_loss(U, pts, omin, omax, cot, cot_s, dtype):
    x, s, _ = pallas_scatter.sample_packed_grad(
        U, pts, omin, omax, dtype=dtype, blk=BLK, window=WIN)
    return jnp.sum(x * cot) + jnp.sum(s * cot_s)


def test_forward_parity(setup):
    U, pts, omin, omax, _, _ = setup
    U8 = fused_warp.build_packed_volume(U)
    x_ref, s_ref, _ = fused_warp.sample_packed_volume(U8, pts, omin, omax)
    x, s, bw = pallas_scatter.sample_packed_grad(
        U, pts, omin, omax, blk=BLK, window=WIN)
    assert bw is None
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-6, atol=1e-6)


def test_grad_parity_f32(setup):
    U, pts, omin, omax, cot, cot_s = setup
    g_ref = jax.grad(_ref_loss, argnums=(0, 1))(U, pts, omin, omax,
                                                cot, cot_s)
    g_new = jax.grad(_new_loss, argnums=(0, 1))(U, pts, omin, omax,
                                                cot, cot_s, jnp.float32)
    for name, a, b in zip(("dU", "dpts"), g_ref, g_new):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5 * scale,
            err_msg=name)


def test_grad_parity_bf16(setup):
    """bf16 one-hot payloads: loose tolerance, same structure."""
    U, pts, omin, omax, cot, cot_s = setup
    g_ref = jax.grad(_ref_loss, argnums=(0, 1))(U, pts, omin, omax,
                                                cot, cot_s)
    g_new = jax.grad(_new_loss, argnums=(0, 1))(U, pts, omin, omax,
                                                cot, cot_s, jnp.bfloat16)
    dU_r, dU_n = np.asarray(g_ref[0]), np.asarray(g_new[0])
    scale = np.abs(dU_r).max()
    assert np.abs(dU_n - dU_r).max() / scale < 0.02
    # dpts path is computed in f32 regardless of the scatter dtype
    pscale = max(1e-3, float(jnp.max(jnp.abs(g_ref[1]))))
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               rtol=5e-5, atol=1e-5 * pscale)


def test_grad_padding_path(setup):
    """N not a multiple of blk exercises the max-key/zero-payload pad."""
    U, pts, omin, omax, cot, cot_s = setup
    n = BLK + 37
    args = (U, pts[:n], omin, omax, cot[:n], cot_s[:n])
    g_ref = jax.grad(_ref_loss, argnums=(0,))(*args)[0]
    g_new = jax.grad(
        lambda *a: _new_loss(*a, jnp.float32), argnums=(0,))(*args)[0]
    scale = max(1e-3, float(jnp.max(jnp.abs(g_ref))))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5 * scale)


def test_live_mask_fwd_and_grad(setup):
    """Contract: with a liveness mask, the op computes
    where(live, base, 0) -- forward AND gradients match the XLA autodiff
    of that same masked reference, for any mask (the band guarantee only
    makes the masking a no-op; the op must be exact regardless). The mask
    is shaped so whole sorted sample blocks go dead (the kernel-skip path)
    and N % blk != 0 exercises the shared dead/padding tail."""
    U, pts, omin, omax, cot, cot_s = setup
    n = 2 * BLK + 51
    rng = np.random.RandomState(3)
    live = jnp.asarray((rng.rand(n) < 0.35).astype(np.float32))

    def ref_loss(U, pts, cot, cot_s):
        U8 = fused_warp.build_packed_volume(U)
        x, s, _ = fused_warp.sample_packed_volume(U8, pts, omin, omax)
        x = jnp.where(live[:, None] > 0, x, 0.0)
        s = jnp.where(live[:, None] > 0, s, 0.0)
        return jnp.sum(x * cot) + jnp.sum(s * cot_s)

    def new_loss(U, pts, cot, cot_s):
        x, s, _ = pallas_scatter.sample_packed_grad(
            U, pts, omin, omax, dtype=jnp.float32, blk=BLK, window=WIN,
            live=live)
        return jnp.sum(x * cot) + jnp.sum(s * cot_s)

    args = (U, pts[:n], cot[:n], cot_s[:n])
    np.testing.assert_allclose(np.asarray(new_loss(*args)),
                               np.asarray(ref_loss(*args)), rtol=1e-5)
    g_ref = jax.grad(ref_loss, argnums=(0, 1))(*args)
    g_new = jax.grad(new_loss, argnums=(0, 1))(*args)
    for name, a, b in zip(("dU", "dpts"), g_ref, g_new):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5 * scale,
            err_msg=name)


def test_live_mask_fused_warp_parity(setup):
    """sample_packed_volume's live clamp: where(live, base, 0) exactly."""
    U, pts, omin, omax, _, _ = setup
    U8 = fused_warp.build_packed_volume(U)
    rng = np.random.RandomState(5)
    live = jnp.asarray(rng.rand(pts.shape[0]) < 0.5)
    x_b, s_b, _ = fused_warp.sample_packed_volume(U8, pts, omin, omax)
    x_m, s_m, _ = fused_warp.sample_packed_volume(U8, pts, omin, omax,
                                                  live=live)
    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(x_m[lv]), np.asarray(x_b[lv]))
    np.testing.assert_array_equal(np.asarray(s_m[lv]), np.asarray(s_b[lv]))
    assert float(jnp.abs(x_m[~lv]).max()) == 0.0
    assert float(jnp.abs(s_m[~lv]).max()) == 0.0


def test_train_path_grad_parity_end_to_end():
    """Wiring test: render_rays(train=True) routes through sample_packed_grad
    (ctx['scatter_U']) and its full-model gradients match the packed jnp
    path. Eval (train=False) must keep the packed path."""
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _small_cfg, _synthetic_inputs
    from humannerf_tpu.models.network import HumanNeRF

    def grads(use_scatter):
        cfg = _small_cfg(**{"dtype": "'float32'", "pallas.mlp": "False",
                            "pallas.resample": "False"})
        cfg.pallas.mlp_interpret = use_scatter   # enables interpret gates
        cfg.pallas.scatter = use_scatter
        net = HumanNeRF(cfg)
        params = net.init_params(jax.random.key(0))
        frame, rays = _synthetic_inputs(cfg, n_rays=24)
        if use_scatter:   # the gate must actually pick the scatter path
            ctx = net.prepare_frame(params, frame, jnp.asarray(1e7),
                                    train=True)
            assert "scatter_U" in ctx and "packed_volume" not in ctx
            ctx_eval = net.prepare_frame(params, frame, jnp.asarray(1e7))
            assert "packed_volume" in ctx_eval

        def loss(p):
            out = net.render_rays(p, frame, rays, jnp.asarray(1e7),
                                  jax.random.key(1), train=True)
            return jnp.sum(out["rgb"] ** 2)
        return jax.grad(loss)(params)

    g_ref = grads(False)
    g_out = grads(True)
    flat_ref, t1 = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_out, t2 = jax.tree_util.tree_flatten_with_path(g_out)
    assert t1 == t2
    for (path, a), (_, b) in zip(flat_ref, flat_out):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_mesh_sharded_scatter_grad_parity():
    """Ray-sharded mesh layout: render_block wraps sample_packed_grad in a
    shard_map manual region; loss and gradients must equal the
    single-device run (the shard_map transpose psums d(U))."""
    import sys
    import tempfile
    sys.path.insert(0, ".")
    from __graft_entry__ import (_small_cfg, _tiny_train_batch,
                                 _tiny_train_overrides)
    from humannerf_tpu.parallel import mesh as mesh_lib
    from humannerf_tpu.train.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    def run(n_dev):
        cfg = _small_cfg(**_tiny_train_overrides())
        cfg.dtype = "float32"   # layout parity, not bf16 noise
        cfg.pallas.mlp = False
        cfg.pallas.resample = False
        cfg.pallas.mlp_interpret = True   # enables interpret-mode gates
        cfg.pallas.scatter = True
        cfg.pallas.scatter_block = 64
        cfg.pallas.scatter_window = 32
        cfg.logdir = tempfile.mkdtemp()
        cfg.resume = False
        mesh = mesh_lib.make_mesh(n_dev)
        trainer = Trainer(cfg, mesh=mesh, log=lambda *a: None)
        db = mesh_lib.put_batch(_tiny_train_batch(cfg), mesh)
        loss, _aux = trainer._loss_fn(trainer.params, db, jax.random.key(0),
                                      jnp.asarray(1.0))
        grads = jax.jit(jax.grad(lambda p: trainer._loss_fn(
            p, db, jax.random.key(0), jnp.asarray(1.0))[0]))(trainer.params)
        return float(loss), jax.device_get(grads)

    loss_1, grads_1 = run(1)
    loss_8, grads_8 = run(8)
    np.testing.assert_allclose(loss_8, loss_1, rtol=5e-4)
    flat_1, t1 = jax.tree_util.tree_flatten_with_path(grads_1)
    flat_8, t2 = jax.tree_util.tree_flatten_with_path(grads_8)
    assert t1 == t2
    for (path, a), (_, b) in zip(flat_1, flat_8):
        scale = max(1e-3, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(path))


def test_scatter_grad_volume_vs_numpy():
    """The raw kernel against a literal numpy scatter-add oracle,
    including flat %% 8 == 7 keys (the odd-corner carry into row+1)."""
    rng = np.random.RandomState(3)
    N = 700
    # base corners have every axis <= G-2 (matching _fractional's clip)
    zyx = rng.randint(0, G - 1, (N, 3))
    zyx[:100, 2] = 7                                # force carry lanes
    flat = ((zyx[:, 0] * G + zyx[:, 1]) * G + zyx[:, 2]).astype(np.int32)
    dacc = rng.randn(N, 16).astype(np.float32)
    w8 = rng.rand(N, 8).astype(np.float32)
    out = pallas_scatter.scatter_grad_volume(
        jnp.asarray(flat), jnp.asarray(dacc), jnp.asarray(w8),
        grid_size=G, dtype=jnp.float32, blk=128, window=WIN,
        interpret=True)
    ref = np.zeros((G * G * G, 16), np.float32)
    for i in range(N):
        z, r = divmod(int(flat[i]), G * G)
        y, x = divmod(r, G)
        for k in range(8):
            dz, dy, dx = (k >> 2) & 1, (k >> 1) & 1, k & 1
            tgt = ((z + dz) * G + (y + dy)) * G + (x + dx)
            ref[tgt] += w8[i, k] * dacc[i]
    np.testing.assert_allclose(
        np.asarray(out).reshape(G * G * G, 16), ref, rtol=1e-5,
        atol=1e-5 * np.abs(ref).max())
