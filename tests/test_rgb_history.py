"""RGB-history feature pipeline: resnet trunk, gather correctness,
end-to-end network integration."""

import jax
import jax.numpy as jnp
import numpy as np

from humannerf_tpu.models.resnet import (init_resnet34_params,
                                         normalize_imagenet,
                                         resnet34_features)
from humannerf_tpu.models.rgb_history import (compute_history_feature_maps,
                                              gather_history_features,
                                              init_rgb_history)


def test_resnet34_shapes():
    params = init_resnet34_params(layer=6)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 64, 64)
                    .astype(np.float32))
    f = resnet34_features(params, x)
    assert f.shape == (1, 256, 4, 4)  # stride 16, 256ch at layer3
    params5 = init_resnet34_params(layer=5)
    f5 = resnet34_features(params5, x)
    assert f5.shape == (1, 128, 8, 8)


def test_gather_history_features_correct_pixels():
    T, V, C, h, w = 2, 3, 8, 4, 4
    H0 = W0 = 16  # scale 4
    rng = np.random.RandomState(0)
    feat_maps = jnp.asarray(rng.rand(T, V, C, h, w).astype(np.float32))
    params = {"spatial_proj": {"w": jnp.eye(C), "b": jnp.zeros(C)},
              "temporal_encoder": {"w": jnp.eye(C * T), "b": jnp.zeros(C * T)}}
    # point 0 -> pixel (u=5, v=9) -> cell (x=1, y=2)
    uvs = np.zeros((2, T, V, 2), np.int32)
    uvs[0, :, :, 0] = 5
    uvs[0, :, :, 1] = 9
    uvs[1] = -99  # out of bounds -> zero
    fg = np.ones((2, 1), np.float32)
    out = np.asarray(gather_history_features(
        params, feat_maps, jnp.asarray(uvs), jnp.asarray(fg), (H0, W0)))
    want_t0 = np.maximum(np.asarray(feat_maps)[0, :, :, 2, 1], 0).mean(axis=0)
    np.testing.assert_allclose(out[0, :C], np.maximum(want_t0, 0), atol=1e-5)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_network_with_rgb_history():
    from test_network import make_rays, make_synthetic_frame
    from humannerf_tpu.config import make_cfg
    from humannerf_tpu.models.network import HumanNeRF
    cfg = make_cfg(opts=[
        "N_samples", "4", "mweight_volume.volume_size", "16",
        "mweight_volume.embedding_size", "16", "warp.grid_size", "16",
        "canonical_mlp.mlp_width", "32", "canonical_mlp.mlp_depth", "4",
        "non_rigid_motion_mlp.mlp_width", "16",
        "non_rigid_motion_mlp.mlp_depth", "3",
        "non_rigid_motion_mlp.skips", "[]",
        "rgb_history.last_num", "2",
        "rgb_history.spatial_dim", "8", "rgb_history.temporal_dim", "8",
        "rgb_history.feature_cfg.layer", "5",
    ])
    net = HumanNeRF(cfg)
    params = net.init_params(jax.random.key(0))
    assert "rgb_feature" in params
    frame = dict(make_synthetic_frame())
    rng = np.random.RandomState(0)
    T, V = 2, 2
    frame["dst_Rs_history"] = jnp.tile(frame["dst_Rs"][None], (T, 1, 1, 1))
    frame["dst_Ts_history"] = jnp.tile(frame["dst_Ts"][None], (T, 1, 1))
    frame["dst_posevec_history"] = jnp.asarray(
        rng.rand(T, 69).astype(np.float32))
    w2c = np.zeros((T, V, 3, 4), np.float32)
    w2c[:, :, 0, 0] = w2c[:, :, 1, 1] = 60.0
    w2c[:, :, 0, 2] = w2c[:, :, 1, 2] = 32.0
    w2c[:, :, 2, 2] = 1.0
    w2c[:, :, 2, 3] = 3.0
    frame["w2c_history"] = jnp.asarray(w2c)
    frame["rgb_history"] = jnp.asarray(
        rng.rand(T, V, 64, 64, 3).astype(np.float32))
    out = net.render_rays(params, frame, make_rays(8), iter_val=1e7)
    assert out["rgb"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
