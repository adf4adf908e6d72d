"""RGB-history dynamic appearance features.

Covers the reference's history-feature pipeline (rgb_feature.py:17-83 +
network.py:526-551): warp canonical foreground points forward into each
history frame (forward LBS), project into every history camera, gather
frozen CNN features at those pixels, spatially project + view-average +
temporally encode into a per-sample appearance code fed to the canonical MLP.

TPU-first restructuring: the reference deduplicates queried pixels with a
scatter/cumsum (dynamic shapes, rgb_feature.py:60-72) and runs only
foreground samples; here every sample gathers directly (static shapes) and
background samples are masked to zero -- the gather is row-wise over the
channel dimension, the same latency class as the fused-warp lookup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.models.init import GAIN_RELU, linear_params
from humannerf_tpu.models.mlps import _dense
from humannerf_tpu.models.resnet import (init_resnet34_params,
                                         normalize_imagenet,
                                         resnet34_features)


def init_rgb_history(key, *, layer: int = 6, spatial_dim: int = 32,
                     temporal_dim: int = 32, last_num: int = 1,
                     feature_dim: int | None = None):
    from humannerf_tpu.models.resnet import LAYER2DIM
    feat_dim = feature_dim or LAYER2DIM[layer]
    k1, k2 = jax.random.split(key)
    return {
        "backbone": init_resnet34_params(layer),
        "spatial_proj": linear_params(k1, feat_dim, spatial_dim, GAIN_RELU),
        "temporal_encoder": linear_params(k2, spatial_dim * last_num,
                                          temporal_dim, GAIN_RELU),
    }


def compute_history_feature_maps(params, rgb_history: jnp.ndarray):
    """(T, V, H, W, 3) history images -> (T, V, C, h, w) frozen features."""
    T, V = rgb_history.shape[:2]
    x = normalize_imagenet(rgb_history.reshape((-1,) + rgb_history.shape[2:]))
    feats = jax.lax.stop_gradient(
        resnet34_features(params["backbone"], x))
    return feats.reshape((T, V) + feats.shape[1:])


def gather_history_features(params, feat_maps: jnp.ndarray,
                            uvs: jnp.ndarray, fg_mask: jnp.ndarray,
                            img_hw: tuple[int, int],
                            dtype=jnp.float32) -> jnp.ndarray:
    """Gather + encode history features per sample.

    Args:
      feat_maps: (T, V, C, h, w).
      uvs: (N, T, V, 2) integer pixel coords (u=x, v=y) in the source image.
      fg_mask: (N, 1) foreground likelihood (samples below threshold get 0,
        matching the reference's fg gating at network.py:528-551).
      img_hw: source image size (H0, W0) the uvs refer to.

    Returns: (N, temporal_dim).
    """
    T, V, C, h, w = feat_maps.shape
    H0, W0 = img_hw
    scale_h, scale_w = H0 // h, W0 // w
    u = jnp.clip(uvs[..., 0] // scale_w, 0, w - 1)        # (N, T, V)
    v = jnp.clip(uvs[..., 1] // scale_h, 0, h - 1)
    valid = ((uvs[..., 0] >= 0) & (uvs[..., 0] < W0)
             & (uvs[..., 1] >= 0) & (uvs[..., 1] < H0))

    rows = feat_maps.transpose(0, 1, 3, 4, 2).reshape(-1, C)  # (T*V*h*w, C)
    tv = jnp.arange(T * V).reshape(T, V)
    flat = (tv[None] * (h * w) + v * w + u).astype(jnp.int32)  # (N, T, V)
    gathered = rows[flat] * valid[..., None]               # (N, T, V, C)

    spatial = jax.nn.relu(_dense(params["spatial_proj"], gathered, dtype))
    spatial = jnp.mean(spatial, axis=2)                    # view avg (N, T, S)
    flat_t = spatial.reshape(spatial.shape[0], -1)         # (N, T*S)
    out = jax.nn.relu(_dense(params["temporal_encoder"], flat_t, dtype))
    fg = (fg_mask > 0.1).astype(out.dtype)
    return out * fg
