"""ResNet-34 feature trunk in JAX (for RGB-history features).

The reference uses a frozen torchvision resnet34 truncated at children()
index `layer` (rgb_feature.py:17-33): layer 6 = through layer3, 256
channels at stride 16. Weights convert from a torchvision state_dict via
tools/convert_resnet_weights.py; without one (this image has no torchvision
and no egress) a DETERMINISTIC random trunk is used -- fixed random conv
features remain a usable (weaker) similarity descriptor; swap in converted
weights for reference parity. BatchNorm runs in eval mode (stored stats).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# torchvision children index -> (stage count, out channels, stride vs input)
LAYER2DIM = {-1: 3, 2: 64, 4: 64, 5: 128, 6: 256, 7: 512}
# resnet34 BasicBlock counts per stage
STAGE_BLOCKS = [3, 4, 6, 3]
STAGE_CHANNELS = [64, 128, 256, 512]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv_params(rng, c_in, c_out, k):
    std = math.sqrt(2.0 / (c_in * k * k))
    return {"w": rng.randn(c_out, c_in, k, k).astype(np.float32) * std}


def _bn_params(c):
    return {"scale": np.ones(c, np.float32), "bias": np.zeros(c, np.float32),
            "mean": np.zeros(c, np.float32), "var": np.ones(c, np.float32)}


def init_resnet34_params(layer: int = 6, seed: int = 4321) -> dict:
    """Deterministic random trunk up to torchvision children index `layer`."""
    rng = np.random.RandomState(seed)
    params = {"conv1": _conv_params(rng, 3, 64, 7), "bn1": _bn_params(64),
              "stages": []}
    n_stages = max(0, layer - 3)  # layer 4 -> stage1 only, ..., 7 -> all 4
    c_in = 64
    for s in range(n_stages):
        c_out = STAGE_CHANNELS[s]
        blocks = []
        for b in range(STAGE_BLOCKS[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            blk = {
                "conv1": _conv_params(rng, c_in if b == 0 else c_out, c_out, 3),
                "bn1": _bn_params(c_out),
                "conv2": _conv_params(rng, c_out, c_out, 3),
                "bn2": _bn_params(c_out),
                "stride": stride,
            }
            if b == 0 and (stride != 1 or c_in != c_out):
                blk["down_conv"] = _conv_params(rng, c_in, c_out, 1)
                blk["down_bn"] = _bn_params(c_out)
            blocks.append(blk)
        params["stages"].append(blocks)
        c_in = c_out
    # leave leaves as numpy (jax consumes them directly); 'stride' must stay
    # a static python int
    return params


def _conv(x, p, stride=1, pad=None):
    k = p["w"].shape[-1]
    if pad is None:
        pad = k // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return ((x - p["mean"][None, :, None, None])
            * (inv * p["scale"])[None, :, None, None]
            + p["bias"][None, :, None, None])


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])


def resnet34_features(params, x):
    """x: (N, 3, H, W) ImageNet-normalized -> feature map (N, C, h, w)."""
    x = jax.nn.relu(_bn(_conv(x, params["conv1"], stride=2, pad=3),
                        params["bn1"]))
    x = _maxpool3x3s2(x)
    for blocks in params["stages"]:
        for blk in blocks:
            identity = x
            y = jax.nn.relu(_bn(_conv(x, blk["conv1"], stride=blk["stride"]),
                                blk["bn1"]))
            y = _bn(_conv(y, blk["conv2"]), blk["bn2"])
            if "down_conv" in blk:
                identity = _bn(_conv(x, blk["down_conv"],
                                     stride=blk["stride"], pad=0),
                               blk["down_bn"])
            x = jax.nn.relu(y + identity)
    return x


def normalize_imagenet(img_hw3: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) in [0,1] -> normalized NCHW."""
    x = (img_hw3 - IMAGENET_MEAN) / IMAGENET_STD
    return jnp.moveaxis(x, -1, -3)
