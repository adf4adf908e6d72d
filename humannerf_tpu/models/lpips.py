"""LPIPS perceptual metric/loss in JAX (VGG16 trunk + linear heads).

Re-implements the reference third_parties/lpips/lpips.py:23-129 (v0.1, net
='vgg'): input scaling layer, VGG16 features at relu{1_2,2_2,3_3,4_3,5_3},
unit-normalization, squared diffs, 1x1 "lin" calibration heads, spatial
average, sum over layers.

Weights:
  * lin heads: converted from the reference's vgg.pth by
    tools/convert_lpips_weights.py (torch-cpu is available offline).
  * VGG16 trunk: converted from a torchvision vgg16 checkpoint when one is
    supplied to the converter. When none is available (this image has no
    torchvision and no network egress), `init_lpips_params` falls back to a
    DETERMINISTIC He-initialized trunk: random-feature perceptual losses are
    a known-functional substitute for training (features are fixed, only
    their discriminativeness differs), but absolute LPIPS values then are
    not comparable to reference-published numbers -- swap in converted
    weights for metric parity.
"""

from __future__ import annotations

import logging
import math
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# VGG16 conv plan: (out_channels, layers_per_block). Feature taps are the
# last relu of each block (pretrained_networks.py vgg16 slices).
VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
CHNS = [64, 128, 256, 512, 512]

# the v0.1 input scaling layer (lpips.py:132-139)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_trunk_kind(weights_path: str | None = None) -> str:
    """'converted' when a converted VGG16 trunk file will be loaded,
    'random' when init_lpips_params will fall back to the deterministic
    random trunk (whose absolute LPIPS values are NOT comparable to
    published numbers)."""
    if (weights_path and weights_path != "empty"
            and os.path.isfile(weights_path)):
        return "converted"
    return "random"


def init_lpips_params(weights_path: str | None = None,
                      seed: int = 1234) -> dict:
    """Load converted weights, or build the deterministic random trunk."""
    if lpips_trunk_kind(weights_path) == "converted":
        with open(weights_path, "rb") as f:
            raw = pickle.load(f)
        return jax.tree.map(jnp.asarray, raw)

    logger.warning(
        "LPIPS VGG16 trunk weights not found (cfg.lpips.weights=%r): using "
        "the deterministic RANDOM trunk. Training still works (fixed random "
        "features), but reported LPIPS values are UNCALIBRATED and not "
        "comparable to published numbers -- convert real weights with "
        "tools/convert_lpips_weights.py for metric parity.", weights_path)
    rng = np.random.RandomState(seed)
    params = {"features": [], "lins": []}
    c_in = 3
    for c_out, n_layers in VGG_PLAN:
        block = []
        for _ in range(n_layers):
            fan_in = c_in * 9
            std = math.sqrt(2.0 / fan_in)
            block.append({
                "w": jnp.asarray(rng.randn(c_out, c_in, 3, 3).astype(np.float32)
                                 * std),
                "b": jnp.zeros((c_out,), jnp.float32),
            })
            c_in = c_out
        params["features"].append(block)
    for ch in CHNS:
        # uniform-positive lin heads so the random-trunk loss is a plain
        # normalized feature distance
        params["lins"].append({"w": jnp.full((1, ch, 1, 1), 1.0 / ch,
                                             jnp.float32)})
    # overlay the reference-trained lin heads: env override, else the
    # in-repo asset (LPIPS v0.1 vgg lins, BSD licensed, ~6KB)
    lin_path = os.environ.get("LPIPS_LIN_WEIGHTS", "")
    if not (lin_path and os.path.isfile(lin_path)):
        lin_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "assets", "lpips_v01_vgg_lins.pkl")
    if os.path.isfile(lin_path):
        with open(lin_path, "rb") as f:
            lins = pickle.load(f)
        params["lins"] = [{"w": jnp.asarray(w)} for w in lins]
    return params


def _conv3x3(x, p):
    # full f32 accumulation: 13 stacked convs amplify bf16-pass rounding,
    # and the LPIPS *metric* must be reproducible across backends
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return y + p["b"][None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def vgg_features(params, x):
    """x: (N, 3, H, W) scaled input -> list of feature maps.

    Stops before a pool would produce an empty map (inputs smaller than
    2^4: the torch reference simply crashes there), so the returned list
    may be shorter than 5 for tiny patches.
    """
    feats = []
    for bi, block in enumerate(params["features"]):
        if bi > 0:
            if min(x.shape[-2:]) < 2:
                break
            x = _maxpool2(x)
        for p in block:
            x = jax.nn.relu(_conv3x3(x, p))
        feats.append(x)
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params, in0, in1, layers=(0, 1, 2, 3, 4),
                   use_lins: bool = True):
    """LPIPS(in0, in1) for (N, 3, H, W) images in [-1, 1] -> (N,).

    Matches lpips.py:84-115 (spatial=False): per-layer normalized feature
    diffs through 1x1 lin heads, spatially averaged, summed over layers.
    """
    x0 = (in0 - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    x1 = (in1 - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    f0 = vgg_features(params, x0)
    f1 = vgg_features(params, x1)
    layers = [k for k in layers if k < len(f0)]
    total = 0.0
    for k in layers:
        d = (_normalize_tensor(f0[k]) - _normalize_tensor(f1[k])) ** 2
        if use_lins:
            d = jnp.sum(d * params["lins"][k]["w"][0][None], axis=1,
                        keepdims=True)
        else:
            d = jnp.sum(d, axis=1, keepdims=True)
        total = total + jnp.mean(d, axis=(1, 2, 3))
    return total


def scale_for_lpips(x):
    """[0,1] -> [-1,1] (trainer.py:40-41)."""
    return x * 2.0 - 1.0


def make_lpips_metric_fn(params, layers=(0, 1, 2, 3, 4)):
    """Returns lpips_fn(pred_hwc, target_hwc) -> float for MetricsWriter."""
    @jax.jit
    def _dist(a, b):
        return lpips_distance(params, a, b, layers=layers)

    def fn(pred, target):
        a = scale_for_lpips(jnp.asarray(pred, jnp.float32)
                            ).transpose(2, 0, 1)[None]
        b = scale_for_lpips(jnp.asarray(target, jnp.float32)
                            ).transpose(2, 0, 1)[None]
        return float(_dist(a, b)[0])
    return fn
