"""Motion-weight volume decoder.

A learned constant embedding decoded by a stack of stride-2 transposed 3D
convolutions into the (bones+1, 32^3) backward-skinning weight volume, with
the Gaussian bone prior folded in through a log-space softmax.

Reference: mweight_vol_decoders/deconv_vol_decoder.py:8-33 and
ConvDecoder3D (core/utils/network_util.py:12-50). Channel progression for
volume_size=32: 1024 -> 512 -> 512 -> 256 -> 256 -> bones+1, spatial
1 -> 2 -> 4 -> 8 -> 16 -> 32, LeakyReLU(0.2) between layers.

TPU note: transposed convs are expressed as input-dilated forward convs
(lhs_dilation), which XLA maps onto the MXU directly. Weights are stored in
torch ConvTranspose3d layout (I, O, kD, kH, kW) for checkpoint-conversion
parity and reshaped at trace time.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from humannerf_tpu.models.init import (GAIN_LEAKY_RELU_02, GAIN_LINEAR,
                                       conv_transpose3d_params, linear_params)


def _decoder_channels(volume_size: int, voxel_channels: int):
    """Replicates ConvDecoder3D's channel schedule (network_util.py:26-40)."""
    chans = []
    c_in, c_out = 1024, 512
    for _ in range(int(math.log2(volume_size)) - 1):
        chans.append((c_in, c_out))
        if c_in == c_out:
            c_out = c_in // 2
        else:
            c_in = c_out
    chans.append((c_in, voxel_channels))
    return chans


def init_mweight_decoder(key, *, embedding_size: int = 256,
                         volume_size: int = 32, total_bones: int = 24):
    keys = iter(jax.random.split(key, 32))
    params = {
        "const_embedding": jax.random.normal(next(keys), (embedding_size,),
                                             jnp.float32),
        "block_mlp": linear_params(next(keys), embedding_size, 1024,
                                   GAIN_LEAKY_RELU_02),
    }
    chans = _decoder_channels(volume_size, total_bones + 1)
    convs = []
    for i, (c_in, c_out) in enumerate(chans):
        gain = GAIN_LINEAR if i == len(chans) - 1 else GAIN_LEAKY_RELU_02
        convs.append(conv_transpose3d_params(next(keys), c_in, c_out, gain=gain))
    params["block_conv"] = convs
    return params


def _conv_transpose3d(x, w_torch, b, *, stride: int = 2, kernel: int = 4,
                      pad: int = 1):
    """ConvTranspose3d(k, s, p) == Conv3d(input dilated by s, kernel flipped
    and in/out swapped, padding k-1-p). x: (N, C, D, H, W)."""
    w = jnp.flip(w_torch, axis=(2, 3, 4)).transpose(1, 0, 2, 3, 4)  # (O,I,k,k,k)
    eff_pad = kernel - 1 - pad
    # output dtype matches operand dtype: a mixed bf16-in/f32-out conv breaks
    # the autodiff transpose rule (cotangent dtype mismatch); the MXU still
    # accumulates in f32 internally for bf16 operands
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1, 1),
        padding=[(eff_pad, eff_pad)] * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        precision=prec)
    return y + b[None, :, None, None, None]


def decode_mweight_volume(params, motion_weights_priors, *,
                          dtype=jnp.float32):
    """Decode the skinning-weight volume.

    Args:
      motion_weights_priors: (bones+1, D, H, W) normalized Gaussian prior.

    Returns:
      (bones+1, D, H, W) = softmax(decoded + log(prior)) over channels
      (deconv_vol_decoder.py:28-31). Zero-prior voxels yield log(0) = -inf
      and therefore exactly zero weight, matching torch.
    """
    emb = params["const_embedding"][None]                     # (1, E)
    h = jnp.dot(emb.astype(dtype), params["block_mlp"]["w"].astype(dtype),
                preferred_element_type=jnp.float32) + params["block_mlp"]["b"]
    h = jax.nn.leaky_relu(h, 0.2)
    x = h.reshape(1, 1024, 1, 1, 1)
    convs = params["block_conv"]
    for i, c in enumerate(convs):
        x = _conv_transpose3d(x.astype(dtype), c["w"].astype(dtype), c["b"])
        if i < len(convs) - 1:
            x = jax.nn.leaky_relu(x, 0.2)
    decoded = x[0]                                            # (C, D, H, W)
    logits = decoded + jnp.log(motion_weights_priors)
    return jax.nn.softmax(logits, axis=0)
