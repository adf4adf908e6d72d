"""Parameter initializers with exact reference parity.

The reference's init scheme (core/utils/network_util.py:163-291) encodes
"start as identity motion": xavier-uniform scaled by the gain of the
*following* activation, blockwise ConvTranspose3d init (equivalent to
nearest-neighbor upsampling at t=0), and tiny-uniform last layers for the
non-rigid / pose-refiner MLPs. Training correctness depends on these.

Linear params are stored as {'w': (in, out), 'b': (out,)} (JAX convention;
torch checkpoints convert with a transpose).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

GAIN_RELU = math.sqrt(2.0)
GAIN_LEAKY_RELU_02 = math.sqrt(2.0 / (1.0 + 0.2 ** 2))
GAIN_LINEAR = 1.0


def xavier_uniform_linear(key, fan_in: int, fan_out: int, gain: float):
    """Uniform(-a, a) with a = gain*sqrt(2/(in+out))*sqrt(3) (network_util.py:210-229)."""
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    bound = std * math.sqrt(3.0)
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32,
                              minval=-bound, maxval=bound)


def linear_params(key, fan_in: int, fan_out: int, gain: float):
    return {"w": xavier_uniform_linear(key, fan_in, fan_out, gain),
            "b": jnp.zeros((fan_out,), jnp.float32)}


def tiny_linear_params(key, fan_in: int, fan_out: int, init_val: float = 1e-5):
    """Last-layer init of non-rigid offset / pose refiner MLPs.

    Reference: mlp_offset.py:60-71, mlp_delta_body_pose.py:26-31.
    """
    return {"w": jax.random.uniform(key, (fan_in, fan_out), jnp.float32,
                                    minval=-init_val, maxval=init_val),
            "b": jnp.zeros((fan_out,), jnp.float32)}


def conv_transpose3d_params(key, c_in: int, c_out: int, kernel: int = 4,
                            stride: int = 2, gain: float = GAIN_LEAKY_RELU_02):
    """Blockwise-initialized ConvTranspose3d weights, torch layout (I, O, kD, kH, kW).

    std uses ksize = k^3 // s^3 (network_util.py:203-209). The blockwise copy
    (network_util.py:254-269) makes every stride-2 cell share one random
    value, i.e. the layer starts as nearest-neighbor upsampling: we sample a
    (k/s)^3 base block and repeat it.
    """
    ksize = kernel ** 3 // stride ** 3
    std = gain * math.sqrt(2.0 / ((c_in + c_out) * ksize))
    bound = std * math.sqrt(3.0)
    base = jax.random.uniform(
        key, (c_in, c_out, kernel // stride, kernel // stride, kernel // stride),
        jnp.float32, minval=-bound, maxval=bound)
    w = base
    for axis in (2, 3, 4):
        w = jnp.repeat(w, stride, axis=axis)
    return {"w": w, "b": jnp.zeros((c_out,), jnp.float32)}
