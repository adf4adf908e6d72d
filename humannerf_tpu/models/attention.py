"""Attention building blocks (torch-compatible math, explicit params).

Implements the pieces the reference builds from torch.nn: MultiheadAttention
(qkv in-proj + out-proj), post-LN TransformerEncoderLayer / Encoder stacks,
LayerNorm, and train-time dropout. Passing `rng=None` (the default) gives
torch eval() semantics -- dropout off; the trainer threads a PRNG key so the
reference's attention dropout (MultiheadAttention dropout=0.2 in
selfattention.py:65 / mlp_offset_SA.py:44, TransformerEncoderLayer default
0.1) is active during training only.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from humannerf_tpu.models.init import GAIN_LINEAR, GAIN_RELU, linear_params
from humannerf_tpu.models.mlps import _dense


def dropout(rng, rate: float, x):
    """Inverted dropout (torch semantics). rng=None or rate<=0 -> identity."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def apply_layer_norm(p, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def init_mha(key, dim: int, num_heads: int = 1):
    """torch MultiheadAttention layout: packed qkv in-proj + out-proj."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(dim)
    return {
        "in_proj": {"w": jax.random.uniform(k1, (dim, 3 * dim), jnp.float32,
                                            -bound, bound),
                    "b": jnp.zeros((3 * dim,), jnp.float32)},
        "out_proj": {"w": jax.random.uniform(k2, (dim, dim), jnp.float32,
                                             -bound, bound),
                     "b": jnp.zeros((dim,), jnp.float32)},
        "num_heads": num_heads,
    }


def apply_mha(p, query, key, value, dtype=jnp.float32, *,
              dropout_rate: float = 0.0, rng=None):
    """Self/cross attention over (..., T, D). num_heads from params.
    Dropout lands on the softmaxed attention weights (torch MHA)."""
    D = query.shape[-1]
    H = int(p["num_heads"])
    dh = D // H
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    qkv_w = p["in_proj"]["w"]
    qkv_b = p["in_proj"]["b"]
    q = jnp.dot(query, qkv_w[:, :D], precision=prec) + qkv_b[:D]
    k = jnp.dot(key, qkv_w[:, D:2 * D], precision=prec) + qkv_b[D:2 * D]
    v = jnp.dot(value, qkv_w[:, 2 * D:], precision=prec) + qkv_b[2 * D:]

    def split(x):
        return x.reshape(x.shape[:-1] + (H, dh)).swapaxes(-2, -3)  # (...,H,T,dh)
    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("...td,...sd->...ts", qh, kh,
                        precision=prec) / math.sqrt(dh)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = dropout(rng, dropout_rate, attn)
    out = jnp.einsum("...ts,...sd->...td", attn, vh, precision=prec)
    out = out.swapaxes(-2, -3).reshape(query.shape[:-1] + (D,))
    return _dense(p["out_proj"], out, dtype), attn


def init_transformer_encoder_layer(key, d_model: int, nhead: int,
                                   dim_feedforward: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mha": init_mha(k1, d_model, nhead),
        "ff1": linear_params(k2, d_model, dim_feedforward, GAIN_RELU),
        "ff2": linear_params(k3, dim_feedforward, d_model, GAIN_LINEAR),
        "norm1": init_layer_norm(d_model),
        "norm2": init_layer_norm(d_model),
    }


def apply_transformer_encoder_layer(p, x, dtype=jnp.float32, *,
                                    dropout_rate: float = 0.0, rng=None):
    """torch default post-LN layer: x = LN(x + SA(x)); x = LN(x + FFN(x)).

    Dropout sites match torch TransformerEncoderLayer (default p=0.1): on
    attention weights, after the SA output, after the FFN activation, and
    after the second FFN linear."""
    ks = jax.random.split(rng, 4) if rng is not None else (None,) * 4
    sa, _ = apply_mha(p["mha"], x, x, x, dtype,
                      dropout_rate=dropout_rate, rng=ks[0])
    x = apply_layer_norm(p["norm1"], x + dropout(ks[1], dropout_rate, sa))
    h = dropout(ks[2], dropout_rate,
                jax.nn.relu(_dense(p["ff1"], x, dtype)))
    ff = dropout(ks[3], dropout_rate, _dense(p["ff2"], h, dtype))
    return apply_layer_norm(p["norm2"], x + ff)


def init_transformer_encoder(key, d_model: int, nhead: int,
                             dim_feedforward: int, num_layers: int):
    keys = jax.random.split(key, num_layers)
    return {
        "layers": [init_transformer_encoder_layer(k, d_model, nhead,
                                                  dim_feedforward)
                   for k in keys],
        "norm": init_layer_norm(d_model),
    }


def apply_transformer_encoder(p, x, dtype=jnp.float32, *,
                              dropout_rate: float = 0.0, rng=None):
    for i, layer in enumerate(p["layers"]):
        k = jax.random.fold_in(rng, i) if rng is not None else None
        x = apply_transformer_encoder_layer(layer, x, dtype,
                                            dropout_rate=dropout_rate, rng=k)
    return apply_layer_norm(p["norm"], x)


def transformer_sine_pe(positions: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """'transformer' frequency PE (reference fourier.py:26-32): interleaved
    sin/cos with freqs exp(-log(10000) * 2i / d)."""
    freqs = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                    * (-math.log(10000.0) / d_model))
    args = positions[..., None] * freqs
    out = jnp.stack([jnp.sin(args), jnp.cos(args)], axis=-1)
    return out.reshape(positions.shape + (-1,))
