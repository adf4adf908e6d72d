"""Condition-code sequence encoders (temporal pose-condition codes).

Covers the reference's selfattention.py:8-86 (MlpSeq, SelfAttention with
learnable / sine / sine_fourier positional encodings) used as canonical-MLP
condition-code encoders (mlp_rgb_sigma.py:43-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.models.attention import (apply_mha, init_mha,
                                            transformer_sine_pe)
from humannerf_tpu.models.embedders import fourier_embed
from humannerf_tpu.models.init import (GAIN_LINEAR, GAIN_RELU, linear_params)
from humannerf_tpu.models.mlps import _dense


# -- MlpSeq -------------------------------------------------------------------

def init_mlpseq(key, *, input_dim: int, seq_len: int, hidden_dim: int,
                output_dim: int, non_linear: bool = True, depth: int = 1,
                **_):
    keys = iter(jax.random.split(key, depth + 2))
    gain = GAIN_RELU if non_linear else GAIN_LINEAR
    layers = [linear_params(next(keys), input_dim * seq_len, hidden_dim, gain)]
    for _i in range(1, depth):
        layers.append(linear_params(next(keys), hidden_dim, hidden_dim, gain))
    params = {"layers": layers, "non_linear": non_linear}
    if output_dim > 0:
        params["out"] = linear_params(next(keys), hidden_dim, output_dim,
                                      GAIN_LINEAR)
    return params


def apply_mlpseq(p, seq, dtype=jnp.float32):
    """(..., T, D) -> (..., out_dim): flatten the sequence, MLP."""
    x = seq.reshape(seq.shape[:-2] + (seq.shape[-1] * seq.shape[-2],))
    for lin in p["layers"]:
        x = _dense(lin, x, dtype)
        if p["non_linear"]:
            x = jax.nn.relu(x)
    if "out" in p:
        x = _dense(p["out"], x, dtype)
    return x


# -- SelfAttention -------------------------------------------------------------

def init_selfattention(key, *, input_dim: int, hidden_dim: int,
                       output_dim: int, positional_encoding_type: str,
                       max_length: int, pe_order: str = "after_fc",
                       pe_dim: int | None = None, in_proj: str = "fc-relu",
                       **_):
    keys = iter(jax.random.split(key, 8))
    params = {"pe_type": positional_encoding_type, "pe_order": pe_order,
              "max_length": max_length, "pe_dim": pe_dim}
    in_dim = input_dim
    if positional_encoding_type != "empty":
        if pe_order == "after_fc":
            params["pe_dim"] = hidden_dim
        else:  # before_fc: PE concatenated to the input
            in_dim = input_dim + pe_dim
    if positional_encoding_type == "learnable":
        params["pe_table"] = jax.random.normal(
            next(keys), (max_length, params["pe_dim"]), jnp.float32)

    if in_proj == "fc-relu":
        params["in_proj"] = [linear_params(next(keys), in_dim, hidden_dim,
                                           GAIN_RELU)]
    elif in_proj == "fc-relu-fc":
        params["in_proj"] = [
            linear_params(next(keys), in_dim, hidden_dim, GAIN_RELU),
            linear_params(next(keys), hidden_dim, hidden_dim, GAIN_LINEAR)]
    else:
        raise ValueError(in_proj)

    params["mha"] = init_mha(next(keys), hidden_dim, num_heads=1)
    params["out_proj"] = [
        linear_params(next(keys), hidden_dim, hidden_dim, GAIN_RELU),
        linear_params(next(keys), hidden_dim, output_dim, GAIN_LINEAR)]
    return params


def _positional_encoding(p, T):
    pe_type = p["pe_type"]
    ids = jnp.arange(T, dtype=jnp.float32)
    if pe_type == "learnable":
        return p["pe_table"][:T]
    if pe_type == "sine":
        return transformer_sine_pe(ids, p["pe_dim"])
    if pe_type == "sine_fourier":
        t = (ids / (p["max_length"] - 1))[:, None]
        return fourier_embed(t, p["pe_dim"] // 2, include_input=False)
    raise ValueError(pe_type)


def apply_selfattention(p, seq, dtype=jnp.float32, attention_on: bool = True,
                        rng=None):
    """(..., T, D) -> (..., out_dim): single-head SA over the sequence,
    output taken at position 0 (selfattention.py:68-86). rng != None
    enables the reference's train-time attention dropout 0.2
    (selfattention.py:65)."""
    T = seq.shape[-2]
    if p["pe_type"] != "empty" and p["pe_order"] == "before_fc":
        pe = jnp.broadcast_to(_positional_encoding(p, T),
                              seq.shape[:-1] + (p["pe_dim"],))
        x = jnp.concatenate([seq, pe], axis=-1)
        for i, lin in enumerate(p["in_proj"]):
            x = _dense(lin, x, dtype)
            if i == 0:
                x = jax.nn.relu(x)
        sa_in = x
    else:
        x = seq
        for i, lin in enumerate(p["in_proj"]):
            x = _dense(lin, x, dtype)
            if i == 0:
                x = jax.nn.relu(x)
        pe = _positional_encoding(p, T) if p["pe_type"] != "empty" else 0.0
        sa_in = x + pe
    if attention_on:
        out, _ = apply_mha(p["mha"], sa_in, sa_in, sa_in, dtype,
                           dropout_rate=0.2, rng=rng)
        h = out[..., 0, :]
    else:  # reference ATTENTION_OFF toggle (selfattention.py:62-66,82-84)
        h = jnp.mean(sa_in, axis=-2)
    h = jax.nn.relu(_dense(p["out_proj"][0], h, dtype))
    return _dense(p["out_proj"][1], h, dtype)
