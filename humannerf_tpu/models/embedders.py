"""Positional embedders (functional, trace-friendly).

Covers the reference's fourier embedder (embedders/fourier.py:4-55) and the
hann-window coarse-to-fine embedder (embedders/hannw_fourier.py:25-43). The
reference rebuilds the hann embedder every forward with the current
iteration (network.py:697-701); here the window weights are a function of a
*traced* alpha scalar, so one compiled program covers all of training.

Feature ordering matches the reference exactly (interleaved sin/cos per
frequency, optional leading identity) -- converted checkpoints depend on it.
"""

from __future__ import annotations

import jax.numpy as jnp


def fourier_embed_dim(multires: int, input_dims: int = 3,
                      include_input: bool = True) -> int:
    return input_dims * (2 * multires + (1 if include_input else 0))


def fourier_embed(x: jnp.ndarray, multires: int,
                  include_input: bool = True) -> jnp.ndarray:
    """[x?, sin(x*2^0), cos(x*2^0), ..., sin(x*2^(m-1)), cos(x*2^(m-1))]."""
    feats = [x] if include_input else []
    for i in range(multires):
        freq = 2.0 ** i
        feats.append(jnp.sin(x * freq))
        feats.append(jnp.cos(x * freq))
    return jnp.concatenate(feats, axis=-1)


def hann_alpha(iter_val: jnp.ndarray, multires: int, kick_in_iter: int,
               full_band_iter: int) -> jnp.ndarray:
    """Band-unlock schedule alpha = m * (iter - T_s) / (T_e - T_s), clipped at 0.

    Reference: hannw_fourier.py:25-37 (alpha = m when T_e == T_s).
    """
    n = full_band_iter - kick_in_iter
    if n <= 0:
        return jnp.asarray(float(multires))
    t = jnp.clip(iter_val - float(kick_in_iter), 0.0)
    return multires * t / float(n)


def hann_window_weights(alpha: jnp.ndarray, multires: int) -> jnp.ndarray:
    """w_j = (1 - cos(pi * clip(alpha - j, 0, 1))) / 2 for j = 0..m-1."""
    j = jnp.arange(multires, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - j, 0.0, 1.0))) / 2.0


def init_vocab_embedder(key, n_vocab: int, dim: int):
    """Learnable id->vector table (reference vocab_embedder.py:8-10; torch
    nn.Embedding init is N(0, 1))."""
    import jax
    return {"table": jax.random.normal(key, (n_vocab, dim), jnp.float32)}


def vocab_embed(params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["table"][jnp.asarray(ids, jnp.int32)]


def hannw_fourier_embed(x: jnp.ndarray, multires: int,
                        alpha: jnp.ndarray) -> jnp.ndarray:
    """Hann-weighted fourier features, no identity term.

    [w_0 sin(x), w_0 cos(x), w_1 sin(2x), w_1 cos(2x), ...]
    (hannw_fourier.py:38-43, include_input=False per hannw get_embedder:57).
    """
    w = hann_window_weights(alpha, multires)
    feats = []
    for i in range(multires):
        freq = 2.0 ** i
        feats.append(w[i] * jnp.sin(x * freq))
        feats.append(w[i] * jnp.cos(x * freq))
    return jnp.concatenate(feats, axis=-1)
