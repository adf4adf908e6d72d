"""Canonical-MLP input encoders over per-bone temporal condition sequences.

Covers the reference canonical_mlps/input_encoder.py (v1) and
input_encoder_v2.py: per-bone condition sequences (T, 23, Dp) are encoded
temporally (self-attention / MLP / flatten), localized by backward skinning
weights, encoded spatially, and fused with the positional embedding.

v2's key difference: the spatial code is computed once per PART (24 codes
via the PART2JOINTS mask) and each sample indexes its argmax-bone part code
-- the TPU implementation keeps that exact structure (it is a 25-row table
lookup, not a per-sample encoder run).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.models.encoders import (apply_mlpseq, apply_selfattention,
                                           init_mlpseq, init_selfattention)
from humannerf_tpu.utils.kinematic_chain import PART2JOINTS

N_JOINT = 23


def spatial_localize(temporal_code, weights, *, enable: bool,
                     threshold: float, fg_threshold: float = 0.2, **_):
    """Mask per-joint codes by skinning weights (input_encoder.py:15-42).

    temporal_code: (1 or N, 23, D); weights: (N, 24). Returns (N, 23, D).
    """
    tc = jnp.broadcast_to(temporal_code,
                          (weights.shape[0],) + temporal_code.shape[-2:])
    if not enable:
        return tc
    if threshold == 1:
        ws = jax.lax.stop_gradient(weights)
        part = jnp.argmax(ws, axis=1)                     # (N,)
        mask = jnp.asarray(PART2JOINTS[:, 1:])[part]      # (N, 23)
        fg = (jnp.max(ws, axis=1, keepdims=True) > fg_threshold)
        mask = mask * fg
        return tc * mask[..., None]
    ws = jax.lax.stop_gradient(weights[:, 1:])            # (N, 23)
    if threshold != -1:
        ws = (ws > threshold).astype(tc.dtype)
    return tc * ws[..., None]


def init_input_encoder(key, *, input_ch: int, condition_code_dim: int,
                       seq_len: int, temporal_enc_method: str,
                       temporal_enc_cfg_selfattention,
                       temporal_enc_cfg_mlp, spatial_localize_cfg,
                       spatial_enc_method: str, spatial_enc_cfg_mlp,
                       fuse_method: str, fuse_enc_cfg_tmlp, version: str = "v1",
                       **_):
    keys = iter(jax.random.split(key, 8))
    params = {"meta": {
        "seq_len": seq_len, "temporal": temporal_enc_method,
        "spatial": spatial_enc_method, "fuse": fuse_method,
        "version": version,
        "localize": dict(spatial_localize_cfg),
    }}
    if temporal_enc_method == "selfattention":
        sa_cfg = dict(temporal_enc_cfg_selfattention)
        params["temporal"] = init_selfattention(
            next(keys), input_dim=condition_code_dim, max_length=seq_len,
            pe_order="before_fc", in_proj="fc-relu", **sa_cfg)
        t_dim = sa_cfg["output_dim"]
    elif temporal_enc_method == "mlp":
        mcfg = dict(temporal_enc_cfg_mlp)
        params["temporal"] = init_mlpseq(
            next(keys), input_dim=condition_code_dim, seq_len=seq_len, **mcfg)
        t_dim = mcfg["output_dim"] or mcfg["hidden_dim"]
    elif temporal_enc_method == "empty":
        t_dim = seq_len * condition_code_dim
    else:
        raise ValueError(temporal_enc_method)
    params["meta"]["t_dim"] = t_dim

    if spatial_enc_method == "mlp":
        scfg = dict(spatial_enc_cfg_mlp)
        params["spatial"] = init_mlpseq(
            next(keys), input_dim=t_dim, seq_len=N_JOINT, **scfg)
        s_dim = scfg["output_dim"] or scfg["hidden_dim"]
    elif spatial_enc_method == "empty":
        s_dim = t_dim * N_JOINT
    else:
        raise ValueError(spatial_enc_method)

    if fuse_method == "concat":
        out_dim = s_dim + input_ch
    elif fuse_method == "tmlp":
        fcfg = dict(fuse_enc_cfg_tmlp)
        params["fuse"] = init_mlpseq(
            next(keys), input_dim=s_dim, seq_len=seq_len, **fcfg)
        out_dim = fcfg["output_dim"] or fcfg["hidden_dim"]
    else:
        raise ValueError(fuse_method)
    params["meta"]["output_dim"] = out_dim
    return params


def input_encoder_output_dim(params) -> int:
    return params["meta"]["output_dim"]


def apply_input_encoder(params, pos_embed, condition_code, weights,
                        gate_weight=1.0, dtype=jnp.float32, rng=None):
    """pos_embed (N, E); condition_code (T, 23, Dp); weights (N, 24)
    -> (N, E + S) fused canonical-MLP input (input_encoder.py:104-123)."""
    meta = params["meta"]
    if meta.get("version") == "v2":
        return _apply_input_encoder_v2(params, pos_embed, condition_code,
                                       weights, gate_weight, dtype, rng)
    cc = jnp.swapaxes(condition_code, 0, 1)               # (23, T, Dp)
    if meta["temporal"] == "selfattention":
        tcode = apply_selfattention(params["temporal"], cc, dtype, rng=rng)  # (23, D)
    elif meta["temporal"] == "mlp":
        tcode = apply_mlpseq(params["temporal"], cc, dtype)
    else:
        tcode = cc.reshape(N_JOINT, -1)

    loc = spatial_localize(tcode[None], weights, **meta["localize"])
    if meta["spatial"] == "mlp":
        scode = apply_mlpseq(params["spatial"], loc, dtype)  # (N, S)
    else:
        scode = loc.reshape(loc.shape[0], -1)

    if meta["fuse"] == "concat":
        return jnp.concatenate([pos_embed, scode * gate_weight], axis=-1)
    # tmlp: temporal fuse over per-step spatial codes
    scode = scode.reshape(-1, meta["seq_len"], scode.shape[-1])
    return apply_mlpseq(params["fuse"], scode, dtype)


def _apply_input_encoder_v2(params, pos_embed, condition_code, weights,
                            gate_weight, dtype, rng=None):
    """v2: spatial codes computed once PER PART via the PART2JOINTS mask
    (25 codes incl. a zero background row), each sample indexing its
    argmax-bone part code (input_encoder_v2.py:15-43,104-126). The
    whole-table precompute + tiny 25-row gather replaces v1's per-sample
    localization."""
    meta = params["meta"]
    cc = jnp.swapaxes(condition_code, 0, 1)               # (23, T, Dp)
    if meta["temporal"] == "selfattention":
        tcode = apply_selfattention(params["temporal"], cc, dtype, rng=rng)  # (23, D)
    elif meta["temporal"] == "mlp":
        tcode = apply_mlpseq(params["temporal"], cc, dtype)
    else:
        tcode = cc.reshape(N_JOINT, -1)

    table = jnp.asarray(PART2JOINTS[:, 1:])               # (24, 23)
    per_part = table[:, :, None] * tcode[None]            # (24, 23, D)
    per_part = jnp.concatenate(
        [per_part, jnp.zeros_like(per_part[:1])], axis=0)  # +bg row -> 25

    if meta["spatial"] == "mlp":
        scode = apply_mlpseq(params["spatial"], per_part, dtype)  # (25, S)
    else:
        scode = per_part.reshape(25, -1)

    ws = jax.lax.stop_gradient(weights)
    fg = jnp.max(ws, axis=1) > meta["localize"].get("fg_threshold", 0.2)
    idx = jnp.where(fg, jnp.argmax(ws, axis=1), 24)       # bg -> zero row
    sample_code = scode[idx]                              # (N, S)
    return jnp.concatenate([pos_embed, sample_code * gate_weight], axis=-1)
