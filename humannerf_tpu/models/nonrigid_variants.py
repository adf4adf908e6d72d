"""Non-rigid offset model variants beyond the plain MLP.

Covers the research fork's three alternatives, selected by
cfg.non_rigid_motion_model (reference network.py:44-67):

  * 'mlp_SA'                  mlp_offset_SA.py:8-158 -- a self-attention
    encoder over the temporal condition sequence, fused with a projected
    positional embedding, then the offset MLP trunk.
  * 'transformer_encoder'     transformer_offset.py:5-73 -- query token +
    per-(time, joint) condition tokens through a TransformerEncoder.
  * 'TStransformer_encoder'   TStransformer_offset.py:5-74 -- two-stage
    temporal-then-spatial (or SP) encoders over (T, J, D) condition tokens.

All variants keep the reference's "start as identity motion" tiny-init
output layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.models.attention import (apply_layer_norm, apply_mha,
                                            apply_transformer_encoder,
                                            init_layer_norm, init_mha,
                                            init_transformer_encoder,
                                            transformer_sine_pe)
from humannerf_tpu.models.embedders import fourier_embed
from humannerf_tpu.models.init import (GAIN_LINEAR, GAIN_RELU, linear_params,
                                       tiny_linear_params)
from humannerf_tpu.models.mlps import _dense


# -- 'mlp_SA' --------------------------------------------------------------------

def init_nonrigid_sa(key, *, pos_embed_size: int, condition_code_size: int,
                     mlp_width: int = 128, mlp_depth: int = 5,
                     mlp_depth_plus: int = 0, skips=(4,),
                     last_linear_scale: int = 1, sa_version: int = 1,
                     condition_embedding: str = "learnable",
                     condition_max_length: int = 4):
    keys = iter(jax.random.split(key, 64))
    params = {
        "pos_embed_proj": linear_params(next(keys), pos_embed_size, mlp_width,
                                        GAIN_RELU),
        "cond_in_proj": linear_params(next(keys), condition_code_size,
                                      mlp_width, GAIN_RELU),
        "mha": init_mha(next(keys), mlp_width, 1),
        "cond_out_proj": linear_params(next(keys), mlp_width, mlp_width,
                                       GAIN_RELU),
        "version": sa_version,
        "cond_embedding_type": condition_embedding,
    }
    if condition_embedding == "learnable":
        params["cond_embedding"] = jax.random.normal(
            next(keys), (condition_max_length, mlp_width), jnp.float32)
    if sa_version == 2:
        params["cond_layer_norm"] = init_layer_norm(mlp_width)
        params["pos_layer_norm"] = init_layer_norm(mlp_width)

    skips = set(skips)
    in_dim = 2 * mlp_width
    layers = [linear_params(next(keys), in_dim, mlp_width, GAIN_RELU)]
    cur = mlp_width
    wide = mlp_width * last_linear_scale
    for i in range(1, mlp_depth + mlp_depth_plus):
        if i in skips:
            layers.append(linear_params(next(keys), cur + in_dim, mlp_width,
                                        GAIN_RELU))
            cur = mlp_width
        elif i >= mlp_depth - 1:
            layers.append(linear_params(next(keys), cur, wide, GAIN_RELU))
            cur = wide
        else:
            layers.append(linear_params(next(keys), cur, mlp_width, GAIN_RELU))
    params["block_mlps"] = layers
    params["output"] = tiny_linear_params(next(keys), cur, 3)
    return params


def apply_nonrigid_sa(p, pos_embed, pos_xyz, condition_seq, *, skips=(4,),
                      dtype=jnp.float32, rng=None):
    """condition_seq: (T, D) temporal condition codes; pos_embed: (N, E).
    rng != None enables the reference's train-time attention dropout 0.2
    (mlp_offset_SA.py:44)."""
    skips = set(skips)
    pe_proj = jax.nn.relu(_dense(p["pos_embed_proj"], pos_embed, dtype))
    cond_in = jax.nn.relu(_dense(p["cond_in_proj"], condition_seq, dtype))
    T = condition_seq.shape[0]
    if p["cond_embedding_type"] == "learnable":
        emb = p["cond_embedding"][:T]
    elif p["version"] == 1:
        w = p["cond_in_proj"]["w"].shape[1]
        emb = fourier_embed(jnp.arange(T, dtype=jnp.float32)[:, None],
                            w // 2, include_input=False)
    else:
        emb = transformer_sine_pe(jnp.arange(T, dtype=jnp.float32),
                                  p["cond_in_proj"]["w"].shape[1])
    sa_in = cond_in + emb
    sa_out, _ = apply_mha(p["mha"], sa_in, sa_in, sa_in, dtype,
                          dropout_rate=0.2, rng=rng)
    cond_out = jax.nn.relu(_dense(p["cond_out_proj"], sa_out[0], dtype))
    if p["version"] == 2:
        cond_out = apply_layer_norm(p["cond_layer_norm"],
                                    cond_out + cond_in[0])
        pe_proj = apply_layer_norm(p["pos_layer_norm"], pe_proj)

    cond_tiled = jnp.broadcast_to(cond_out, pe_proj.shape[:-1]
                                  + cond_out.shape[-1:])
    pos_condition = jnp.concatenate([cond_tiled, pe_proj], axis=-1)
    h = pos_condition
    for li, lin in enumerate(p["block_mlps"]):
        if li > 0 and li in skips:
            h = jnp.concatenate([h, pos_condition], axis=-1)
        h = jax.nn.relu(_dense(lin, h, dtype))
    trans = _dense(p["output"], h, dtype)
    return {"xyz": pos_xyz + trans, "offsets": trans}


# -- 'transformer_encoder' ---------------------------------------------------------

def init_nonrigid_transformer(key, *, query_input_dim: int, cfg_te):
    keys = iter(jax.random.split(key, 8))
    d = cfg_te.d_model
    params = {
        "query_proj": linear_params(next(keys), query_input_dim, d,
                                    GAIN_LINEAR),
        "condition_proj": linear_params(next(keys), cfg_te.condition_input_dim,
                                        d, GAIN_LINEAR),
        "encoder": init_transformer_encoder(
            next(keys), d, cfg_te.nhead, cfg_te.dim_feedforward,
            cfg_te.num_encoder_layers),
        "output": tiny_linear_params(next(keys), d, 3),
        "joint_number": cfg_te.joint_embedding_max_length,
    }
    if cfg_te.time_embedding_type == "learnable":
        params["time_embedding"] = jax.random.normal(
            next(keys), (cfg_te.time_embedding_max_length + 1, d), jnp.float32)
    if cfg_te.joint_embedding_type == "learnable":
        params["joint_embedding"] = jax.random.normal(
            next(keys), (params["joint_number"], d), jnp.float32)
    return params


def apply_nonrigid_transformer(p, pos_embed, pos_xyz, condition_tokens, *,
                               dtype=jnp.float32, rng=None):
    """condition_tokens: (L, D_cond) with L = num_frames * joint_number
    (transformer_offset.py:51-73). pos_embed: (N, E). rng != None enables
    torch TransformerEncoderLayer's default train-time dropout 0.1."""
    J = int(p["joint_number"])
    L = condition_tokens.shape[0]
    T = L // J
    cond = _dense(p["condition_proj"], condition_tokens, dtype)  # (L, d)
    if "time_embedding" in p:
        time_ids = jnp.repeat(jnp.arange(T), J)
        cond = cond + p["time_embedding"][time_ids]
    if "joint_embedding" in p:
        joint_ids = jnp.tile(jnp.arange(J), T)
        cond = cond + p["joint_embedding"][joint_ids]
    q = _dense(p["query_proj"], pos_embed, dtype)[:, None, :]   # (N, 1, d)
    cond_b = jnp.broadcast_to(cond, (q.shape[0],) + cond.shape)
    x = jnp.concatenate([q, cond_b], axis=1)                    # (N, 1+L, d)
    out = apply_transformer_encoder(p["encoder"], x, dtype,
                                    dropout_rate=0.1, rng=rng)[:, 0]
    trans = _dense(p["output"], out, dtype)
    return {"xyz": pos_xyz + trans, "offsets": trans}


# -- 'TStransformer_encoder' --------------------------------------------------------

def init_nonrigid_ts_transformer(key, *, query_input_dim: int, cfg_ts):
    keys = iter(jax.random.split(key, 10))
    c1, c2 = cfg_ts.encoder1, cfg_ts.encoder2
    params = {
        "attention_order": cfg_ts.attention_order,
        "query_proj": linear_params(next(keys), query_input_dim, c2.d_model,
                                    GAIN_LINEAR),
        "condition_proj": linear_params(next(keys), cfg_ts.condition_input_dim,
                                        c1.d_model, GAIN_LINEAR),
        "condition_proj2": linear_params(next(keys), c1.d_model, c2.d_model,
                                         GAIN_LINEAR),
        "encoder1": init_transformer_encoder(
            next(keys), c1.d_model, c1.nhead, c1.dim_feedforward,
            c1.num_encoder_layers),
        "encoder2": init_transformer_encoder(
            next(keys), c2.d_model, c2.nhead, c2.dim_feedforward,
            c2.num_encoder_layers),
        "output": tiny_linear_params(next(keys), c2.d_model, 3),
    }
    for name, c in (("embedding1", c1), ("embedding2", c2)):
        assert c.embedding_type == "learnable", "sine PE: later milestone"
        params[name] = jax.random.normal(
            next(keys), (c.embedding_max_length + 1, c.d_model), jnp.float32)
    return params


def apply_nonrigid_ts_transformer(p, pos_embed, pos_xyz, condition_tjd, *,
                                  dtype=jnp.float32, rng=None):
    """condition_tjd: (T, J, D). Stage 1 attends within each joint's
    temporal sequence (or each frame's joints for order 'ST'); stage 2
    attends a query token over the stage-1 summaries
    (TStransformer_offset.py:46-73). rng != None enables torch
    TransformerEncoderLayer's default train-time dropout 0.1."""
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    cond = condition_tjd
    if p["attention_order"] == "TS":
        cond = jnp.swapaxes(cond, 0, 1)                 # (J, T, D)
    G, T = cond.shape[0], cond.shape[1]
    emb1 = p["embedding1"][:T]
    chunk = _dense(p["condition_proj"], cond, dtype)    # (G, T, d1)
    o1 = apply_transformer_encoder(p["encoder1"], chunk + emb1, dtype,
                                   dropout_rate=0.1, rng=k1)[:, 0]  # (G, d1)
    o12 = _dense(p["condition_proj2"], o1, dtype)       # (G, d2)

    q = _dense(p["query_proj"], pos_embed, dtype)[:, None, :]  # (N, 1, d2)
    o12_b = jnp.broadcast_to(o12, (q.shape[0],) + o12.shape)
    x = jnp.concatenate([q, o12_b], axis=1)             # (N, G+1, d2)
    x = x + p["embedding2"][:G + 1]
    out = apply_transformer_encoder(p["encoder2"], x, dtype,
                                    dropout_rate=0.1, rng=k2)[:, 0]
    trans = _dense(p["output"], out, dtype)
    return {"xyz": pos_xyz + trans, "offsets": trans}
