"""The three MLPs: canonical rgb+sigma, non-rigid offset, body-pose refiner.

Pure functions over explicit param pytrees. Architecture, skip placement,
concat ordering and init all match the reference so converted torch
checkpoints reproduce identical outputs:

  * CanonicalMLP        canonical_mlps/mlp_rgb_sigma.py (8x256, skip@4,
                        concat [pos_embed, h]; optional view-dir / pose-color
                        output branches)
  * NonRigidMotionMLP   non_rigid_motion_mlps/mlp_offset.py (6x128, skip@4,
                        concat [h, pos_embed], input [condition, pos_embed],
                        tiny-init last layer)
  * BodyPoseRefiner     pose_decoders/mlp_delta_body_pose.py (4x256 -> 23
                        axis-angle deltas -> Rodrigues)

Matmuls run in a configurable compute dtype (bf16 on TPU); params stay fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.models.init import (GAIN_LINEAR, GAIN_RELU, linear_params,
                                       tiny_linear_params)
from humannerf_tpu.utils.transforms import rodrigues_net


def _dense(p, x, dtype):
    # bf16 compute hits the MXU directly; f32 compute must not be silently
    # demoted by the default (bf16-pass) matmul precision.
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                precision=precision, preferred_element_type=jnp.float32)
    return y + p["b"]


# ---------------------------------------------------------------------------
# Canonical MLP
# ---------------------------------------------------------------------------

def init_multihead(key, *, head_depth: int, head_num: int, mlp_width: int,
                   out_ch: int, tiny_last: bool = False):
    """K independent output heads, each (head_depth-1) hidden layers + out
    (reference multihead.py:4-19). tiny_last applies the non-rigid 1e-5
    last-layer init per head (mlp_offset.py:67-71)."""
    keys = iter(jax.random.split(key, head_num * (head_depth + 1)))
    heads = []
    for _ in range(head_num):
        layers = [linear_params(next(keys), mlp_width, mlp_width, GAIN_RELU)
                  for _ in range(head_depth - 1)]
        out = (tiny_linear_params(next(keys), mlp_width, out_ch) if tiny_last
               else linear_params(next(keys), mlp_width, out_ch, GAIN_LINEAR))
        heads.append({"layers": layers, "output": out})
    return heads


def apply_multihead(heads, h, dtype=jnp.float32):
    """-> (N, K, out_ch): every head evaluated (selection happens outside)."""
    outs = []
    for head in heads:
        x = h
        for p in head["layers"]:
            x = jax.nn.relu(_dense(p, x, dtype))
        outs.append(_dense(head["output"], x, dtype))
    return jnp.stack(outs, axis=1)


def init_canonical_mlp(key, *, input_ch: int, mlp_depth: int = 8,
                       mlp_width: int = 256, mlp_depth_plus: int = 0,
                       skips=(4,), last_linear_scale: int = 1,
                       head_num: int = 1, head_depth: int = 1,
                       view_dir: bool = False,
                       input_ch_dir: int = 0, pose_color: str = "wo",
                       pose_ch: int = 69, extra_input_ch: int = 0,
                       first_layer_in_ch: int | None = None):
    """Build canonical-MLP params (mlp_rgb_sigma.py:64-130).

    extra_input_ch covers condition-code / time / rgb-history widths appended
    to the first layer's input.
    """
    skips = set(skips)
    keys = iter(jax.random.split(key, 64))
    layers = []
    wide = mlp_width * last_linear_scale
    # first_layer_in_ch overrides the first-layer width (input-encoder mode,
    # mlp_rgb_sigma.py:36-41); skip layers always re-concat the raw pos embed
    in_dim = first_layer_in_ch if first_layer_in_ch is not None \
        else input_ch + extra_input_ch
    layers.append(linear_params(next(keys), in_dim, mlp_width, GAIN_RELU))
    cur = mlp_width
    for i in range(mlp_depth + mlp_depth_plus - 1):
        if i in skips:
            layers.append(linear_params(next(keys), cur + input_ch, mlp_width,
                                        GAIN_RELU))
            cur = mlp_width
        elif i >= mlp_depth - 2:
            out = wide
            layers.append(linear_params(next(keys), cur, out, GAIN_RELU))
            cur = out
        else:
            layers.append(linear_params(next(keys), cur, mlp_width, GAIN_RELU))
            cur = mlp_width
    params = {"pts_linears": layers}
    if view_dir or pose_color == "direct":
        assert head_num == 1, "multihead + view-dependent rgb unsupported"
        params["output_density"] = linear_params(next(keys), cur, 1, GAIN_LINEAR)
        params["output_rgb_1"] = linear_params(next(keys), cur, mlp_width,
                                               GAIN_LINEAR)
        dim = mlp_width
        if view_dir:
            dim += input_ch_dir
        if pose_color == "direct":
            dim += pose_ch
        params["output_rgb_2a"] = linear_params(next(keys), dim, mlp_width,
                                                GAIN_LINEAR)
        params["output_rgb_2b"] = linear_params(next(keys), mlp_width, 3,
                                                GAIN_LINEAR)
    elif head_num > 1 and head_depth > 1:
        params["multihead"] = init_multihead(
            next(keys), head_depth=head_depth, head_num=head_num,
            mlp_width=cur, out_ch=4)
    else:
        # head_num > 1 with head_depth == 1 is one wide linear -> (4*K)
        # (mlp_rgb_sigma.py:114-115)
        params["output"] = linear_params(next(keys), cur, 4 * head_num,
                                         GAIN_LINEAR)
    if pose_color == "ao":
        params["output_ao_1"] = linear_params(next(keys), cur, mlp_width,
                                              GAIN_LINEAR)
        params["output_ao_2a"] = linear_params(next(keys), mlp_width + pose_ch,
                                               mlp_width, GAIN_LINEAR)
        params["output_ao_2b"] = linear_params(next(keys), mlp_width, 1,
                                               GAIN_LINEAR)
    return params


def apply_canonical_mlp(params, pos_embed, *, skips=(4,), dir_embed=None,
                        pose_latent=None, extra_input=None, first_input=None,
                        pose_color: str = "wo", view_dir: bool = False,
                        dtype=jnp.float32):
    """Forward pass -> (N, 4*head_num) raw rgb logits + density.

    Skip layers concat [pos_embed, h] (mlp_rgb_sigma.py:164-166). The
    view-dir / pose-color rgb head is two linears with no activation between
    (mlp_rgb_sigma.py:94-96).
    """
    skips = set(skips)
    if first_input is not None:       # input-encoder mode: precomputed input
        h = first_input
    elif extra_input is not None:
        h = jnp.concatenate([pos_embed, extra_input], axis=-1)
    else:
        h = pos_embed
    for li, p in enumerate(params["pts_linears"]):
        # layer li > 0 corresponds to loop index i = li - 1 in the reference
        if li > 0 and (li - 1) in skips:
            h = jnp.concatenate([pos_embed, h], axis=-1)
        h = jax.nn.relu(_dense(p, h, dtype))

    if view_dir or pose_color == "direct":
        density = _dense(params["output_density"], h, dtype)
        feats = [_dense(params["output_rgb_1"], h, dtype)]
        if view_dir:
            feats.append(dir_embed)
        if pose_color == "direct":
            feats.append(jnp.broadcast_to(pose_latent,
                                          h.shape[:-1] + pose_latent.shape[-1:]))
        rgb = _dense(params["output_rgb_2b"],
                     _dense(params["output_rgb_2a"],
                            jnp.concatenate(feats, axis=-1), dtype), dtype)
        out = jnp.concatenate([rgb, density], axis=-1)
    elif "multihead" in params:
        out = apply_multihead(params["multihead"], h, dtype)  # (N, K, 4)
        out = out.reshape(h.shape[0], -1)
    else:
        out = _dense(params["output"], h, dtype)

    if pose_color == "ao":
        feat = _dense(params["output_ao_1"], h, dtype)
        pl = jnp.broadcast_to(pose_latent, h.shape[:-1] + pose_latent.shape[-1:])
        ao = jax.nn.sigmoid(
            _dense(params["output_ao_2b"],
                   _dense(params["output_ao_2a"],
                          jnp.concatenate([feat, pl], axis=-1), dtype), dtype))
        out = jnp.concatenate([out[..., :3] * ao, out[..., 3:]], axis=-1)
    return out


# ---------------------------------------------------------------------------
# Non-rigid offset MLP
# ---------------------------------------------------------------------------

def init_nonrigid_mlp(key, *, pos_embed_size: int, condition_code_size: int = 69,
                      mlp_width: int = 128, mlp_depth: int = 6,
                      mlp_depth_plus: int = 0, skips=(4,),
                      last_linear_scale: int = 1, head_num: int = 1,
                      head_depth: int = 1):
    """Non-rigid offset MLP params (mlp_offset.py:22-71)."""
    skips = set(skips)
    keys = iter(jax.random.split(key, 64))
    layers = [linear_params(next(keys), pos_embed_size + condition_code_size,
                            mlp_width, GAIN_RELU)]
    cur = mlp_width
    wide = mlp_width * last_linear_scale
    for i in range(1, mlp_depth + mlp_depth_plus):
        if i in skips:
            layers.append(linear_params(next(keys), cur + pos_embed_size,
                                        mlp_width, GAIN_RELU))
            cur = mlp_width
        elif i >= mlp_depth - 1:
            layers.append(linear_params(next(keys), cur, wide, GAIN_RELU))
            cur = wide
        else:
            layers.append(linear_params(next(keys), cur, mlp_width, GAIN_RELU))
            cur = mlp_width
    if head_num > 1 and head_depth > 1:
        heads = init_multihead(next(keys), head_depth=head_depth,
                               head_num=head_num, mlp_width=cur, out_ch=3,
                               tiny_last=True)
        return {"block_mlps": layers, "multihead": heads}
    out = tiny_linear_params(next(keys), cur, 3 * head_num)
    return {"block_mlps": layers, "output": out}


def apply_nonrigid_mlp(params, pos_embed, pos_xyz, condition_code, *,
                       skips=(4,), mlp_depth: int = 6, mlp_depth_plus: int = 0,
                       dtype=jnp.float32):
    """Forward -> dict(xyz, offsets). Skip layers concat [h, pos_embed]
    (mlp_offset.py:80-83); input is [condition, pos_embed] (mlp_offset.py:77).
    """
    skips = set(skips)
    cc = jnp.broadcast_to(condition_code,
                          pos_embed.shape[:-1] + condition_code.shape[-1:])
    h = jnp.concatenate([cc, pos_embed], axis=-1)
    for li, p in enumerate(params["block_mlps"]):
        if li > 0 and li in skips:  # layer index li == reference loop index i
            h = jnp.concatenate([h, pos_embed], axis=-1)
        h = jax.nn.relu(_dense(p, h, dtype))
    if "multihead" in params:
        trans = apply_multihead(params["multihead"], h, dtype)  # (N, K, 3)
        trans = trans.reshape(h.shape[0], -1)
    else:
        trans = _dense(params["output"], h, dtype)
    if trans.shape[-1] > 3:  # multihead: per-head offsets (N, K, 3)
        trans = trans.reshape(h.shape[0], -1, 3)
        return {"xyz": pos_xyz[:, None, :] + trans, "offsets": trans}
    return {"xyz": pos_xyz + trans, "offsets": trans}


# ---------------------------------------------------------------------------
# Body-pose refiner
# ---------------------------------------------------------------------------

def init_pose_refiner(key, *, embedding_size: int = 69, mlp_width: int = 256,
                      mlp_depth: int = 4, total_bones: int = 24):
    """Pose refiner params (mlp_delta_body_pose.py:13-31)."""
    keys = iter(jax.random.split(key, 16))
    layers = [linear_params(next(keys), embedding_size, mlp_width, GAIN_RELU)]
    for _ in range(mlp_depth - 1):
        layers.append(linear_params(next(keys), mlp_width, mlp_width, GAIN_RELU))
    out = tiny_linear_params(next(keys), mlp_width, 3 * (total_bones - 1))
    return {"block_mlps": layers, "output": out}


def apply_pose_refiner(params, posevec, *, total_bones: int = 24,
                       dtype=jnp.float32):
    """posevec (..., 69) -> dict(Rs (..., 23, 3, 3), rvec (..., 23, 3))."""
    h = posevec
    for p in params["block_mlps"]:
        h = jax.nn.relu(_dense(p, h, dtype))
    rvec = _dense(params["output"], h, dtype)
    rvec = rvec.reshape(rvec.shape[:-1] + (total_bones - 1, 3))
    return {"Rs": rodrigues_net(rvec), "rvec": rvec}
