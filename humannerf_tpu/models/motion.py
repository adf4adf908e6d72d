"""Motion basis: observation -> canonical per-bone rigid transforms.

Computes G_dst along the kinematic chain, then (scale_R, T) from
G_cnl @ G_dst^{-1}. Reference: MotionBasisComputer
(core/utils/network_util.py:97-156). The 24-step chain has a static parent
structure, so it is unrolled at trace time (24 tiny 4x4 matmuls); the
general matrix inverse is replaced by the exact closed-form rigid inverse
(the chain product of [R|t] blocks is always rigid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from humannerf_tpu.utils.body import PARENT

# Kinematic-chain products are tiny but precision-critical: always full f32.
_HI = jax.lax.Precision.HIGHEST


def _make_G(Rs: jnp.ndarray, Ts: jnp.ndarray) -> jnp.ndarray:
    """(J, 3, 3) + (J, 3) -> homogeneous (J, 4, 4)."""
    J = Rs.shape[0]
    top = jnp.concatenate([Rs, Ts[..., None]], axis=-1)       # (J, 3, 4)
    bottom = jnp.tile(jnp.array([[[0.0, 0.0, 0.0, 1.0]]], Rs.dtype), (J, 1, 1))
    return jnp.concatenate([top, bottom], axis=-2)


def rigid_inverse(G: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of rigid transforms (..., 4, 4): [R|t]^-1 = [R^T | -R^T t]."""
    R = G[..., :3, :3]
    t = G[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HI)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], G.dtype), G.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def compute_dst_gtfms(dst_Rs: jnp.ndarray, dst_Ts: jnp.ndarray) -> jnp.ndarray:
    """Chain local (R, T) into global transforms (unrolled static chain)."""
    local_Gs = _make_G(dst_Rs, dst_Ts)
    gs = [local_Gs[0]]
    for i in range(1, dst_Rs.shape[0]):
        gs.append(jnp.matmul(gs[int(PARENT[i])], local_Gs[i], precision=_HI))
    return jnp.stack(gs, axis=0)


def motion_basis(dst_Rs: jnp.ndarray, dst_Ts: jnp.ndarray,
                 cnl_gtfms: jnp.ndarray):
    """Per-bone observation->canonical (scale_R (J,3,3), T (J,3)).

    f = G_cnl @ G_dst^{-1}  (network_util.py:147-156).
    """
    dst_gtfms = compute_dst_gtfms(dst_Rs, dst_Ts)
    f = jnp.matmul(cnl_gtfms, rigid_inverse(dst_gtfms), precision=_HI)
    return f[:, :3, :3], f[:, :3, 3]


def forward_motion_warp(pts: jnp.ndarray, forward_weights: jnp.ndarray,
                        motion_scale_Rs: jnp.ndarray, motion_Ts: jnp.ndarray):
    """Canonical -> observation warp (forward LBS) for history features.

    Inverts the per-bone rigid transforms and blends by the given forward
    weights (reference `correspondence_forward_searching`,
    network.py:618-645). pts: (N, 3); forward_weights: (N, J).
    Returns (N, 3).
    """
    Rs_fwd = jnp.swapaxes(motion_scale_Rs, -1, -2)            # (J, 3, 3) = R^T
    Ts_fwd = -jnp.einsum("jik,jk->ji", Rs_fwd, motion_Ts, precision=_HI)     # -R^T T
    pos = jnp.einsum("jik,nk->nji", Rs_fwd, pts, precision=_HI) + Ts_fwd[None]   # (N, J, 3)
    w_sum = jnp.clip(jnp.sum(forward_weights, axis=-1, keepdims=True), 1e-4)
    return jnp.sum(forward_weights[..., None] * pos, axis=1) / w_sum
