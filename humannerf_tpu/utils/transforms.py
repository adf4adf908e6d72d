"""Rotation representations in JAX (device-side, differentiable).

Covers the reference's core/utils/transformation_util.py conversions used by
the pose-condition representations, plus the network Rodrigues formula of
core/utils/network_util.py:57-83 (note its distinct eps convention:
theta = sqrt(1e-5 + |r|^2), which keeps gradients finite at r = 0 -- the
pose refiner relies on this since its output starts at ~0).
"""

from __future__ import annotations

import jax.numpy as jnp


def rodrigues_net(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Uses theta = sqrt(1e-5 + sum(r^2)) and axis = r / theta exactly as the
    reference RodriguesModule (network_util.py:67-83) so converted pose-
    refiner checkpoints reproduce identical rotations.
    """
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec ** 2, axis=-1))
    r = rvec / theta[..., None]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    one_c = 1.0 - c
    row0 = jnp.stack([rx * rx + (1.0 - rx * rx) * c,
                      rx * ry * one_c - rz * s,
                      rx * rz * one_c + ry * s], axis=-1)
    row1 = jnp.stack([rx * ry * one_c + rz * s,
                      ry * ry + (1.0 - ry * ry) * c,
                      ry * rz * one_c - rx * s], axis=-1)
    row2 = jnp.stack([rx * rz * one_c - ry * s,
                      ry * rz * one_c + rx * s,
                      rz * rz + (1.0 - rz * rz) * c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def axis_angle_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> quaternion (w, x, y, z) (..., 4).

    Matches transformation_util.py (PyTorch3D convention) including the
    small-angle Taylor branch of sin(theta/2)/theta.
    """
    angles = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x ~= 1/2 - x^2/48 for small x
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles))
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over], axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack([
        1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
        two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
        two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix via quaternions (transformation_util.py)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def posevec_representation(posevec: jnp.ndarray, rep: str) -> jnp.ndarray:
    """Pose-condition representation (reference network.py:709-722).

    axis_angle: passthrough (69,)
    matrix:     I - R(pose) flattened (23*9,) so the rest pose maps to 0
    quaternion: q(pose) - q(0) flattened (23*4,)
    """
    if rep == "axis_angle":
        return posevec
    aa = posevec.reshape(posevec.shape[:-1] + (-1, 3))
    if rep == "matrix":
        rest = axis_angle_to_matrix(jnp.zeros_like(aa))
        pose = axis_angle_to_matrix(aa)
        return (rest - pose).reshape(posevec.shape[:-1] + (-1,))
    if rep == "quaternion":
        rest = axis_angle_to_quaternion(jnp.zeros_like(aa))
        pose = axis_angle_to_quaternion(aa)
        return (pose - rest).reshape(posevec.shape[:-1] + (-1,))
    raise ValueError(f"unknown posevec representation: {rep}")
