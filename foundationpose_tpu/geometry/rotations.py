"""Rotation parameterizations and maps, pure JAX.

TPU-native replacement for the reference's PyTorch3D dependency
(reference: Utils.py:11, learning/training/predict_pose_refine.py:220-226,
bundlesdf/nerf_helpers.py:44-64). Everything here is a pure function over
jnp arrays, batched over leading dimensions, f32, jit/vmap friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def so3_exp_map(log_rot: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via Rodrigues.

    Matches pytorch3d.transforms.so3_exp_map semantics (used by the
    reference refiner at predict_pose_refine.py:222): R = exp(hat(w)),
    which maps column vectors as p' = R p.
    """
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    small = theta2 < 1e-8
    # Double-where: sqrt input is made constant in the small branch so its
    # infinite derivative at 0 never reaches the gradient (theta=0 is the
    # common case — zeroed heads, identity pose corrections).
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe_t = jnp.sqrt(theta2_safe)
    sin_t_over_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    one_minus_cos_over_t2 = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / theta2_safe
    )
    K = hat(log_rot)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return (
        eye
        + sin_t_over_t[..., None, None] * K
        + one_minus_cos_over_t2[..., None, None] * KK
    )


def so3_log_map(R: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Antisymmetric part gives axis*sin(theta).
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta < 1e-4
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(small, jnp.ones_like(sin_theta), sin_theta)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_sin))
    # Note: does not handle theta ~ pi exactly; adequate for refinement deltas.
    return w * scale[..., None]


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D rotation rep (Zhou et al. CVPR'19) -> (..., 3, 3).

    Matches pytorch3d.transforms.rotation_6d_to_matrix: the two 3-vectors
    are Gram-Schmidt orthonormalized and stacked as matrix ROWS.
    """
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> first two rows flattened (..., 6)."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def rot_x(a):
    a = jnp.asarray(a, dtype=jnp.float32)
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        axis=-2,
    )


def rot_y(a):
    a = jnp.asarray(a, dtype=jnp.float32)
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        axis=-2,
    )


def rot_z(a):
    a = jnp.asarray(a, dtype=jnp.float32)
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def euler_matrix(ax, ay, az) -> jax.Array:
    """Static-frame XYZ euler angles -> 4x4 homogeneous rotation.

    Equivalent to transformations.euler_matrix(ax, ay, az, 'sxyz') as used
    by the reference (estimater.py:113 with only az nonzero, and
    Utils.py:828 with at most one axis nonzero, where all conventions
    coincide). Static 'sxyz' composes as Rz @ Ry @ Rx.
    """
    R = rot_z(az) @ rot_y(ay) @ rot_x(ax)
    out = jnp.eye(4, dtype=jnp.float32)
    return out.at[:3, :3].set(R)
