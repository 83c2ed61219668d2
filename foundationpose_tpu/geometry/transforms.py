"""Homogeneous transforms and the refiner's egocentric delta-pose algebra.

Pure-JAX replacement for the reference's pose math (Utils.py:511-556,
Utils.py:838-855). Batched over leading dims, static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_homo(pts: jax.Array) -> jax.Array:
    """(..., D) -> (..., D+1) with a trailing 1 (Utils.py:520-526)."""
    ones = jnp.ones((*pts.shape[:-1], 1), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def transform_pts(pts: jax.Array, tf: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) (or (...,3,3) for 2D) transforms to (..., N, D) points.

    Broadcasting contract matches Utils.py:529-536: if tf has a batch dim
    that differs from the points dim, a new axis is inserted so each
    transform applies to every point.
    """
    if tf.ndim >= 3 and tf.shape[-3] != pts.shape[-2]:
        tf = tf[..., None, :, :]
    return (tf[..., :-1, :-1] @ pts[..., None] + tf[..., :-1, -1:])[..., 0]


def transform_dirs(dirs: jax.Array, tf: jax.Array) -> jax.Array:
    """Rotate direction vectors by the rotation block of tf (Utils.py:539-546)."""
    if tf.ndim >= 3 and tf.shape[-3] != dirs.shape[-2]:
        tf = tf[..., None, :, :]
    return (tf[..., :3, :3] @ dirs[..., None])[..., 0]


def normalize_rotation(pose: jax.Array) -> jax.Array:
    """Remove per-column scale from the rotation block (Utils.py:270-276)."""
    scales = jnp.linalg.norm(pose[..., :3, :3], axis=-2, keepdims=True)
    return pose.at[..., :3, :3].set(pose[..., :3, :3] / scales)


def make_pose(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    out = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), (*batch, 4, 4))
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    return out


def invert_pose(pose: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -(Rt @ t[..., None])[..., 0])


def pose_to_egocentric_delta_pose(A_in_cam: jax.Array, B_in_cam: jax.Array):
    """Relative pose in the camera's egocentric view (Utils.py:838-844).

    Translation delta lives in the camera frame; rotation delta is the
    left-multiplied update R_B = dR @ R_A.
    """
    trans_delta = B_in_cam[..., :3, 3] - A_in_cam[..., :3, 3]
    rot_delta = B_in_cam[..., :3, :3] @ jnp.swapaxes(A_in_cam[..., :3, :3], -1, -2)
    return trans_delta, rot_delta


def egocentric_delta_pose_to_pose(
    A_in_cam: jax.Array, trans_delta: jax.Array, rot_mat_delta: jax.Array
) -> jax.Array:
    """Apply an egocentric delta (Utils.py:848-855): t += dt, R = dR @ R."""
    return make_pose(
        rot_mat_delta @ A_in_cam[..., :3, :3],
        A_in_cam[..., :3, 3] + trans_delta,
    )
