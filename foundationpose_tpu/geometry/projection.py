"""Camera projection, depth->XYZ maps, and crop-window homographies.

TPU-native design note: the reference routes rendering through OpenGL
clip space (projection_matrix_from_intrinsics at Utils.py:752-802, the
glcam_in_cvcam flip at Utils.py:68-71,159 and a final image Y-flip at
Utils.py:216-218). Our Pallas/XLA rasterizer works directly in OpenCV
pixel space, so the only projection used on the hot path is the pinhole
K-projection below; the GL matrix is kept for parity tooling only.

Pixel convention (single source of truth for the whole framework):
integer pixel index (row i, col j) has continuous coordinates
(u, v) = (j, i); K projects camera points to this continuous frame.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV cam -> OpenGL cam basis change (Utils.py:68-71). Kept for
# conversion utilities / parity tests only; the hot path never uses it.
GLCAM_IN_CVCAM = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32
)


def project_points(pts_cam: jax.Array, K: jax.Array) -> jax.Array:
    """Pinhole-project camera-space points (..., 3) -> pixel coords (..., 2)."""
    z = pts_cam[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = pts_cam[..., 0:1] * K[0, 0] / z_safe + K[0, 2]
    v = pts_cam[..., 1:2] * K[1, 1] / z_safe + K[1, 2]
    return jnp.concatenate([u, v], axis=-1)


def depth_to_xyz_map(depth: jax.Array, K: jax.Array, zfar: float = np.inf) -> jax.Array:
    """Per-pixel camera-space XYZ from depth (..., H, W) -> (..., H, W, 3).

    Invalid pixels (z < 0.001 or z > zfar) become zeros, matching
    Utils.py:399-438 (both the single and batch variants).
    """
    H, W = depth.shape[-2], depth.shape[-1]
    us = jnp.arange(W, dtype=depth.dtype)
    vs = jnp.arange(H, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(us, vs, indexing="xy")
    xs = (uu - K[0, 2]) * depth / K[0, 0]
    ys = (vv - K[1, 2]) * depth / K[1, 1]
    xyz = jnp.stack([xs, ys, depth], axis=-1)
    invalid = (depth < 0.001) | (depth > zfar)
    return jnp.where(invalid[..., None], 0.0, xyz)


def compute_crop_window_tf(
    poses: jax.Array,
    K: jax.Array,
    crop_ratio: float,
    out_size: int,
    mesh_diameter: float,
    round_box: bool = True,
) -> jax.Array:
    """Per-pose 2D crop homography, 'box_3d' method (Utils.py:577-626).

    Projects the object center and four in-plane offsets at radius
    mesh_diameter*crop_ratio/2, takes the max pixel extent as a square
    half-width, and returns (N, 3, 3) affine maps from full-image pixel
    coords to out_size x out_size crop coords.
    """
    radius = mesh_diameter * crop_ratio / 2.0
    offsets = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [radius, 0.0, 0.0],
            [-radius, 0.0, 0.0],
            [0.0, radius, 0.0],
            [0.0, -radius, 0.0],
        ],
        dtype=poses.dtype,
    )
    pts = poses[:, None, :3, 3] + offsets[None]  # (N, 5, 3)
    uvs = project_points(pts, K)  # (N, 5, 2)
    center = uvs[:, 0]  # (N, 2)
    r = jnp.max(
        jnp.abs(uvs - center[:, None]).reshape(poses.shape[0], -1), axis=-1
    )  # (N,)
    left = center[:, 0] - r
    right = center[:, 0] + r
    top = center[:, 1] - r
    bottom = center[:, 1] + r
    if round_box:
        left, right = jnp.round(left), jnp.round(right)
        top, bottom = jnp.round(top), jnp.round(bottom)
    sx = out_size / (right - left)
    sy = out_size / (bottom - top)
    N = poses.shape[0]
    z = jnp.zeros((N,), dtype=poses.dtype)
    o = jnp.ones((N,), dtype=poses.dtype)
    tf = jnp.stack(
        [
            jnp.stack([sx, z, -left * sx], -1),
            jnp.stack([z, sy, -top * sy], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    return tf


def invert_affine2d(tf: jax.Array) -> jax.Array:
    """Invert (..., 3, 3) affine crop transforms in closed form."""
    sx = tf[..., 0, 0]
    sy = tf[..., 1, 1]
    tx = tf[..., 0, 2]
    ty = tf[..., 1, 2]
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    inv = jnp.stack(
        [
            jnp.stack([1.0 / sx, z, -tx / sx], -1),
            jnp.stack([z, 1.0 / sy, -ty / sy], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    return inv


def guess_translation(
    depth: np.ndarray, mask: np.ndarray, K: np.ndarray
) -> np.ndarray:
    """Initial translation: mask-bbox center ray x masked median depth.

    Host-side numpy (runs once per registration; estimater.py:137-156).
    """
    vs, us = np.where(mask > 0)
    if len(us) == 0:
        return np.zeros(3, dtype=np.float64)
    uc = (us.min() + us.max()) / 2.0
    vc = (vs.min() + vs.max()) / 2.0
    valid = (mask.astype(bool)) & (depth >= 0.001)
    if not valid.any():
        return np.zeros(3, dtype=np.float64)
    zc = np.median(depth[valid])
    center = (np.linalg.inv(K) @ np.array([uc, vc, 1.0]).reshape(3, 1)) * zc
    return center.reshape(3)


def projection_matrix_from_intrinsics(
    K: np.ndarray, height: int, width: int, znear: float, zfar: float
) -> np.ndarray:
    """OpenGL projection matrix from K (y_down convention, Utils.py:792-798).

    Not used by the TPU rasterizer (which projects directly with K); kept
    for cross-checking conventions against GL-based renderers.
    """
    fc, nc = zfar, znear
    depth = float(fc - nc)
    q = -(fc + nc) / depth
    qn = -2 * (fc * nc) / depth
    proj = np.array(
        [
            [2 * K[0, 0] / width, -2 * K[0, 1] / width, (-2 * K[0, 2] + width) / width, 0],
            [0, 2 * K[1, 1] / height, (2 * K[1, 2] - height) / height, 0],
            [0, 0, q, qn],
            [0, 0, -1, 0],
        ],
        dtype=np.float64,
    )
    return proj
