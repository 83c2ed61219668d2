"""Hypothesis crop construction: render + observation warp + XYZ centering.

The fused TPU equivalent of the reference's make_crop_data_batch
(predict_pose_refine.py:26-89, predict_score.py:57-114) and the dataset
transform (h5_dataset.py:79-127): every hypothesis is rendered straight
into its 160x160 crop by the rasterizer's ROI path, the observation is
warped once per hypothesis, and both XYZ maps are re-centered on the
hypothesis translation (optionally normalized by mesh radius). Outputs
are NHWC 6-channel network inputs; no host round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401
from ..geometry.projection import compute_crop_window_tf
from ..ops.rasterizer import render_mesh
from ..ops.warp import warp_crop
from .mesh_tensors import MeshTensors


def make_crop_inputs(
    mesh: MeshTensors,
    poses: jax.Array,  # (N, 4, 4)
    K: jax.Array,  # (3, 3)
    rgb: jax.Array,  # (H, W, 3) f32 in [0, 1]
    xyz_map: jax.Array,  # (H, W, 3) observation camera-space XYZ
    mesh_diameter: float | jax.Array,
    *,
    input_res: int,
    crop_ratio: float,
    normalize_xyz: bool,
    invalid_z: float,
    use_light: bool = True,
    use_normal: bool = False,
    raster=None,
):
    """Returns (A, B, tf_to_crops): A/B are (N, res, res, 6) f32 — or
    (N, res, res, 9) with use_normal (3 raw camera-space normal channels
    appended, matching predict_score.py:190-193's post-transform concat;
    observation normals come from xyz-map finite differences — the
    reference's inference path never wires a normal source at all,
    estimater.py:183)."""
    res = int(input_res)
    tf_to_crops = compute_crop_window_tf(
        poses, K, crop_ratio, res, mesh_diameter
    )  # (N, 3, 3)

    raster_kw = {}
    if raster is not None:
        raster_kw = dict(
            method=raster.method,
            tile=raster.tile,
            max_faces_per_tile=raster.max_faces_per_tile,
            cull_backfaces=raster.cull_backfaces,
            pose_block=raster.pose_block,
            raster_rounds=raster.rounds,
        )
    rend = render_mesh(
        mesh.pos,
        mesh.faces,
        poses,
        K,
        out_hw=(res, res),
        crop_tf=tf_to_crops,
        vertex_color=mesh.vertex_color,
        uv=mesh.uv,
        tex=mesh.tex,
        vnormals=mesh.vnormals,
        use_light=use_light,
        get_normal=use_normal,
        **raster_kw,
    )
    rgb_a = rend.color  # (N, res, res, 3) [0,1]
    xyz_a = rend.xyz

    # Crop tfs are axis-aligned -> separable MXU warp (ops/warp.py).
    rgb_b = warp_crop(rgb, tf_to_crops, (res, res), mode="bilinear")
    xyz_b = warp_crop(xyz_map, tf_to_crops, (res, res), mode="nearest")
    if use_normal:
        normal_b = warp_crop(
            normals_from_xyz(xyz_map), tf_to_crops, (res, res),
            mode="nearest",
        )

    t = poses[:, :3, 3][:, None, None, :]  # (N, 1, 1, 3)

    def center(xyz, thres):
        if normalize_xyz:
            invalid = xyz[..., 2:3] < thres
        out = xyz - t
        if normalize_xyz:
            radius = jnp.asarray(mesh_diameter, jnp.float32) / 2.0
            out = out / radius
            invalid = invalid | (jnp.abs(out) >= 2)
            out = jnp.where(invalid, 0.0, out)
        return out

    a_cols = [rgb_a, center(xyz_a, invalid_z)]
    b_cols = [rgb_b, center(xyz_b, invalid_z)]
    if use_normal:
        a_cols.append(rend.normal)
        b_cols.append(normal_b)
    a = jnp.concatenate(a_cols, axis=-1)
    b = jnp.concatenate(b_cols, axis=-1)
    return a, b, tf_to_crops


def normals_from_xyz(xyz_map: jax.Array) -> jax.Array:
    """Camera-space surface normals from an observation XYZ map via
    central differences; zero where depth is invalid, oriented toward
    the camera (n . p <= 0)."""
    valid = xyz_map[..., 2] > 1e-6
    dx = jnp.zeros_like(xyz_map)
    dx = dx.at[:, 1:-1].set(xyz_map[:, 2:] - xyz_map[:, :-2])
    dy = jnp.zeros_like(xyz_map)
    dy = dy.at[1:-1].set(xyz_map[2:] - xyz_map[:-2])
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    flip = jnp.sum(n * xyz_map, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    ok = (
        valid
        & jnp.roll(valid, 1, 0) & jnp.roll(valid, -1, 0)
        & jnp.roll(valid, 1, 1) & jnp.roll(valid, -1, 1)
    )
    return jnp.where(ok[..., None], n, 0.0)
