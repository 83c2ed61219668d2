"""Iterative pose refinement — one compiled graph, no host round-trips.

TPU redesign of PoseRefinePredictor.predict (predict_pose_refine.py:149-295):
the render -> crop -> network -> delta -> pose-update loop runs as a
lax.scan over the (static) iteration count inside a single jit. The
reference's per-iteration chunking (512-pose renders, 1024-pose forwards)
disappears: the whole hypothesis batch is one tensor, sharded across
devices by the caller when a mesh is available.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401
from ..geometry.rotations import rotation_6d_to_matrix, so3_exp_map
from ..geometry.transforms import egocentric_delta_pose_to_pose
from ..models.networks import apply_refine_net
from .config import RefinerCfg
from .crops import make_crop_inputs
from .mesh_tensors import MeshTensors


def apply_pose_delta(
    poses: jax.Array,
    trans: jax.Array,
    rot: jax.Array,
    cfg: RefinerCfg,
    mesh_diameter: jax.Array,
    K: jax.Array | None = None,
    tf_to_crops: jax.Array | None = None,
) -> jax.Array:
    """Network outputs -> updated poses (predict_pose_refine.py:195-231)."""
    if cfg.trans_rep == "tracknet":
        if cfg.normalize_xyz:
            trans_delta = trans * (jnp.asarray(mesh_diameter, jnp.float32) / 2.0)
        else:
            tn = jnp.asarray(cfg.trans_normalizer, jnp.float32)
            trans_delta = jnp.tanh(trans) * tn
    elif cfg.trans_rep == "deepim":
        # uv shift in crop pixels + relative z scale
        # (predict_pose_refine.py:201-215).
        from ..geometry.projection import invert_affine2d, project_points

        t_a = poses[..., :3, 3]
        z_pred = trans[:, 2] * t_a[:, 2]
        uv_a = project_points(t_a, K)  # (N, 2) full-image px
        uv_a_crop = (
            tf_to_crops[:, :2, :2] @ uv_a[..., None]
        )[..., 0] + tf_to_crops[:, :2, 2]
        uv_pred_crop = uv_a_crop + trans[:, :2] * cfg.input_res
        inv_tf = invert_affine2d(tf_to_crops)
        uv_pred = (inv_tf[:, :2, :2] @ uv_pred_crop[..., None])[..., 0] + inv_tf[:, :2, 2]
        x = (uv_pred[:, 0] - K[0, 2]) / K[0, 0] * z_pred
        y = (uv_pred[:, 1] - K[1, 2]) / K[1, 1] * z_pred
        trans_delta = jnp.stack([x, y, z_pred], axis=-1) - t_a
    else:
        raise NotImplementedError(f"trans_rep={cfg.trans_rep}")

    if cfg.rot_rep == "axis_angle":
        rot_mat_delta = so3_exp_map(jnp.tanh(rot) * cfg.rot_normalizer)
        rot_mat_delta = jnp.swapaxes(rot_mat_delta, -1, -2)
    elif cfg.rot_rep == "6d":
        rot_mat_delta = jnp.swapaxes(rotation_6d_to_matrix(rot), -1, -2)
    else:
        raise NotImplementedError(f"rot_rep={cfg.rot_rep}")

    return egocentric_delta_pose_to_pose(poses, trans_delta, rot_mat_delta)


@functools.partial(
    jax.jit, static_argnames=("cfg", "iterations", "return_history")
)
def refine_poses(
    params,
    cfg: RefinerCfg,
    mesh: MeshTensors,
    poses: jax.Array,  # (N, 4, 4)
    K: jax.Array,
    rgb: jax.Array,  # (H, W, 3) [0, 1]
    xyz_map: jax.Array,  # (H, W, 3)
    mesh_diameter: jax.Array,
    iterations: int = 5,
    return_history: bool = False,
) -> jax.Array:
    """Refine all hypotheses `iterations` times; returns (N, 4, 4).

    return_history=True additionally returns the PRE-step poses of
    every iteration, stacked (iterations, N, 4, 4) — the trajectory
    the debug canvases visualize (predict_pose_refine.py:241-293
    dumps the same per-iteration input views in the reference).
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step(cur_poses, _):
        a, b, _tf = make_crop_inputs(
            mesh,
            cur_poses,
            K,
            rgb,
            xyz_map,
            mesh_diameter,
            input_res=cfg.input_res,
            crop_ratio=cfg.crop_ratio,
            normalize_xyz=cfg.normalize_xyz,
            invalid_z=cfg.xyz_invalid_z,
            use_normal=cfg.use_normal,
            raster=cfg.raster,
        )
        out = apply_refine_net(params, cfg.net, a, b, dtype=dtype)
        new_poses = apply_pose_delta(
            cur_poses, out["trans"], out["rot"], cfg, mesh_diameter,
            K=K, tf_to_crops=_tf,
        )
        return new_poses, (cur_poses if return_history else None)

    refined, hist = jax.lax.scan(
        step, poses.astype(jnp.float32), None, length=iterations
    )
    if return_history:
        return refined, hist
    return refined
