"""Online synthetic training-pair generation for refiner/scorer training.

The reference trained on pre-rendered HDF5 pairs (its trainer was never
released; only `make_pair_online` hints at an online path,
training_config.py:31). This framework renders training pairs on the fly
with its own rasterizer — a fully self-contained, TPU-resident data
path: sample a GT pose + a perturbed hypothesis, render both into their
crops, and emit the network inputs plus delta targets in the network's
output space (the exact inverse of refiner.apply_pose_delta).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401
from ..geometry.rotations import so3_exp_map, so3_log_map
from ..geometry.transforms import pose_to_egocentric_delta_pose
from ..pipeline.config import RefinerCfg
from ..pipeline.crops import make_crop_inputs
from ..pipeline.mesh_tensors import MeshTensors


def sample_pose_pairs(
    key: jax.Array,
    n: int,
    center_dist: float = 0.8,
    trans_sigma: float = 0.01,
    rot_sigma: float = 0.15,
):
    """(poseA perturbed (n,4,4), poseB gt (n,4,4)) with random rotations."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w_gt = jax.random.normal(k1, (n, 3)) * 1.5
    R_gt = so3_exp_map(w_gt)
    t_gt = jnp.array([0.0, 0.0, center_dist])[None] + jax.random.normal(
        k2, (n, 3)
    ) * jnp.array([0.05, 0.05, 0.1])
    eye = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
    poseB = eye.at[:, :3, :3].set(R_gt).at[:, :3, 3].set(t_gt)

    dw = jax.random.normal(k3, (n, 3)) * rot_sigma
    dt = jax.random.normal(k4, (n, 3)) * trans_sigma
    dR = so3_exp_map(dw)
    poseA = eye.at[:, :3, :3].set(dR @ R_gt).at[:, :3, 3].set(t_gt + dt)
    return poseA, poseB


def delta_targets(poseA, poseB, cfg: RefinerCfg, mesh_diameter):
    """Network-output-space targets inverting apply_pose_delta.

    tracknet+normalize_xyz: trans_out = dt / (diameter/2);
    rot (axis_angle): rot_out = atanh(log(dR^T) / rot_normalizer).
    """
    dt, dR = pose_to_egocentric_delta_pose(poseA, poseB)
    if cfg.normalize_xyz:
        trans_t = dt / (jnp.asarray(mesh_diameter) / 2.0)
    else:
        tn = jnp.asarray(cfg.trans_normalizer)
        trans_t = jnp.arctanh(jnp.clip(dt / tn, -0.999, 0.999))
    w = so3_log_map(jnp.swapaxes(dR, -1, -2))
    rot_t = jnp.arctanh(jnp.clip(w / cfg.rot_normalizer, -0.999, 0.999))
    return trans_t, rot_t


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n", "frame_hw", "rot_sigma", "trans_sigma"),
)
def make_refiner_batch(
    key: jax.Array,
    mesh: MeshTensors,
    K: jax.Array,
    cfg: RefinerCfg,
    mesh_diameter: jax.Array,
    n: int = 16,
    frame_hw: tuple[int, int] = (480, 640),
    rot_sigma: float = 0.15,
    trans_sigma: float = 0.01,
):
    """Fully on-device synthetic refiner batch: renders the observation
    (gt pose) and the hypothesis (perturbed pose) crops and returns
    {'A','B','trans_target','rot_target'}. rot/trans_sigma set the
    perturbation scale — train with ~half the rotation-grid spacing to
    give registration hypotheses a wide convergence basin."""
    from ..ops.rasterizer import render_mesh

    k1, k2 = jax.random.split(key)
    poseA, poseB = sample_pose_pairs(
        k1, n, rot_sigma=rot_sigma, trans_sigma=trans_sigma
    )
    poseA = poseA.astype(jnp.float32)
    poseB = poseB.astype(jnp.float32)

    # Hypothesis branch A: rendered straight into crops.
    a, _b_unused, tf_to_crops = make_crop_inputs(
        mesh, poseA, K, jnp.zeros((*frame_hw, 3)), jnp.zeros((*frame_hw, 3)),
        mesh_diameter,
        input_res=cfg.input_res, crop_ratio=cfg.crop_ratio,
        normalize_xyz=cfg.normalize_xyz, invalid_z=cfg.xyz_invalid_z,
        raster=cfg.raster,
    )

    # Observation branch B: render each gt pose into the SAME crop as its
    # hypothesis (the observation is fixed; its crop follows poseA).
    rend = render_mesh(
        mesh.pos, mesh.faces, poseB, K,
        out_hw=(cfg.input_res, cfg.input_res),
        crop_tf=tf_to_crops,
        vertex_color=mesh.vertex_color, uv=mesh.uv, tex=mesh.tex,
        vnormals=mesh.vnormals, use_light=True,
        method=cfg.raster.method, tile=cfg.raster.tile,
        max_faces_per_tile=cfg.raster.max_faces_per_tile,
        cull_backfaces=cfg.raster.cull_backfaces,
        pose_block=cfg.raster.pose_block,
    )
    xyz_b = rend.xyz - poseA[:, None, None, :3, 3]
    if cfg.normalize_xyz:
        radius = jnp.asarray(mesh_diameter) / 2.0
        invalid = rend.xyz[..., 2:3] < cfg.xyz_invalid_z
        xyz_b = xyz_b / radius
        invalid = invalid | (jnp.abs(xyz_b) >= 2)
        xyz_b = jnp.where(invalid, 0.0, xyz_b)
    b = jnp.concatenate([rend.color, xyz_b], axis=-1)

    trans_t, rot_t = delta_targets(poseA, poseB, cfg, mesh_diameter)
    return {
        "A": a,
        "B": b,
        "trans_target": trans_t.astype(jnp.float32),
        "rot_target": rot_t.astype(jnp.float32),
        "poseA": poseA,
        "poseB": poseB,
    }


@functools.partial(
    jax.jit, static_argnames=("cfg", "n", "frame_hw", "rot_sigma", "trans_sigma")
)
def make_scorer_batch(
    key: jax.Array,
    mesh: MeshTensors,
    K: jax.Array,
    cfg,  # ScorerCfg
    mesh_diameter: jax.Array,
    n: int = 16,
    frame_hw: tuple[int, int] = (120, 160),
    rot_sigma: float = 1.2,
    trans_sigma: float = 0.03,
    scene_key: jax.Array | None = None,
):
    """One hypothesis GROUP around one gt pose for contrastive scorer
    training (training.score_loss_fn): the observation frame is rendered
    at gt, the n hypotheses carry graded perturbations (first ~exact, the
    last registration-grid-scale rotations), and 'target' holds
    ADD-derived soft logits (-ADD / 0.05 d). scene_key pins the gt pose
    (fixed-scene training) while `key` varies the perturbations."""
    from ..ops.rasterizer import render_mesh

    k1, k2, k3 = jax.random.split(key, 3)
    if scene_key is not None:
        k1 = scene_key
    _, poseB1 = sample_pose_pairs(k1, 1)
    gt = poseB1[0].astype(jnp.float32)

    scales = jnp.linspace(0.0, 1.0, n)[:, None]
    dw = jax.random.normal(k2, (n, 3)) * rot_sigma * scales
    dt = jax.random.normal(k3, (n, 3)) * trans_sigma * scales
    dR = so3_exp_map(dw)
    hyp = (
        jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        .at[:, :3, :3].set(dR @ gt[:3, :3])
        .at[:, :3, 3].set(gt[:3, 3] + dt)
        .astype(jnp.float32)
    )

    out = render_mesh(
        mesh.pos, mesh.faces, gt[None], K, out_hw=frame_hw,
        vertex_color=mesh.vertex_color, uv=mesh.uv, tex=mesh.tex,
        vnormals=mesh.vnormals, use_light=True,
        method=cfg.raster.method, tile=cfg.raster.tile,
        max_faces_per_tile=cfg.raster.max_faces_per_tile,
        cull_backfaces=cfg.raster.cull_backfaces,
        pose_block=cfg.raster.pose_block,
    )
    a, b, _tf = make_crop_inputs(
        mesh, hyp, K, out.color[0], out.xyz[0], mesh_diameter,
        input_res=cfg.input_res, crop_ratio=cfg.crop_ratio,
        normalize_xyz=cfg.normalize_xyz, invalid_z=cfg.xyz_invalid_z,
        use_normal=cfg.use_normal, raster=cfg.raster,
    )

    pts_h = jnp.einsum("nij,pj->npi", hyp[:, :3, :3], mesh.pos) + hyp[:, None, :3, 3]
    pts_g = mesh.pos @ gt[:3, :3].T + gt[:3, 3]
    add = jnp.linalg.norm(pts_h - pts_g[None], axis=-1).mean(axis=-1)
    target = -add / (0.05 * jnp.asarray(mesh_diameter))
    return {"A": a, "B": b, "target": target, "poses": hyp, "gt": gt,
            "add": add}
