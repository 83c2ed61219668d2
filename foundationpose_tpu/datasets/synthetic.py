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


def _occlude_crops(key, b, prob, max_frac):
    """Foreground-occluder augmentation on observation crops (n, res,
    res, C>=6): with probability `prob` per sample, a random rectangle
    (half-extent up to max_frac*res/2 per axis) is replaced by a flat
    random color with ALL geometry channels (xyz + optional normals)
    zeroed — the signature a real occluder leaves after the invalid-z
    masking in make_crop_inputs. The reference trained on datasets with
    physical occluders (SURVEY.md §2.5); this is the online-generation
    equivalent."""
    n, res = b.shape[0], b.shape[1]
    kc, kh, kp, kcol = jax.random.split(key, 4)
    center = jax.random.uniform(kc, (n, 2), minval=0.1 * res, maxval=0.9 * res)
    half = jax.random.uniform(
        kh, (n, 2), minval=0.08 * res, maxval=max_frac * res / 2
    )
    apply = jax.random.uniform(kp, (n,)) < prob
    col = jax.random.uniform(kcol, (n, 1, 1, 3), minval=0.05, maxval=0.9)
    px = jnp.arange(res, dtype=jnp.float32)
    in_x = (
        jnp.abs(px[None, None, :] - center[:, 0, None, None])
        < half[:, 0, None, None]
    )
    in_y = (
        jnp.abs(px[None, :, None] - center[:, 1, None, None])
        < half[:, 1, None, None]
    )
    occ = (in_x & in_y & apply[:, None, None])[..., None]
    color = jnp.where(occ, col, b[..., :3])
    geom = jnp.where(occ, 0.0, b[..., 3:])
    return jnp.concatenate([color, geom], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n", "frame_hw", "rot_sigma", "trans_sigma", "occlude_prob",
        "occlude_max_frac",
    ),
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
    occlude_prob: float = 0.0,
    occlude_max_frac: float = 0.5,
):
    """Fully on-device synthetic refiner batch: renders the observation
    (gt pose) and the hypothesis (perturbed pose) crops and returns
    {'A','B','trans_target','rot_target'}. rot/trans_sigma set the
    perturbation scale — train with ~half the rotation-grid spacing to
    give registration hypotheses a wide convergence basin. occlude_prob
    applies _occlude_crops to the observation branch (robustness to
    foreground occluders)."""
    from ..ops.rasterizer import render_mesh

    k1, k2, k_occ = jax.random.split(key, 3)
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
    if occlude_prob > 0:
        b = _occlude_crops(k_occ, b, occlude_prob, occlude_max_frac)

    trans_t, rot_t = delta_targets(poseA, poseB, cfg, mesh_diameter)
    return {
        "A": a,
        "B": b,
        "trans_target": trans_t.astype(jnp.float32),
        "rot_target": rot_t.astype(jnp.float32),
        "poseA": poseA,
        "poseB": poseB,
    }


def _occlude_frame(key, color, xyz, center_px, r_px, prob, max_frac):
    """Frame-space occluder for scorer batches: ONE rectangle shared by
    the whole hypothesis group (all crops view the same observation),
    placed within the object's projected extent; flat random color,
    geometry zeroed (invalid)."""
    kp, kc, kh, kcol = jax.random.split(key, 4)
    apply = jax.random.uniform(kp, ()) < prob
    c = center_px + jax.random.uniform(kc, (2,), minval=-0.6, maxval=0.6) * r_px
    half = jax.random.uniform(kh, (2,), minval=0.25, maxval=max_frac) * r_px
    col = jax.random.uniform(kcol, (3,), minval=0.05, maxval=0.9)
    H, W = color.shape[:2]
    ux = jnp.arange(W, dtype=jnp.float32)[None, :]
    uy = jnp.arange(H, dtype=jnp.float32)[:, None]
    occ = (
        (jnp.abs(ux - c[0]) < half[0]) & (jnp.abs(uy - c[1]) < half[1]) & apply
    )[..., None]
    return jnp.where(occ, col, color), jnp.where(occ, 0.0, xyz)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n", "frame_hw", "rot_sigma", "trans_sigma", "occlude_prob",
        "occlude_max_frac",
    ),
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
    occlude_prob: float = 0.0,
    occlude_max_frac: float = 0.7,
):
    """One hypothesis GROUP around one gt pose for contrastive scorer
    training (training.score_loss_fn): the observation frame is rendered
    at gt, the n hypotheses carry graded perturbations (first ~exact, the
    last registration-grid-scale rotations), and 'target' holds
    ADD-derived soft logits (-ADD / 0.05 d). scene_key pins the gt pose
    (fixed-scene training) while `key` varies the perturbations."""
    from ..ops.rasterizer import render_mesh

    k1, k2, k3, k_occ = jax.random.split(key, 4)
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
    color_f, xyz_f = out.color[0], out.xyz[0]
    if occlude_prob > 0:
        z = gt[2, 3]
        f = (K[0, 0] + K[1, 1]) / 2.0
        center_px = jnp.stack(
            [K[0, 0] * gt[0, 3] / z + K[0, 2], K[1, 1] * gt[1, 3] / z + K[1, 2]]
        )
        r_px = f * jnp.asarray(mesh_diameter) / 2.0 / z
        color_f, xyz_f = _occlude_frame(
            k_occ, color_f, xyz_f, center_px, r_px, occlude_prob,
            occlude_max_frac,
        )
    a, b, _tf = make_crop_inputs(
        mesh, hyp, K, color_f, xyz_f, mesh_diameter,
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
