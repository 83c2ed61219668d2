"""Debug-artifact dumping (SURVEY.md §4.3): rendered-vs-observed crop
canvases for the refiner/scorer, written when FoundationPose(debug>=2).

Mirrors the reference's vis canvases (predict_pose_refine.py:241-293,
predict_score.py:27-52): per hypothesis one row [rgbA | depthA | rgbB |
depthB], rows stacked by score rank.
"""
from __future__ import annotations

import os

import numpy as np

from .vis import depth_to_vis, make_grid_image


def crop_canvas(a: np.ndarray, b: np.ndarray, scores=None, max_rows: int = 16):
    """a, b: (N, H, W, 6) crop inputs (rgb + centered xyz). Returns one
    uint8 canvas image."""
    n = min(len(a), max_rows)
    rows = []
    for i in range(n):
        rgb_a = (np.clip(a[i, ..., :3], 0, 1) * 255).astype(np.uint8)
        rgb_b = (np.clip(b[i, ..., :3], 0, 1) * 255).astype(np.uint8)
        za = a[i, ..., 5]
        zb = b[i, ..., 5]
        zmin = min(za.min(), zb.min())
        zmax = max(za.max(), zb.max(), zmin + 1e-6)
        da = depth_to_vis(za - zmin + 1e-3, zmin=0, zmax=zmax - zmin, inverse=False)
        db = depth_to_vis(zb - zmin + 1e-3, zmin=0, zmax=zmax - zmin, inverse=False)
        row = make_grid_image([rgb_a, da, rgb_b, db], nrow=4, padding=2)
        rows.append(row)
    return make_grid_image(rows, nrow=1, padding=4)


def dump_register_debug(est, debug_dir: str, K, rgb, depth) -> None:
    """Write refiner/scorer-style crop canvases for the top hypotheses of
    the last register() call."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from ..geometry.projection import depth_to_xyz_map
    from ..pipeline.crops import make_crop_inputs

    os.makedirs(debug_dir, exist_ok=True)
    poses = est.poses[:16]
    rgb_j = jnp.asarray(rgb, jnp.float32) / 255.0
    xyz = depth_to_xyz_map(jnp.asarray(depth, jnp.float32), jnp.asarray(K, jnp.float32))
    cfg = est.cfg.scorer
    a, b, _ = make_crop_inputs(
        est.mesh_tensors, poses, jnp.asarray(K, jnp.float32), rgb_j, xyz,
        jnp.float32(est.diameter),
        input_res=cfg.input_res, crop_ratio=cfg.crop_ratio,
        normalize_xyz=cfg.normalize_xyz, invalid_z=cfg.xyz_invalid_z,
        raster=cfg.raster,
    )
    canvas = crop_canvas(np.asarray(a), np.asarray(b), np.asarray(est.scores[:16]))
    imageio.imwrite(os.path.join(debug_dir, "vis_score.png"), canvas)


def dump_refiner_debug(est, debug_dir: str, K, rgb, depth, iterations) -> None:
    """Per-iteration refiner side-by-sides for the WINNING hypothesis
    (vis_refiner_iter{i}.png), mirroring predict_pose_refine.py:241-293.

    The fused register graph keeps no intermediates, so the winner's
    trajectory is re-derived by re-refining its initial hypothesis
    (rotation-grid row + device translation guess) — deterministic, so
    it replays the same path; N=1, a negligible fraction of the
    register's cost."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from ..geometry.projection import depth_to_xyz_map
    from ..pipeline.crops import make_crop_inputs
    from ..pipeline.refiner import refine_poses

    if est._guess_center is None or not est.has_refiner:
        return
    os.makedirs(debug_dir, exist_ok=True)
    init = np.asarray(est.rot_grid[est.best_id], np.float32).copy()
    init[:3, 3] = est._guess_center
    rgb_j = jnp.asarray(rgb, jnp.float32) / 255.0
    Kj = jnp.asarray(K, jnp.float32)
    xyz = depth_to_xyz_map(jnp.asarray(depth, jnp.float32), Kj)
    cfg = est.cfg.refiner
    _, hist = refine_poses(
        est.refiner_params, cfg, est.mesh_tensors, jnp.asarray(init[None]),
        Kj, rgb_j, xyz, jnp.float32(est.diameter),
        iterations=iterations, return_history=True,
    )
    for i in range(hist.shape[0]):
        a, b, _ = make_crop_inputs(
            est.mesh_tensors, hist[i], Kj, rgb_j, xyz,
            jnp.float32(est.diameter),
            input_res=cfg.input_res, crop_ratio=cfg.crop_ratio,
            normalize_xyz=cfg.normalize_xyz, invalid_z=cfg.xyz_invalid_z,
            raster=cfg.raster,
        )
        canvas = crop_canvas(np.asarray(a), np.asarray(b))
        imageio.imwrite(
            os.path.join(debug_dir, f"vis_refiner_iter{i}.png"), canvas
        )


def dump_transformed_mesh(est, debug_dir: str, pose: np.ndarray) -> None:
    """debug>=3: export the object mesh transformed by the estimated
    pose (model_tf.obj), matching run_demo.py:54-61 / estimater.py's
    debug>=3 dumps in the reference."""
    os.makedirs(debug_dir, exist_ok=True)
    mesh = est.mesh.copy()
    # est.mesh is recentered at reset; the returned pose maps the
    # ORIGINAL model frame, so restore the center before transforming.
    v = mesh.vertices + np.asarray(est.model_center).reshape(1, 3)
    v = v @ pose[:3, :3].T + pose[:3, 3]
    mesh.vertices = v.astype(mesh.vertices.dtype)
    mesh.export(os.path.join(debug_dir, "model_tf.obj"))
