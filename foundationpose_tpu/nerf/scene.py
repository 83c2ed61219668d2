"""Scene-bounds normalization for the neural object field (host numpy).

Replaces bundlesdf/tool.py:17-130: fuse masked depth clouds in the
object frame, keep the biggest DBSCAN cluster, normalize to [-1,1]*0.9.
Everything stays in the OpenCV camera convention (the reference converts
through OpenGL; this framework never does).
"""
from __future__ import annotations

import numpy as np

from ..meshio import voxel_downsample

BAD_DEPTH = 99.0
BAD_COLOR = 0


def _depth_to_xyz(depth, K):
    H, W = depth.shape
    u, v = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    z = depth
    x = (u - K[0, 2]) * z / K[0, 0]
    y = (v - K[1, 2]) * z / K[1, 1]
    return np.stack([x, y, z], axis=-1)


def compute_scene_bounds(
    K, rgbs, depths, masks, cam_in_obs, eps=0.01, min_samples=1
):
    """-> (sc_factor, translation, pts_normalized (N, 3), colors (N, 3))."""
    pts_all = []
    colors_all = []
    for i in range(len(rgbs)):
        xyz = _depth_to_xyz(depths[i], K)
        valid = (depths[i] >= 0.1) & (masks[i] > 0)
        pts = xyz[valid]
        if len(pts) == 0:
            continue
        pts, _ = voxel_downsample(pts, 0.01)
        # into object frame
        pts = pts @ cam_in_obs[i][:3, :3].T + cam_in_obs[i][:3, 3]
        pts_all.append(pts)
        colors_all.append(np.full((len(pts), 3), 128, np.uint8))
    pts = np.concatenate(pts_all)
    pts, _ = voxel_downsample(pts, eps / 5)

    from sklearn.cluster import DBSCAN

    labels = DBSCAN(eps=eps, min_samples=min_samples, n_jobs=-1).fit(pts).labels_
    ids, cnts = np.unique(labels, return_counts=True)
    keep = labels == ids[np.argmax(cnts)]
    pts = pts[keep]

    max_xyz = pts.max(axis=0)
    min_xyz = pts.min(axis=0)
    center = (max_xyz + min_xyz) / 2
    sc_factor = 2.0 / (max_xyz - min_xyz).max() * 0.9
    translation = -center
    pts_norm = (pts + translation) * sc_factor
    return float(sc_factor), translation, pts_norm


def preprocess_data(rgbs, depths, masks, poses, sc_factor, translation):
    """Normalize frames + poses (nerf_helpers.py:252-274, CV convention).

    poses: cam_in_ob (N, 4, 4). Depths scaled to normalized units; pixels
    outside the mask get BAD_DEPTH/BAD_COLOR.
    """
    rgbs = np.asarray(rgbs).copy()
    depths = np.asarray(depths).astype(np.float32).copy()
    poses = np.asarray(poses).astype(np.float64).copy()
    depths[depths < 0.001] = BAD_DEPTH
    if masks is not None:
        rgbs[masks == 0] = BAD_COLOR
        depths[masks == 0] = BAD_DEPTH
    rgbs = (rgbs / 255.0).astype(np.float32)
    depths = depths * sc_factor
    poses[:, :3, 3] = (poses[:, :3, 3] + translation) * sc_factor
    return rgbs, depths, poses
