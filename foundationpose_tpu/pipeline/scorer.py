"""Hypothesis scoring — full comparison group in one compiled pass.

TPU redesign of ScorePredictor.predict (predict_score.py:160-226): all N
refined hypotheses form one cross-attention comparison group (the
reference's tournament while-loop only iterates when its chunk size
splits the batch, which it never does at N=252 — predict_score.py:186
sets bs = N). A classical depth-alignment scorer is provided as a
weights-free fallback and as the oracle for integration tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401
from ..models.networks import apply_score_net
from .config import ScorerCfg
from .crops import make_crop_inputs
from .mesh_tensors import MeshTensors


def _depth_alignment_scores(a: jax.Array, b: jax.Array) -> jax.Array:
    """Classical score: negative masked distance between rendered and
    observed centered-XYZ crops, plus an overlap reward. No weights."""
    xyz_a = a[..., 3:6]
    xyz_b = b[..., 3:6]
    valid_a = jnp.any(jnp.abs(xyz_a) > 1e-6, axis=-1)
    valid_b = jnp.any(jnp.abs(xyz_b) > 1e-6, axis=-1)
    both = valid_a & valid_b
    either = valid_a | valid_b
    d = jnp.linalg.norm(xyz_a - xyz_b, axis=-1)
    n_both = jnp.sum(both, axis=(1, 2)).astype(jnp.float32)
    n_either = jnp.maximum(jnp.sum(either, axis=(1, 2)).astype(jnp.float32), 1.0)
    mean_d = jnp.sum(jnp.where(both, d, 0.0), axis=(1, 2)) / jnp.maximum(n_both, 1.0)
    # A hypothesis with no overlap must rank below any overlapping one.
    mean_d = jnp.where(n_both > 0, mean_d, 1e3)
    iou = n_both / n_either
    return iou - mean_d * 10.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def score_poses(
    params,
    cfg: ScorerCfg,
    mesh: MeshTensors,
    poses: jax.Array,  # (N, 4, 4)
    K: jax.Array,
    rgb: jax.Array,  # (H, W, 3) [0, 1]
    xyz_map: jax.Array,
    mesh_diameter: jax.Array,
    valid: jax.Array | None = None,  # (N,) mask for padded hypotheses
) -> jax.Array:
    """Score all hypotheses; returns (N,) logits (higher = better)."""
    a, b, _tf = make_crop_inputs(
        mesh,
        poses,
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
    if cfg.mode == "depth":
        scores = _depth_alignment_scores(a, b)
    else:
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        scores = apply_score_net(params, cfg.net, a, b, dtype=dtype)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    return scores


def score_poses_tournament(
    params,
    cfg: ScorerCfg,
    mesh: MeshTensors,
    poses: jax.Array,
    K: jax.Array,
    rgb: jax.Array,
    xyz_map: jax.Array,
    mesh_diameter: jax.Array,
    valid: jax.Array | None = None,
    group_size: int = 252,
) -> jax.Array:
    """Hierarchical tournament for very large hypothesis sets.

    Replicates ScorePredictor's while-loop (predict_score.py:202-213):
    when N exceeds group_size, hypotheses are scored in chunks, chunk
    winners advance, and the final round's scores get +100 so winners
    outrank everything eliminated earlier. For N <= group_size this is a
    single score_poses pass (the reference's common case at N=252).
    """
    import numpy as np

    N = poses.shape[0]
    if N <= group_size:
        return score_poses(
            params, cfg, mesh, poses, K, rgb, xyz_map, mesh_diameter, valid=valid
        )

    scores_global = jnp.zeros((N,), jnp.float32)
    global_ids = np.arange(N)
    cur = poses
    cur_valid = valid
    while True:
        n = cur.shape[0]
        pad = (-n) % group_size
        if pad:
            cur = jnp.concatenate([cur, cur[:pad]], axis=0)
            v = cur_valid if cur_valid is not None else jnp.ones((n,), bool)
            cur_valid = jnp.concatenate([v, jnp.zeros((pad,), bool)])
        elif cur_valid is None:
            cur_valid = jnp.ones((n,), bool)
        n_chunks = cur.shape[0] // group_size
        scores = []
        for c in range(n_chunks):
            s = score_poses(
                params, cfg, mesh,
                cur[c * group_size : (c + 1) * group_size],
                K, rgb, xyz_map, mesh_diameter,
                valid=cur_valid[c * group_size : (c + 1) * group_size],
            )
            scores.append(s)
        scores_padded = jnp.concatenate(scores)  # (n_chunks * group_size,)
        if n_chunks == 1:
            scores_global = scores_global.at[global_ids].set(
                scores_padded[: len(global_ids)] + 100.0
            )
            break
        winners = np.asarray(
            jnp.argmax(scores_padded.reshape(n_chunks, group_size), axis=-1)
        ) + np.arange(n_chunks) * group_size
        winners = winners[winners < n]
        global_ids = global_ids[winners]
        cur = poses[jnp.asarray(global_ids)]
        cur_valid = valid[jnp.asarray(global_ids)] if valid is not None else None
    return scores_global
