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
    )
    if cfg.mode == "depth":
        scores = _depth_alignment_scores(a, b)
    else:
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        scores = apply_score_net(params, cfg.net, a, b, dtype=dtype)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    return scores
