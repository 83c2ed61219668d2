"""Dense occupancy grid + occupied-space ray sampling (pure JAX).

Replaces the reference's kaolin SPC octree + CUDA postprocessing
(Utils.py:904-993 OctreeManager, bundlesdf/mycuda/common.cu:42-168):
the octree there is an acceleration structure, not semantics. On TPU a
dense [-1,1]^3 occupancy grid (~100^3 bools at the 0.02 voxel of the
reference config) with stratified candidate filtering gives the same
"uniform samples inside occupied space, clipped to depth+trunc" behavior
with fully static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import jax_config  # noqa: F401


def build_occupancy_grid(points: np.ndarray, voxel_size: float, dilate: int = 1):
    """Boolean (G, G, G) grid over [-1, 1]^3 from a normalized point cloud.

    Mirrors NerfRunner.build_octree (nerf_runner.py:320-375): occupied
    voxels are those containing points, dilated by the 27-neighborhood
    `dilate` times.
    """
    G = int(np.ceil(2.0 / voxel_size))
    idx = np.floor((points + 1.0) / voxel_size).astype(np.int64)
    idx = np.clip(idx, 0, G - 1)
    occ = np.zeros((G, G, G), dtype=bool)
    occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    for _ in range(dilate):
        p = np.pad(occ, 1)
        acc = np.zeros_like(occ)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    acc |= p[dx : dx + G, dy : dy + G, dz : dz + G]
        occ = acc
    return occ


def ray_box_intersection(rays_o: jax.Array, rays_d: jax.Array, bound: float = 1.0):
    """Slab test against [-bound, bound]^3 (nerf_helpers.py:432-475).

    rays_d need not be unit length; t values are in units of |rays_d|.
    Returns (tmin, tmax, hit); tmin clipped at 0.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    t0 = (-bound - rays_o) * inv_d
    t1 = (bound - rays_o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tmin = jnp.max(tsmall, axis=-1)
    tmax = jnp.min(tbig, axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    hit = tmax > tmin
    return tmin, tmax, hit


def occupancy_lookup(occ: jax.Array, pts: jax.Array) -> jax.Array:
    """occ: (G, G, G) bool; pts: (..., 3) in [-1, 1] -> (...,) bool."""
    G = occ.shape[0]
    idx = jnp.floor((pts + 1.0) / (2.0 / G)).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < G), axis=-1)
    idx = jnp.clip(idx, 0, G - 1)
    return occ[idx[..., 0], idx[..., 1], idx[..., 2]] & inb


@partial(jax.jit, static_argnames=("n_samples", "candidate_mult"))
def sample_occupied(
    occ: jax.Array,
    rays_o: jax.Array,  # (N, 3) in normalized object frame
    rays_d: jax.Array,  # (N, 3), t multiplies this (not unit-normalized)
    key: jax.Array,
    n_samples: int,
    depth: jax.Array | None = None,  # (N,) clip samples to depth + trunc
    trunc: float = 0.0,
    far_clip: float = np.inf,
    candidate_mult: int = 4,
):
    """Uniform samples inside occupied voxels along each ray.

    TPU-native equivalent of octree ray_trace + the CUDA
    sampleRaysUniformOccupiedVoxels (common.cu:42-126): M = mult*n
    stratified candidates span [tmin, teff]; occupied candidates are
    rank-selected so the kept n samples cover the occupied set evenly.
    Returns (z_vals (N, n) ascending, valid (N, n)).
    """
    N = rays_o.shape[0]
    M = candidate_mult * n_samples
    tmin, tmax, hit = ray_box_intersection(rays_o, rays_d)
    teff = tmax
    if depth is not None:
        has_d = (depth > 1e-6) & (depth <= far_clip)
        teff = jnp.where(has_d, jnp.minimum(tmax, depth + trunc), tmax)
    teff = jnp.maximum(teff, tmin + 1e-6)

    # Phase 1: coarse candidates locate the occupied span of each ray.
    # n_samples probes suffice for span FINDING (the pad below absorbs
    # the coarser step); phase 2 re-stratifies at full M inside the
    # span, so sample density is unaffected. Halves the random
    # occupancy fetches of the sampler (measured ~-30 ms/step at the
    # 2048x512 NeRF config).
    Mc = n_samples
    k1, k2 = jax.random.split(key)
    uc = (jnp.arange(Mc, dtype=jnp.float32)[None] + 0.5) / Mc
    t_coarse = tmin[:, None] + (teff - tmin)[:, None] * uc
    pts_c = rays_o[:, None] + rays_d[:, None] * t_coarse[..., None]
    occ_coarse = occupancy_lookup(occ, pts_c) & hit[:, None]
    any_occ = jnp.any(occ_coarse, axis=-1)
    big = jnp.float32(1e30)
    t_first = jnp.min(jnp.where(occ_coarse, t_coarse, big), axis=-1)
    t_last = jnp.max(jnp.where(occ_coarse, t_coarse, -big), axis=-1)
    pad = (teff - tmin) / Mc
    lo = jnp.where(any_occ, jnp.maximum(t_first - pad, tmin), tmin)
    hi = jnp.where(any_occ, jnp.minimum(t_last + pad, teff), teff)

    # Phase 2: stratified candidates inside the occupied span.
    u = (jnp.arange(M, dtype=jnp.float32)[None] + jax.random.uniform(k2, (N, M))) / M
    t_cand = lo[:, None] + (hi - lo)[:, None] * u  # (N, M) ascending
    pts = rays_o[:, None] + rays_d[:, None] * t_cand[..., None]
    occ_c = occupancy_lookup(occ, pts) & hit[:, None]  # (N, M)

    # Rank-select n evenly spaced occupied candidates per ray.
    counts = jnp.sum(occ_c, axis=-1)  # (N,)
    csum = jnp.cumsum(occ_c.astype(jnp.int32), axis=-1)  # (N, M) rank after incl.
    target = (
        jnp.floor(
            (jnp.arange(n_samples, dtype=jnp.float32)[None] + 0.5)
            * counts[:, None].astype(jnp.float32)
            / n_samples
        ).astype(jnp.int32)
        + 1
    )  # (N, n) target 1-based ranks
    # First candidate index whose cumulative count reaches each target.
    sel = jax.vmap(lambda cs, tg: jnp.searchsorted(cs, tg, side="left"))(csum, target)
    sel = jnp.clip(sel, 0, M - 1)
    z = jnp.take_along_axis(t_cand, sel, axis=-1)  # (N, n)
    valid = jnp.arange(n_samples)[None] < jnp.minimum(counts[:, None], n_samples)
    valid = valid & hit[:, None]
    z = jnp.where(valid, z, teff[:, None])
    return z, valid
