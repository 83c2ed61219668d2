"""Depth preprocessing stencils as fused XLA ops.

TPU-native replacement for the reference's NVIDIA-Warp JIT CUDA kernels
(Utils.py:303-395). A 5x5 stencil is tiny; expressing it as 25 static
shifts lets XLA fuse the whole filter into one vectorized elementwise
pass — no custom kernel needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401


def _window_stack(x: jax.Array, radius: int, fill: float):
    """Stack the (2r+1)^2 shifted neighborhoods of (H, W) -> (K, H, W).

    Out-of-bounds positions are filled with `fill`; a parallel in-bounds
    mask stack is returned so callers can reproduce the reference's
    "skip out-of-image neighbors" semantics exactly.
    """
    H, W = x.shape
    k = 2 * radius + 1
    xp = jnp.pad(x, radius, constant_values=fill)
    mp = jnp.pad(jnp.ones((H, W), dtype=bool), radius, constant_values=False)
    wins = []
    masks = []
    for dv in range(k):
        for du in range(k):
            wins.append(jax.lax.dynamic_slice(xp, (dv, du), (H, W)))
            masks.append(jax.lax.dynamic_slice(mp, (dv, du), (H, W)))
    return jnp.stack(wins), jnp.stack(masks)


def erode_depth(
    depth: jax.Array,
    radius: int = 2,
    depth_diff_thres: float = 0.001,
    ratio_thres: float = 0.8,
    zfar: float = 100.0,
) -> jax.Array:
    """Zero out pixels whose neighborhood is mostly discontinuous.

    Semantics of the Warp kernel at Utils.py:359-384: a neighbor is "bad"
    if invalid (<0.001 or >=zfar) or farther than depth_diff_thres from
    the center; the pixel is zeroed when bad/total > ratio_thres, with
    `total` counting only in-image neighbors.
    """
    depth = depth.astype(jnp.float32)
    wins, inb = _window_stack(depth, radius, 0.0)
    bad = (wins < 0.001) | (wins >= zfar) | (jnp.abs(wins - depth[None]) > depth_diff_thres)
    bad_cnt = jnp.sum(jnp.where(inb, bad, False).astype(jnp.float32), axis=0)
    total = jnp.sum(inb.astype(jnp.float32), axis=0)
    return jnp.where(bad_cnt / total > ratio_thres, 0.0, depth)


def bilateral_filter_depth(
    depth: jax.Array,
    radius: int = 2,
    zfar: float = 100.0,
    sigma_d: float = 2.0,
    sigma_r: float = 100000.0,
) -> jax.Array:
    """Depth-aware bilateral smoothing with a local-mean outlier gate.

    Semantics of the Warp kernel at Utils.py:304-343: neighbors are valid
    when 0.001 <= d < zfar; the filter averages neighbors within 0.01 m of
    the local valid mean, weighted by a spatial Gaussian (sigma_d) and a
    range Gaussian around the *center* depth (sigma_r). Holes (invalid
    centers) are filled when valid neighbors exist.
    """
    depth = depth.astype(jnp.float32)
    r = radius
    k = 2 * r + 1
    wins, inb = _window_stack(depth, r, 0.0)
    valid = inb & (wins >= 0.001) & (wins < zfar)
    num_valid = jnp.sum(valid.astype(jnp.float32), axis=0)
    mean_depth = jnp.sum(jnp.where(valid, wins, 0.0), axis=0) / jnp.maximum(num_valid, 1.0)

    # Spatial weights are constant per shift.
    offs = jnp.arange(k, dtype=jnp.float32) - r
    du, dv = jnp.meshgrid(offs, offs, indexing="xy")
    w_spatial = jnp.exp(-(du**2 + dv**2) / (2.0 * sigma_d**2)).reshape(-1, 1, 1)

    near_mean = jnp.abs(wins - mean_depth[None]) < 0.01
    use = valid & near_mean
    w_range = jnp.exp(-((depth[None] - wins) ** 2) / (2.0 * sigma_r**2))
    w = jnp.where(use, w_spatial * w_range, 0.0)
    sum_w = jnp.sum(w, axis=0)
    out = jnp.sum(w * wins, axis=0) / jnp.maximum(sum_w, 1e-12)
    return jnp.where((sum_w > 0) & (num_valid > 0), out, 0.0)
