"""Perspective/affine image warps via XLA gathers.

Replaces the reference's kornia.geometry.transform.warp_perspective usage
(predict_pose_refine.py:63-76, predict_score.py:89-99). Convention:
integer pixel index (i, j) has continuous coordinates (u, v) = (j, i) —
identical to kornia's align_corners=False net semantics, and to the rest
of this framework.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401


def _sample_bilinear(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear sample (H, W, C) at continuous (u, v); zeros outside."""
    H, W = img.shape[0], img.shape[1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        val = img[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
        return jnp.where(inb[..., None], val, 0.0)

    top = tap(v0i, u0i) * (1 - fu) + tap(v0i, u0i + 1) * fu
    bot = tap(v0i + 1, u0i) * (1 - fu) + tap(v0i + 1, u0i + 1) * fu
    return top * (1 - fv) + bot * fv


def _sample_nearest(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    H, W = img.shape[0], img.shape[1]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    val = img[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
    return jnp.where(inb[..., None], val, 0.0)


@partial(jax.jit, static_argnames=("out_hw", "mode"))
def warp_perspective(
    img: jax.Array, M: jax.Array, out_hw: tuple[int, int], mode: str = "bilinear"
) -> jax.Array:
    """dst(p) = src(M^-1 p) for a batch of transforms.

    img: (H, W, C) single source image shared by the batch.
    M:   (B, 3, 3) src->dst homographies (crop transforms).
    Returns (B, out_h, out_w, C).
    """
    out_h, out_w = out_hw
    img = img.astype(jnp.float32)
    Minv = jnp.linalg.inv(M.astype(jnp.float32))
    jj = jnp.arange(out_w, dtype=jnp.float32)
    ii = jnp.arange(out_h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(jj, ii, indexing="xy")  # (out_h, out_w)

    def one(Mi):
        u = Mi[0, 0] * uu + Mi[0, 1] * vv + Mi[0, 2]
        v = Mi[1, 0] * uu + Mi[1, 1] * vv + Mi[1, 2]
        w = Mi[2, 0] * uu + Mi[2, 1] * vv + Mi[2, 2]
        u = u / w
        v = v / w
        if mode == "bilinear":
            return _sample_bilinear(img, u, v)
        return _sample_nearest(img, u, v)

    return jax.vmap(one)(Minv)


def _axis_interp_matrix(src_coords: jax.Array, size: int, mode: str) -> jax.Array:
    """Per-output-position interpolation weights over a source axis.

    src_coords: (N, out) continuous source coordinates. Returns
    (N, out, size) row-stochastic weights (zero rows when out of bounds).
    """
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, size), 2)
    if mode == "bilinear":
        w = jnp.maximum(0.0, 1.0 - jnp.abs(src_coords[..., None] - idx))
        inb = (src_coords >= -1.0) & (src_coords <= size)
    else:  # nearest
        w = (jnp.round(src_coords)[..., None] == idx).astype(jnp.float32)
        inb = (src_coords >= -0.5) & (src_coords <= size - 0.5)
    return w * inb[..., None].astype(jnp.float32)


@partial(jax.jit, static_argnames=("out_hw", "mode"))
def warp_crop(
    img: jax.Array, M: jax.Array, out_hw: tuple[int, int], mode: str = "bilinear"
) -> jax.Array:
    """Axis-aligned affine warp (crop transforms) as two MXU matmuls.

    The estimator's crop homographies are pure scale+translate
    (compute_crop_window_tf), so dst(i,j) = src(vy(i), ux(j)) is
    SEPARABLE: out = R @ img @ C with banded interpolation matrices R
    (N, oh, H) and C (N, W, ow). On TPU this replaces tens of millions
    of per-pixel gathers (the generic warp_perspective path) with dense
    matmuls — an order of magnitude faster for the 252-crop batches.

    img: (H, W, C) shared source; M: (N, 3, 3) src->dst affine with zero
    off-diagonal terms. Exact for both modes (one-hot rows for nearest).
    """
    out_h, out_w = out_hw
    H, W, Cch = img.shape
    img = img.astype(jnp.float32)
    Minv = jnp.linalg.inv(M.astype(jnp.float32))
    jj = jnp.arange(out_w, dtype=jnp.float32)
    ii = jnp.arange(out_h, dtype=jnp.float32)
    # src coords per output row/col (axis-aligned: no cross terms)
    v_src = Minv[:, 1, 1, None] * ii[None] + Minv[:, 1, 2, None]  # (N, oh)
    u_src = Minv[:, 0, 0, None] * jj[None] + Minv[:, 0, 2, None]  # (N, ow)
    R = _axis_interp_matrix(v_src, H, mode)  # (N, oh, H)
    Cm = _axis_interp_matrix(u_src, W, mode)  # (N, ow, W)
    # HIGH (bf16_3x) halves the MXU passes of the session default
    # (HIGHEST): ~1.5e-5 relative error on interpolated image/XYZ values
    # — far below sensor noise, and the big (N, oh, H) x (H, W*C)
    # contraction is ~60% of each crop stage's non-render cost.
    t1 = jnp.einsum(
        "nih,hwc->niwc", R, img,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
    )
    out = jnp.einsum(
        "niwc,njw->nijc", t1, Cm,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
    )
    return out


@partial(jax.jit, static_argnames=("out_hw", "mode"))
def warp_perspective_batch(
    imgs: jax.Array, M: jax.Array, out_hw: tuple[int, int], mode: str = "bilinear"
) -> jax.Array:
    """Per-image variant: imgs (B, H, W, C), M (B, 3, 3) -> (B, oh, ow, C)."""
    out_h, out_w = out_hw
    Minv = jnp.linalg.inv(M.astype(jnp.float32))
    jj = jnp.arange(out_w, dtype=jnp.float32)
    ii = jnp.arange(out_h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(jj, ii, indexing="xy")

    def one(img, Mi):
        u = Mi[0, 0] * uu + Mi[0, 1] * vv + Mi[0, 2]
        v = Mi[1, 0] * uu + Mi[1, 1] * vv + Mi[1, 2]
        w = Mi[2, 0] * uu + Mi[2, 1] * vv + Mi[2, 2]
        u = u / w
        v = v / w
        if mode == "bilinear":
            return _sample_bilinear(img.astype(jnp.float32), u, v)
        return _sample_nearest(img.astype(jnp.float32), u, v)

    return jax.vmap(one)(imgs, Minv)
