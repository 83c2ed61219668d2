"""Batched triangle rasterizer for TPU (pure XLA, static shapes).

This is the framework's replacement for nvdiffrast (reference:
Utils.py:133-219). Design differences from the CUDA original — chosen for
TPU, not translated:

* Rasterization happens directly in OpenCV pixel space. The reference
  detours through OpenGL clip space (glcam_in_cvcam flip, y_down
  projection matrix, per-pose ROI clip-space transform at
  Utils.py:159-181, final image Y-flip at Utils.py:216-218); here the
  pinhole projection + per-pose crop affine produce screen coordinates
  in one step and no flips exist anywhere.
* Per-pose ROI rendering (the reference's `bbox2d` trick) is the crop
  affine applied to projected vertices — each hypothesis renders straight
  into its 160x160 network crop.
* The inner loop is an edge-function coverage test + z-argmin over face
  chunks, expressed as fused vector ops: XLA keeps the (pixels x chunk)
  tile in registers/VMEM and never materializes it in HBM. Poses are
  processed in blocks via lax.map to bound the working set.
* Everything is padded/static: hypothesis count, face count, output size.

Perspective-correct interpolation uses 2D screen barycentrics re-weighted
by 1/z, equivalent to clip-space w interpolation for pinhole cameras.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401


class RenderOutput(NamedTuple):
    color: jax.Array  # (N, H, W, 3) float32 in [0, 1]
    xyz: jax.Array  # (N, H, W, 3) camera-space position map, 0 at background
    normal: jax.Array | None  # (N, H, W, 3) or None
    mask: jax.Array  # (N, H, W) bool foreground

    @property
    def depth(self) -> jax.Array:
        return self.xyz[..., 2]


def _screen_vertices(pos, poses, K, crop_tf):
    """Object-space vertices -> camera space + screen (crop) coords.

    pos: (V, 3), poses: (N, 4, 4), K: (3, 3), crop_tf: (N, 3, 3) or None.
    Returns pts_cam (N, V, 3), screen xy (N, V, 2).
    """
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    pts_cam = jnp.einsum("nij,vj->nvi", R, pos) + t[:, None]
    z = jnp.maximum(pts_cam[..., 2], 1e-8)
    u = pts_cam[..., 0] * K[0, 0] / z + K[0, 2]
    v = pts_cam[..., 1] * K[1, 1] / z + K[1, 2]
    if crop_tf is not None:
        uc = crop_tf[:, None, 0, 0] * u + crop_tf[:, None, 0, 2]
        vc = crop_tf[:, None, 1, 1] * v + crop_tf[:, None, 1, 2]
        u, v = uc, vc
    return pts_cam, jnp.stack([u, v], axis=-1)


def _rasterize_one(xy_f, z_f, valid_f, pix_u, pix_v, face_chunk):
    """Nearest covering face per pixel for ONE pose.

    xy_f: (F, 3, 2) screen coords of face vertices
    z_f: (F, 3) camera-space z
    valid_f: (F,) usable faces (in front of camera, non-degenerate)
    pix_u, pix_v: (P,) pixel center coordinates
    Returns (best_face (P,), best_zinv_sum (P,), covered (P,)).
    """
    F = xy_f.shape[0]
    P = pix_u.shape[0]
    n_chunks = F // face_chunk

    x0, y0 = xy_f[:, 0, 0], xy_f[:, 0, 1]
    x1, y1 = xy_f[:, 1, 0], xy_f[:, 1, 1]
    x2, y2 = xy_f[:, 2, 0], xy_f[:, 2, 1]
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    inv_area = jnp.where(jnp.abs(area2) < 1e-12, 0.0, 1.0 / area2)
    ok = valid_f & (jnp.abs(area2) > 1e-12)

    # Edge-function coefficients: w_k(p) = (a_k * px + b_k * py + c_k) / area2
    # w0 from edge (v1, v2), w1 from (v2, v0), w2 from (v0, v1).
    def edge_coeff(xa, ya, xb, yb):
        a = ya - yb
        b = xb - xa
        c = xa * yb - xb * ya
        return a, b, c

    a0, b0, c0 = edge_coeff(x1, y1, x2, y2)
    a1, b1, c1 = edge_coeff(x2, y2, x0, y0)
    a2, b2, c2 = edge_coeff(x0, y0, x1, y1)

    zinv = jnp.where(z_f > 1e-8, 1.0 / z_f, 0.0)  # (F, 3)

    coeffs = jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, inv_area,
         zinv[:, 0], zinv[:, 1], zinv[:, 2],
         ok.astype(jnp.float32)],
        axis=-1,
    )  # (F, 14)
    coeffs = coeffs.reshape(n_chunks, face_chunk, 14)

    big = jnp.float32(1e30)

    def body(carry, ch):
        best_z, best_face, base = carry
        a0c, b0c, c0c = ch[:, 0], ch[:, 1], ch[:, 2]
        a1c, b1c, c1c = ch[:, 3], ch[:, 4], ch[:, 5]
        a2c, b2c, c2c = ch[:, 6], ch[:, 7], ch[:, 8]
        inv_a = ch[:, 9]
        zi0, zi1, zi2 = ch[:, 10], ch[:, 11], ch[:, 12]
        okc = ch[:, 13] > 0

        # (P, C) barycentrics; signs normalized by inv_area.
        w0 = (pix_u[:, None] * a0c + pix_v[:, None] * b0c + c0c) * inv_a
        w1 = (pix_u[:, None] * a1c + pix_v[:, None] * b1c + c1c) * inv_a
        w2 = (pix_u[:, None] * a2c + pix_v[:, None] * b2c + c2c) * inv_a
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & okc[None, :]
        # Perspective-correct depth: z = 1 / sum(w_k / z_k).
        zinv_sum = w0 * zi0 + w1 * zi1 + w2 * zi2
        z = jnp.where(inside & (zinv_sum > 1e-12), 1.0 / zinv_sum, big)
        z_min = jnp.min(z, axis=1)
        idx = jnp.argmin(z, axis=1).astype(jnp.int32) + base
        better = z_min < best_z
        best_z = jnp.where(better, z_min, best_z)
        best_face = jnp.where(better, idx, best_face)
        return (best_z, best_face, base + face_chunk), None

    init = (
        jnp.full((P,), big, dtype=jnp.float32),
        jnp.zeros((P,), dtype=jnp.int32),
        jnp.int32(0),
    )
    (best_z, best_face, _), _ = jax.lax.scan(body, init, coeffs)
    covered = best_z < big
    return best_face, best_z, covered


def _sample_texture(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear texture sample; uv in [0, 1], texel centers at (i+0.5)/N.

    Matches nvdiffrast's 'linear' filter convention (Utils.py:187).
    """
    Ht, Wt = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * Wt - 0.5
    y = uv[..., 1] * Ht - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        return tex[jnp.clip(yi, 0, Ht - 1), jnp.clip(xi, 0, Wt - 1)]

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw",
        "use_light",
        "get_normal",
        "face_chunk",
        "pose_block",
        "w_ambient",
        "w_diffuse",
    ),
)
def render_mesh(
    pos: jax.Array,
    faces: jax.Array,
    poses: jax.Array,
    K: jax.Array,
    *,
    out_hw: tuple[int, int],
    crop_tf: jax.Array | None = None,
    vertex_color: jax.Array | None = None,
    uv: jax.Array | None = None,
    tex: jax.Array | None = None,
    vnormals: jax.Array | None = None,
    use_light: bool = True,
    get_normal: bool = False,
    light_dir: jax.Array | None = None,
    w_ambient: float = 0.8,
    w_diffuse: float = 0.5,
    face_chunk: int = 512,
    pose_block: int = 16,
) -> RenderOutput:
    """Render N pose hypotheses of one mesh in a single fused graph.

    pos (V, 3), faces (F, 3) int32, poses (N, 4, 4) object-in-cam (OpenCV),
    K (3, 3). crop_tf (N, 3, 3) maps full-image pixels to the out_hw crop
    (None renders the full image). Color source: texture (uv + tex) or
    per-vertex colors. Lighting replicates Utils.py:191-212: Gouraud
    diffuse with head-on directional light, color*(w_ambient +
    diffuse*w_diffuse).
    """
    H, W = out_hw
    N = poses.shape[0]
    F = faces.shape[0]
    pos = pos.astype(jnp.float32)
    poses = poses.astype(jnp.float32)
    K = K.astype(jnp.float32)

    # Pad faces to a multiple of face_chunk with degenerate entries.
    pad_f = (-F) % face_chunk
    if pad_f:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad_f, 3), dtype=faces.dtype)], axis=0
        )
    Fp = faces.shape[0]

    # Pad poses to a multiple of pose_block.
    pad_n = (-N) % pose_block
    if pad_n:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=poses.dtype), (pad_n, 4, 4))
        poses = jnp.concatenate([poses, eye], axis=0)
        if crop_tf is not None:
            eye3 = jnp.broadcast_to(jnp.eye(3, dtype=poses.dtype), (pad_n, 3, 3))
            crop_tf = jnp.concatenate([crop_tf.astype(jnp.float32), eye3], axis=0)
    Np = poses.shape[0]

    pts_cam_all, xy_all = _screen_vertices(pos, poses, K, crop_tf)

    jj = jnp.arange(W, dtype=jnp.float32)
    ii = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(jj, ii, indexing="xy")
    pix_u = uu.reshape(-1)
    pix_v = vv.reshape(-1)

    if pad_f:
        face_valid_static = jnp.concatenate(
            [jnp.ones((F,), bool), jnp.zeros((pad_f,), bool)]
        )
    else:
        face_valid_static = jnp.ones((F,), bool)

    if use_light:
        get_normal = True
    if get_normal and vnormals is None:
        raise ValueError("vnormals required when lighting/normals requested")
    if light_dir is None:
        light_dir = jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32)
    else:
        light_dir = jnp.asarray(light_dir, dtype=jnp.float32)

    if vnormals is not None:
        vnormals = vnormals.astype(jnp.float32)
    if vertex_color is not None:
        vertex_color = vertex_color.astype(jnp.float32)
    if uv is not None:
        uv = uv.astype(jnp.float32)
        tex = tex.astype(jnp.float32)

    R_all = poses[:, :3, :3]

    def render_block(args):
        pts_cam, xy, Rb = args  # (B, V, 3), (B, V, 2), (B, 3, 3)

        def one_pose(pts_cam_1, xy_1, R_1):
            z_v = pts_cam_1[:, 2]  # (V,)
            xy_f = xy_1[faces]  # (F, 3, 2)
            z_f = z_v[faces]  # (F, 3)
            valid_f = face_valid_static & jnp.all(z_f > 1e-4, axis=-1)
            best_face, _, covered = _rasterize_one(
                xy_f, z_f, valid_f, pix_u, pix_v, face_chunk
            )

            # Recompute barycentrics of the winning face per pixel.
            tri = faces[best_face]  # (P, 3)
            pa = xy_1[tri[:, 0]]
            pb = xy_1[tri[:, 1]]
            pc = xy_1[tri[:, 2]]
            area2 = (pb[:, 0] - pa[:, 0]) * (pc[:, 1] - pa[:, 1]) - (
                pc[:, 0] - pa[:, 0]
            ) * (pb[:, 1] - pa[:, 1])
            inv_a = jnp.where(jnp.abs(area2) < 1e-12, 0.0, 1.0 / area2)
            w0 = (
                (pb[:, 0] - pix_u) * (pc[:, 1] - pix_v)
                - (pc[:, 0] - pix_u) * (pb[:, 1] - pix_v)
            ) * inv_a
            w1 = (
                (pc[:, 0] - pix_u) * (pa[:, 1] - pix_v)
                - (pa[:, 0] - pix_u) * (pc[:, 1] - pix_v)
            ) * inv_a
            w2 = 1.0 - w0 - w1

            z_tri = z_v[tri]  # (P, 3)
            zinv = jnp.where(z_tri > 1e-8, 1.0 / z_tri, 0.0)
            zinv_sum = w0 * zinv[:, 0] + w1 * zinv[:, 1] + w2 * zinv[:, 2]
            zinv_sum = jnp.maximum(zinv_sum, 1e-12)
            # Perspective-correct barycentrics.
            c0 = w0 * zinv[:, 0] / zinv_sum
            c1 = w1 * zinv[:, 1] / zinv_sum
            c2 = 1.0 - c0 - c1

            def interp(vattr):  # (V, D) -> (P, D)
                a = vattr[tri[:, 0]]
                b = vattr[tri[:, 1]]
                c = vattr[tri[:, 2]]
                return a * c0[:, None] + b * c1[:, None] + c * c2[:, None]

            m = covered
            xyz = jnp.where(m[:, None], interp(pts_cam_1), 0.0)

            if uv is not None:
                uv_pix = interp(uv)
                color = _sample_texture(tex, uv_pix)
            elif vertex_color is not None:
                color = interp(vertex_color)
            else:
                color = jnp.full((pix_u.shape[0], 3), 0.5, dtype=jnp.float32)

            normal_out = None
            if get_normal:
                vn_cam = (R_1 @ vnormals.T).T  # (V, 3)
                if use_light:
                    # Gouraud: per-vertex diffuse, interpolated
                    # (Utils.py:203-207).
                    vn_n = vn_cam / jnp.maximum(
                        jnp.linalg.norm(vn_cam, axis=-1, keepdims=True), 1e-12
                    )
                    diff_v = jnp.clip(
                        jnp.sum(vn_n * (-light_dir)[None], axis=-1), 0.0, 1.0
                    )[:, None]
                    diff = interp(diff_v)[:, 0]
                    color = color * w_ambient + diff[:, None] * color * w_diffuse
                n_pix = interp(vn_cam)
                n_pix = n_pix / jnp.maximum(
                    jnp.linalg.norm(n_pix, axis=-1, keepdims=True), 1e-12
                )
                normal_out = jnp.where(m[:, None], n_pix, 0.0)

            color = jnp.clip(color, 0.0, 1.0)
            color = jnp.where(m[:, None], color, 0.0)

            out = (
                color.reshape(H, W, 3),
                xyz.reshape(H, W, 3),
                (normal_out.reshape(H, W, 3) if normal_out is not None
                 else jnp.zeros((H, W, 3), jnp.float32)),
                m.reshape(H, W),
            )
            return out

        return jax.vmap(one_pose)(pts_cam, xy, Rb)

    n_blocks = Np // pose_block
    blocks = (
        pts_cam_all.reshape(n_blocks, pose_block, -1, 3),
        xy_all.reshape(n_blocks, pose_block, -1, 2),
        R_all.reshape(n_blocks, pose_block, 3, 3),
    )
    color, xyz, normal, mask = jax.lax.map(render_block, blocks)
    color = color.reshape(Np, H, W, 3)[:N]
    xyz = xyz.reshape(Np, H, W, 3)[:N]
    normal = normal.reshape(Np, H, W, 3)[:N] if get_normal else None
    mask = mask.reshape(Np, H, W)[:N]
    return RenderOutput(color=color, xyz=xyz, normal=normal, mask=mask)
