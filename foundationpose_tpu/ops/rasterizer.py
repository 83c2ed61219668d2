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
* Two rasterization strategies, both fully fused by XLA (the
  (pixels x faces) tile never hits HBM):
    - 'brute': every pixel tests every face, scanned over face chunks.
      Exact; right for small meshes.
    - 'binned': faces are binned to image tiles by screen bbox
      (top_k selection, static K cap per tile), then each tile tests
      only its K candidates — an order-of-magnitude fewer edge tests
      for the 5k-face meshes of the benchmark workload.
* Everything is padded/static: hypothesis count, face count, output size.

Perspective-correct interpolation uses 2D screen barycentrics re-weighted
by 1/z, equivalent to clip-space w interpolation for pinhole cameras.

Performance envelope (measured, TPU v5e, 252 poses x 160^2 x 5k faces):
brute 578 ms; binned 145 ms (bound ~60/40 by the XLA top_k+gather
binning and the (tiles x pixels x K) VPU fine eval); 'pallas' (the
fused per-pose kernel, ops/pallas_raster2.py) 80 ms with a gather-free
record prep. Measured dead ends (kept here so they are not retried):
removing the min-z second reduction, bf16 one-hot matmuls,
structure-of-arrays record layouts, a second XLA 8x8-subtile binning
level (~174 ms: per-subtile top_k outweighs the eval reduction), and —
in the Pallas kernel — per-subtile rank compaction (the f32 one-hot
routing matmul costs as much as the (64, K) VPU eval it would save)
and DEFAULT-precision routing (f32 MXU matmuls run at one rate
regardless of precision flag).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401

_BIG = jnp.float32(1e30)
_SUBTILE = 8


class RenderOutput(NamedTuple):
    color: jax.Array  # (N, H, W, 3) float32 in [0, 1]
    xyz: jax.Array  # (N, H, W, 3) camera-space position map, 0 at background
    normal: jax.Array | None  # (N, H, W, 3) or None
    mask: jax.Array  # (N, H, W) bool foreground
    # methods 'pallas' and 'binned': faces dropped per (pose, tile) by
    # the per-tile capacity (rounds*K for pallas, max_faces_per_tile for
    # binned); None for 'brute' (exact). Check with
    # `assert not out.overflow.any()` when forcing a binned method on
    # a dense mesh.
    overflow: jax.Array | None = None

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


def _face_coeffs(xy_f, z_f, valid_f):
    """Per-face sign-normalized barycentric + 1/z affine coefficients.

    Returns (F, 10): [wa0,wb0,wc0, wa1,wb1,wc1, wa2,wb2,wc2, ok] where
    w_k(p) = wa_k*px + wb_k*py + wc_k is already divided by the signed
    doubled area (so inside <=> all w_k >= 0), plus per-face zinv (F, 3).
    """
    x0, y0 = xy_f[:, 0, 0], xy_f[:, 0, 1]
    x1, y1 = xy_f[:, 1, 0], xy_f[:, 1, 1]
    x2, y2 = xy_f[:, 2, 0], xy_f[:, 2, 1]
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    inv_area = jnp.where(jnp.abs(area2) < 1e-12, 0.0, 1.0 / area2)
    ok = valid_f & (jnp.abs(area2) > 1e-12)

    def edge(xa, ya, xb, yb):
        return (ya - yb) * inv_area, (xb - xa) * inv_area, (xa * yb - xb * ya) * inv_area

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    zinv = jnp.where(z_f > 1e-8, 1.0 / z_f, 0.0)
    coeffs = jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, ok.astype(jnp.float32)], axis=-1
    )
    return coeffs, zinv


def _eval_faces(coeffs, zinv, px, py):
    """Edge-test faces at pixels; px/py (...,) broadcast against coeffs
    (..., 10) and zinv (..., 3). Returns perspective z (BIG outside)."""
    w0 = px * coeffs[..., 0] + py * coeffs[..., 1] + coeffs[..., 2]
    w1 = px * coeffs[..., 3] + py * coeffs[..., 4] + coeffs[..., 5]
    w2 = px * coeffs[..., 6] + py * coeffs[..., 7] + coeffs[..., 8]
    # Subpixel epsilon keeps pixels exactly on shared edges covered by
    # both triangles (float rounding can otherwise make BOTH edge tests
    # marginally negative -> visible holes along face diagonals).
    eps = -1e-5
    inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps) & (coeffs[..., 9] > 0)
    zinv_sum = w0 * zinv[..., 0] + w1 * zinv[..., 1] + w2 * zinv[..., 2]
    return jnp.where(inside & (zinv_sum > 1e-12), 1.0 / zinv_sum, _BIG)


def _rasterize_brute(xy_f, z_f, valid_f, pix_u, pix_v, face_chunk):
    """Nearest covering face per pixel, scanning face chunks. ONE pose.

    Returns (best_face (P,), covered (P,))."""
    F = xy_f.shape[0]
    P = pix_u.shape[0]
    coeffs, zinv = _face_coeffs(xy_f, z_f, valid_f)
    data = jnp.concatenate([coeffs, zinv], axis=-1)  # (F, 13)
    data = data.reshape(F // face_chunk, face_chunk, 13)

    def body(carry, ch):
        best_z, best_face, base = carry
        z = _eval_faces(
            ch[None, :, :10], ch[None, :, 10:13], pix_u[:, None], pix_v[:, None]
        )  # (P, C)
        z_min = jnp.min(z, axis=1)
        idx = jnp.argmin(z, axis=1).astype(jnp.int32) + base
        better = z_min < best_z
        return (
            jnp.where(better, z_min, best_z),
            jnp.where(better, idx, best_face),
            base + face_chunk,
        ), None

    init = (
        jnp.full((P,), _BIG, dtype=jnp.float32),
        jnp.zeros((P,), dtype=jnp.int32),
        jnp.int32(0),
    )
    (best_z, best_face, _), _ = jax.lax.scan(body, init, data)
    return best_face, best_z < _BIG


def _bin_face_records(xy_f, z_f, valid_f, tri_attr, H, W, tile, K):
    """Bin faces to tiles and gather packed per-slot records for ONE pose.

    Returns (rec_t, overflow): rec_t (T, K, 13 + 3*Da) =
    [edge coeffs(10) | zinv(3) | vertex attrs(3*Da)] per tile slot
    (empty slots have ok=0); overflow (T,) int32 = faces dropped per
    tile. Overflowing tiles drop the highest-index faces (raise K for
    very dense meshes); callers must surface `overflow` so forced-binned
    renders of dense meshes report instead of silently losing geometry.
    """
    F = xy_f.shape[0]
    Da = tri_attr.shape[-1]
    nty, ntx = H // tile, W // tile
    T = nty * ntx

    coeffs, zinv = _face_coeffs(xy_f, z_f, valid_f)

    # --- face bbox -> tile overlap mask (T, F)
    bx0 = jnp.min(xy_f[:, :, 0], axis=1)
    bx1 = jnp.max(xy_f[:, :, 0], axis=1)
    by0 = jnp.min(xy_f[:, :, 1], axis=1)
    by1 = jnp.max(xy_f[:, :, 1], axis=1)
    tx = jnp.arange(ntx, dtype=jnp.float32) * tile
    ty = jnp.arange(nty, dtype=jnp.float32) * tile
    ok = coeffs[:, 9] > 0
    ov_x = (bx0[:, None] <= tx[None] + (tile - 1)) & (bx1[:, None] >= tx[None])
    ov_y = (by0[:, None] <= ty[None] + (tile - 1)) & (by1[:, None] >= ty[None])
    mask = ov_y[:, :, None] & ov_x[:, None, :] & ok[:, None, None]  # (F, nty, ntx)
    mask = mask.reshape(F, T).T  # (T, F)

    face_ids = jax.lax.broadcasted_iota(jnp.int32, (T, F), 1)
    keys = jnp.where(mask, F - face_ids, 0)
    top_keys, _ = jax.lax.top_k(keys, K)  # (T, K)
    slot_face = F - top_keys  # (T, K); == F where empty
    slot_valid = top_keys > 0
    overflow = jnp.maximum(
        jnp.sum(mask, axis=1).astype(jnp.int32) - K, 0
    )  # (T,)

    # one packed record per face: [coeffs(10) | zinv(3) | attrs(3*Da)]
    rec = jnp.concatenate(
        [coeffs, zinv, tri_attr.reshape(F, 3 * Da)], axis=-1
    )  # (F, 13 + 3Da)
    rec = jnp.concatenate([rec, jnp.zeros((1, rec.shape[1]), rec.dtype)], axis=0)
    rec_t = rec[slot_face]  # (T, K, D)
    rec_t = rec_t.at[..., 9].set(jnp.where(slot_valid, rec_t[..., 9], 0.0))
    return rec_t, overflow


def _rasterize_binned_interp(
    xy_f, z_f, valid_f, tri_attr, H, W, tile, max_faces_per_tile
):
    """Tile-binned rasterization + attribute interpolation for ONE pose.

    tri_attr: (F, 3, Da) per-face-vertex attributes. Returns flat
    image-ordered (interp (H*W, Da), covered (H*W,), overflow (T,)).

    Stage 1 bins faces to (H/tile x W/tile) tiles by screen bbox via a
    top_k selection (_bin_face_records). Stage 2 edge-tests each tile's
    pixels against only its K candidates (fused VPU eval + z-min) and
    fetches the winner's packed record via a one-hot batched matmul on
    the MXU — no per-pixel gathers anywhere. Perspective-correct
    barycentrics come from the winner's own edge coefficients.
    (method='pallas' replaces both stages with the fused per-pose
    kernel in ops/pallas_raster2.py.)
    """
    Da = tri_attr.shape[-1]
    K = max_faces_per_tile
    nty, ntx = H // tile, W // tile
    T = nty * ntx

    rec_t, overflow = _bin_face_records(
        xy_f, z_f, valid_f, tri_attr, H, W, tile, K
    )

    # --- fine: per-tile pixel coordinates (T, tile*tile)
    ty_idx = jax.lax.broadcasted_iota(jnp.int32, (nty, ntx), 0)
    tx_idx = jax.lax.broadcasted_iota(jnp.int32, (nty, ntx), 1)
    oy = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    px = (
        tx_idx.reshape(T, 1) * tile + ox.reshape(1, tile * tile)
    ).astype(jnp.float32)
    py = (
        ty_idx.reshape(T, 1) * tile + oy.reshape(1, tile * tile)
    ).astype(jnp.float32)

    z = _eval_faces(
        rec_t[:, None, :, :10], rec_t[:, None, :, 10:13],
        px[:, :, None], py[:, :, None],
    )  # (T, P, K)
    best_slot = jnp.argmin(z, axis=-1)  # (T, P)
    best_z = jnp.min(z, axis=-1)
    covered = best_z < _BIG

    # Winner record per pixel via one-hot MXU matmul (T,P,K)@(T,K,D).
    oh = jax.nn.one_hot(best_slot, K, dtype=rec_t.dtype)
    win = jnp.einsum(
        "tpk,tkd->tpd", oh, rec_t, preferred_element_type=jnp.float32
    )  # (T, P, D)

    # Perspective-correct barycentrics from the winner's coefficients.
    w0 = px * win[..., 0] + py * win[..., 1] + win[..., 2]
    w1 = px * win[..., 3] + py * win[..., 4] + win[..., 5]
    w2 = px * win[..., 6] + py * win[..., 7] + win[..., 8]
    zsum = jnp.maximum(
        w0 * win[..., 10] + w1 * win[..., 11] + w2 * win[..., 12], 1e-12
    )
    c0 = (w0 * win[..., 10] / zsum)[..., None]
    c1 = (w1 * win[..., 11] / zsum)[..., None]
    c2 = 1.0 - c0 - c1
    a0 = win[..., 13 : 13 + Da]
    a1 = win[..., 13 + Da : 13 + 2 * Da]
    a2 = win[..., 13 + 2 * Da :]
    interp = a0 * c0 + a1 * c1 + a2 * c2  # (T, P, Da)

    # --- assemble tiles back to image order
    def untile(x):
        lead = x.shape[2:]
        return (
            x.reshape(nty, ntx, tile, tile, *lead)
            .transpose(0, 2, 1, 3, *(4 + i for i in range(len(lead))))
            .reshape(H * W, *lead)
        )

    return untile(interp), untile(covered), overflow


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


def _pack_texture_quads(tex: jax.Array) -> jax.Array:
    """(Ht, Wt, C) -> (Ht*Wt, 4C): row y*Wt+x holds the 2x2 texel quad
    at (y, x) with edge-clamped right/bottom neighbors.

    TPU gather cost is per fetched row, nearly independent of row width
    (same observation that drives the hash grid's oct layout,
    ops/hashgrid.py), so packing the four bilinear taps into one row
    turns per-pixel texture sampling from 4 gathers into 1."""
    t00 = tex
    t01 = jnp.concatenate([tex[:, 1:], tex[:, -1:]], axis=1)
    t10 = jnp.concatenate([tex[1:], tex[-1:]], axis=0)
    t11 = jnp.concatenate([t01[1:], t01[-1:]], axis=0)
    quad = jnp.concatenate([t00, t01, t10, t11], axis=-1)
    return quad.reshape(tex.shape[0] * tex.shape[1], -1)


def _sample_texture_quad(
    tex_quad: jax.Array, ht_wt: tuple[int, int], uv: jax.Array
) -> jax.Array:
    """Bilinear sample from a quad-packed table — ONE gather per pixel.

    Exactly _sample_texture's clamp convention: clamping the continuous
    coordinate into [0, N-1] reproduces the per-tap clip (outside the
    border both taps collapse to the edge texel; at x0 = N-1 the quad's
    clamped neighbor makes the fx weighting a no-op)."""
    Ht, Wt = ht_wt
    C = tex_quad.shape[-1] // 4
    x = jnp.clip(uv[..., 0] * Wt - 0.5, 0.0, Wt - 1.0)
    y = jnp.clip(uv[..., 1] * Ht - 0.5, 0.0, Ht - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = y0.astype(jnp.int32) * Wt + x0.astype(jnp.int32)
    q = tex_quad[flat.reshape(-1)].reshape(*x.shape, 4 * C)
    top = q[..., 0:C] * (1 - fx) + q[..., C : 2 * C] * fx
    bot = q[..., 2 * C : 3 * C] * (1 - fx) + q[..., 3 * C :] * fx
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
        "method",
        "tile",
        "max_faces_per_tile",
        "cull_backfaces",
        "raster_rounds",
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
    method: str = "auto",
    tile: int = 32,
    max_faces_per_tile: int = 512,
    cull_backfaces: bool = False,
    raster_rounds: int = 4,
) -> RenderOutput:
    """Render N pose hypotheses of one mesh in a single fused graph.

    pos (V, 3), faces (F, 3) int32, poses (N, 4, 4) object-in-cam (OpenCV),
    K (3, 3). crop_tf (N, 3, 3) maps full-image pixels to the out_hw crop
    (None renders the full image). Color source: texture (uv + tex) or
    per-vertex colors. Lighting replicates Utils.py:191-212: Gouraud
    diffuse with head-on directional light, color*(w_ambient +
    diffuse*w_diffuse).

    method 'binned' needs out_hw divisible by `tile`; 'auto' picks
    'binned' for meshes above ~1.5k faces when the size works out.
    cull_backfaces=True drops camera-averted faces before binning —
    exact for closed meshes with consistent outward winding.
    """
    H, W = out_hw
    N = poses.shape[0]
    F = faces.shape[0]
    pos = pos.astype(jnp.float32)
    poses = poses.astype(jnp.float32)
    K = K.astype(jnp.float32)

    if method == "auto":
        # Above ~1.5k faces the tiled paths win. On TPU that is the
        # fused Pallas kernel: faster than 'binned' AND robust to dense
        # tiles (capacity rounds + overflow reporting, where 'binned'
        # silently drops faces past max_faces_per_tile). Off-TPU the
        # Pallas path would run interpreted, so auto keeps the XLA
        # binned path there, with its documented density guard.
        if 1536 < F and H % tile == 0 and W % tile == 0:
            if jax.default_backend() == "tpu":
                method = "pallas"
            elif F <= 24 * max_faces_per_tile:
                method = "binned"
            else:
                method = "brute"
        else:
            method = "brute"

    # Pad faces to a multiple of face_chunk with degenerate entries.
    pad_f = (-F) % face_chunk
    if pad_f:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad_f, 3), dtype=faces.dtype)], axis=0
        )

    # Pad poses to a multiple of pose_block (never above N itself —
    # single-pose tracking must not render a whole padded block).
    pose_block = min(pose_block, max(1, N))
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

    if (use_light or get_normal) and vnormals is None:
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
        tex_quad = _pack_texture_quads(tex)  # 1-gather bilinear table
        tex_hw = (tex.shape[0], tex.shape[1])

    R_all = poses[:, :3, :3]

    # Column layout of the packed per-vertex attribute matrix, shared by
    # every rasterization path: [u, v | x, y, z cam | color/uv | diffuse
    # (use_light) | normal (get_normal)]. Lighting no longer implies
    # interpolated normals: the Lambertian term needs only the scalar
    # per-vertex diffuse — 3 fewer attribute rows through binning and
    # interpolation on the hot hypothesis-render path, which never reads
    # RenderOutput.normal. Static offsets:
    c_col = n_col = d_col = None
    _off = 5
    if uv is not None:
        c_col, _off = _off, _off + 2
    elif vertex_color is not None:
        c_col, _off = _off, _off + 3
    if use_light:
        d_col, _off = _off, _off + 1
    if get_normal:
        n_col = _off

    def pack_vdata(pts_cam_1, xy_1, R_1):
        """(V, D) packed per-vertex attributes for one pose."""
        cols = [xy_1, pts_cam_1]
        if uv is not None:
            cols.append(uv)
        elif vertex_color is not None:
            cols.append(vertex_color)
        if use_light or get_normal:
            vn_cam = (R_1 @ vnormals.T).T  # (V, 3)
            if use_light:
                vn_n = vn_cam / jnp.maximum(
                    jnp.linalg.norm(vn_cam, axis=-1, keepdims=True), 1e-12
                )
                diff_v = jnp.clip(
                    jnp.sum(vn_n * (-light_dir)[None], axis=-1), 0.0, 1.0
                )[:, None]
                cols.append(diff_v)
            if get_normal:
                cols.append(vn_cam)
        return jnp.concatenate(cols, axis=-1)

    def face_validity(pts_cam_1, z_f):
        valid_f = face_valid_static & jnp.all(z_f > 1e-4, axis=-1)
        if cull_backfaces:
            p0 = pts_cam_1[faces[:, 0]]
            fn = jnp.cross(
                pts_cam_1[faces[:, 1]] - p0, pts_cam_1[faces[:, 2]] - p0
            )
            valid_f = valid_f & (jnp.sum(fn * p0, axis=-1) < 0)
        return valid_f

    def finalize(interp, m):
        """Shared post-processing: (P, D) winner attrs + coverage ->
        (color, xyz, normal, mask) image tensors."""
        xyz = jnp.where(m[:, None], interp[:, 2:5], 0.0)
        if uv is not None:
            color = _sample_texture_quad(
                tex_quad, tex_hw, interp[:, c_col : c_col + 2]
            )
        elif vertex_color is not None:
            color = interp[:, c_col : c_col + 3]
        else:
            color = jnp.full((H * W, 3), 0.5, dtype=jnp.float32)
        if use_light:
            diff = interp[:, d_col : d_col + 1]
            color = color * w_ambient + diff * color * w_diffuse
        normal_out = None
        if get_normal:
            n_pix = interp[:, n_col : n_col + 3]
            n_pix = n_pix / jnp.maximum(
                jnp.linalg.norm(n_pix, axis=-1, keepdims=True), 1e-12
            )
            normal_out = jnp.where(m[:, None], n_pix, 0.0)
        color = jnp.clip(color, 0.0, 1.0)
        color = jnp.where(m[:, None], color, 0.0)
        return (
            color.reshape(H, W, 3),
            xyz.reshape(H, W, 3),
            (normal_out.reshape(H, W, 3) if normal_out is not None
             else jnp.zeros((H, W, 3), jnp.float32)),
            m.reshape(H, W),
        )

    if method == "pallas":
        # Fully-fused Pallas rasterizer: per-pose kernel does chunk->tile
        # binning (with capacity rounds + overflow reporting) AND the
        # subtile fine eval in VMEM (ops/pallas_raster2.py). Fastest
        # when faces are Morton-sorted (mesh_tensors does this); exact
        # regardless of face order. The record prep is gather-free: the
        # topology gathers (pos[faces], normals[faces], colors[faces])
        # happen ONCE outside the pose batch; per-pose work is pure
        # vectorized math (the per-pose vdata[faces] gather of the
        # brute/binned paths measured ~40 ms for 252 poses on v5e).
        from .pallas_raster2 import (
            active_chunks,
            pack_records,
            raster_pose_pallas,
        )

        nty, ntx = H // tile, W // tile
        T = nty * ntx
        Kp = ((max_faces_per_tile + 127) // 128) * 128

        pos_f = pos[faces]  # (F, 3, 3) — static topology gathers
        vn_f = vnormals[faces] if (use_light or get_normal) else None
        if uv is not None:
            col_f = uv[faces]  # (F, 3, 2)
        elif vertex_color is not None:
            col_f = vertex_color[faces]  # (F, 3, 3)
        else:
            col_f = None
        Dc = 0 if col_f is None else col_f.shape[-1]
        t_all = poses[:, :3, 3]

        def per_pose_rec(R_1, t_1, ctf_1):
            pts_f = pos_f @ R_1.T + t_1  # (F, 3, 3)
            z_f = jnp.maximum(pts_f[..., 2], 1e-8)
            u = pts_f[..., 0] * K[0, 0] / z_f + K[0, 2]
            v = pts_f[..., 1] * K[1, 1] / z_f + K[1, 2]
            if crop_tf is not None:
                u = ctf_1[0, 0] * u + ctf_1[0, 2]
                v = ctf_1[1, 1] * v + ctf_1[1, 2]
            xy_f = jnp.stack([u, v], axis=-1)  # (F, 3, 2)
            valid_f = face_valid_static & jnp.all(
                pts_f[..., 2] > 1e-4, axis=-1
            )
            if cull_backfaces:
                p0 = pts_f[:, 0]
                fn = jnp.cross(pts_f[:, 1] - p0, pts_f[:, 2] - p0)
                valid_f = valid_f & (jnp.sum(fn * p0, axis=-1) < 0)
            attr_cols = []
            if col_f is not None:
                attr_cols.append(col_f)
            if use_light or get_normal:
                vn_cam = vn_f @ R_1.T  # (F, 3, 3)
                if use_light:
                    vn_n = vn_cam / jnp.maximum(
                        jnp.linalg.norm(vn_cam, axis=-1, keepdims=True),
                        1e-12,
                    )
                    diff = jnp.clip(
                        jnp.sum(vn_n * (-light_dir), axis=-1), 0.0, 1.0
                    )[..., None]
                    attr_cols.append(diff)
                if get_normal:
                    attr_cols.append(vn_cam)
            tri_attr = jnp.concatenate(attr_cols, axis=-1)  # (F, 3, Da)
            coeffs, zinv = _face_coeffs(xy_f, pts_f[..., 2], valid_f)
            rec = pack_records(
                xy_f, pts_f[..., 2], valid_f, tri_attr, coeffs, zinv
            )
            act, acnt = active_chunks(rec, H, W, tile)
            return rec, act, acnt

        n_blocks = Np // pose_block
        ctf_all = (
            crop_tf.astype(jnp.float32)
            if crop_tf is not None
            else jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (Np, 3, 3))
        )
        rec_all, act_all, acnt_all = jax.lax.map(
            lambda a: jax.vmap(per_pose_rec)(*a),
            (
                R_all.reshape(n_blocks, pose_block, 3, 3),
                t_all.reshape(n_blocks, pose_block, 1, 3),
                ctf_all.reshape(n_blocks, pose_block, 3, 3),
            ),
        )
        D2 = rec_all.shape[-2]
        Da = (D2 - 17) // 3  # incl. the appended per-vertex [z, 1] rows
        An = Da - 2  # real attribute count
        rec_all = rec_all.reshape(Np, D2, -1)
        act_all = act_all.reshape(Np, T, -1)
        acnt_all = acnt_all.reshape(Np, T)
        interpret = jax.default_backend() != "tpu"
        out, ovf = raster_pose_pallas(
            rec_all, act_all, acnt_all, tile, ntx, nty, K=Kp,
            rounds=raster_rounds, interpret=interpret,
        )  # out (Np, T, Da, tile^2), pixels row-major within tiles

        out = out.reshape(Np, nty, ntx, Da, tile, tile)
        out = out.transpose(0, 1, 4, 2, 5, 3).reshape(Np, H * W, Da)
        attrs = out[..., :An]
        z_pix = out[..., An]
        m_all = out[..., An + 1] > 0.5

        # Camera-space XYZ reconstructed as z * ray (records carry no
        # position attrs). ray = Kinv @ crop_inv @ [px, py, 1].
        jj = jnp.arange(W, dtype=jnp.float32)
        ii = jnp.arange(H, dtype=jnp.float32)
        pu, pv = jnp.meshgrid(jj, ii, indexing="xy")
        pu = pu.reshape(-1)
        pv = pv.reshape(-1)
        if crop_tf is not None:
            uf = (pu[None] - ctf_all[:, 0:1, 2]) / ctf_all[:, 0:1, 0]
            vf = (pv[None] - ctf_all[:, 1:2, 2]) / ctf_all[:, 1:2, 1]
        else:
            uf = jnp.broadcast_to(pu[None], (Np, H * W))
            vf = jnp.broadcast_to(pv[None], (Np, H * W))
        ray_x = (uf - K[0, 2]) / K[0, 0]
        ray_y = (vf - K[1, 2]) / K[1, 1]
        xyz = jnp.stack(
            [z_pix * ray_x, z_pix * ray_y, z_pix], axis=-1
        )
        xyz = jnp.where(m_all[..., None], xyz, 0.0)

        c_lo = 0
        if col_f is not None:
            if uv is not None:
                color = jax.vmap(
                    lambda a: _sample_texture_quad(tex_quad, tex_hw, a[:, :2])
                )(attrs)
            else:
                color = attrs[..., :3]
            c_lo = Dc
        else:
            color = jnp.full((Np, H * W, 3), 0.5, dtype=jnp.float32)
        if use_light:
            diff = attrs[..., c_lo : c_lo + 1]
            color = color * w_ambient + diff * color * w_diffuse
            c_lo += 1
        color = jnp.clip(color, 0.0, 1.0)
        color = jnp.where(m_all[..., None], color, 0.0)
        normal = None
        if get_normal:
            n_pix = attrs[..., c_lo : c_lo + 3]
            n_pix = n_pix / jnp.maximum(
                jnp.linalg.norm(n_pix, axis=-1, keepdims=True), 1e-12
            )
            normal = jnp.where(m_all[..., None], n_pix, 0.0)

        return RenderOutput(
            color=color.reshape(Np, H, W, 3)[:N],
            xyz=xyz.reshape(Np, H, W, 3)[:N],
            normal=(normal.reshape(Np, H, W, 3)[:N] if get_normal else None),
            mask=m_all.reshape(Np, H, W)[:N],
            overflow=ovf[:N],
        )

    def render_block(args):
        pts_cam, xy, Rb = args  # (B, V, 3), (B, V, 2), (B, 3, 3)

        def one_pose(pts_cam_1, xy_1, R_1):
            z_v = pts_cam_1[:, 2]  # (V,)
            xy_f = xy_1[faces]  # (F, 3, 2)
            z_f = z_v[faces]  # (F, 3)
            valid_f = face_validity(pts_cam_1, z_f)
            vdata = pack_vdata(pts_cam_1, xy_1, R_1)

            if method == "binned":
                # Fused raster + interp: winner records fetched by a
                # one-hot MXU matmul inside the tile loop.
                interp, covered, ovf = _rasterize_binned_interp(
                    xy_f, z_f, valid_f, vdata[faces], H, W, tile,
                    max_faces_per_tile,
                )
                m = covered
            else:
                ovf = jnp.zeros((1,), jnp.int32)  # brute is exact
                best_face, covered = _rasterize_brute(
                    xy_f, z_f, valid_f, pix_u, pix_v, face_chunk
                )
                m = covered
                tri = faces[best_face]  # (P, 3)
                va = vdata[tri[:, 0]]  # (P, D)
                vb = vdata[tri[:, 1]]
                vc = vdata[tri[:, 2]]

                # Screen barycentrics of the winning face at each pixel.
                area2 = (vb[:, 0] - va[:, 0]) * (vc[:, 1] - va[:, 1]) - (
                    vc[:, 0] - va[:, 0]
                ) * (vb[:, 1] - va[:, 1])
                inv_a = jnp.where(jnp.abs(area2) < 1e-12, 0.0, 1.0 / area2)
                w0 = (
                    (vb[:, 0] - pix_u) * (vc[:, 1] - pix_v)
                    - (vc[:, 0] - pix_u) * (vb[:, 1] - pix_v)
                ) * inv_a
                w1 = (
                    (vc[:, 0] - pix_u) * (va[:, 1] - pix_v)
                    - (va[:, 0] - pix_u) * (vc[:, 1] - pix_v)
                ) * inv_a
                w2 = 1.0 - w0 - w1

                zs = jnp.stack([va[:, 4], vb[:, 4], vc[:, 4]], axis=-1)  # (P, 3)
                zinv = jnp.where(zs > 1e-8, 1.0 / zs, 0.0)
                zinv_sum = w0 * zinv[:, 0] + w1 * zinv[:, 1] + w2 * zinv[:, 2]
                zinv_sum = jnp.maximum(zinv_sum, 1e-12)
                # Perspective-correct barycentrics.
                c0 = (w0 * zinv[:, 0] / zinv_sum)[:, None]
                c1 = (w1 * zinv[:, 1] / zinv_sum)[:, None]
                c2 = 1.0 - c0 - c1
                interp = va * c0 + vb * c1 + vc * c2  # (P, D)

            return finalize(interp, m) + (ovf,)

        return jax.vmap(one_pose)(pts_cam, xy, Rb)

    n_blocks = Np // pose_block
    blocks = (
        pts_cam_all.reshape(n_blocks, pose_block, -1, 3),
        xy_all.reshape(n_blocks, pose_block, -1, 2),
        R_all.reshape(n_blocks, pose_block, 3, 3),
    )
    color, xyz, normal, mask, ovf = jax.lax.map(render_block, blocks)
    color = color.reshape(Np, H, W, 3)[:N]
    xyz = xyz.reshape(Np, H, W, 3)[:N]
    normal = normal.reshape(Np, H, W, 3)[:N] if get_normal else None
    mask = mask.reshape(Np, H, W)[:N]
    overflow = (
        ovf.reshape(Np, -1)[:N] if method == "binned" else None
    )  # brute tests every face — nothing can overflow
    return RenderOutput(
        color=color, xyz=xyz, normal=normal, mask=mask, overflow=overflow
    )
