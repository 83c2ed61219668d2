"""Device-resident mesh pytree (the reference's make_mesh_tensors,
Utils.py:104-130, as an immutable JAX pytree)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import jax_config  # noqa: F401
from ..meshio import TriMesh


class MeshTensors(NamedTuple):
    pos: jax.Array  # (V, 3) f32
    faces: jax.Array  # (F, 3) i32
    vnormals: jax.Array  # (V, 3) f32
    vertex_color: jax.Array | None  # (V, 3) f32 in [0,1], or None
    uv: jax.Array | None  # (V, 2) f32, or None
    tex: jax.Array | None  # (Ht, Wt, 3) f32 in [0,1], or None


def morton_sort_faces(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Reorder faces along a Morton (Z-order) curve of their centroids.

    Spatially-coherent face index order makes 128-face chunks project to
    compact screen patches under ANY pose, which is what lets the fused
    Pallas rasterizer (ops/pallas_raster2.py) skip chunks per tile. A
    pure host-side one-shot permutation; rendering semantics don't
    depend on face order (z-buffering picks the nearest face), only tie
    handling at exactly-equal depth does, and ties are coplanar
    duplicates. Returns the permuted (F, 3) array.
    """
    c = vertices[faces].mean(axis=1)  # (F, 3) centroids
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-12)
    q = np.minimum(((c - lo) / span * 1023.0).astype(np.uint64), 1023)

    def spread(x):  # interleave 10 bits with 2-bit gaps
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return faces[np.argsort(code, kind="stable")]


def make_mesh_tensors(mesh: TriMesh, max_tex_size: int | None = None) -> MeshTensors:
    """Mirror of Utils.py:104-130 including the texture V-flip (uv[:,1] = 1-v).

    Faces are Morton-sorted (see morton_sort_faces) for rasterizer
    chunk locality."""
    uv = tex = vertex_color = None
    if mesh.has_texture:
        img = mesh.texture
        if max_tex_size is not None and max(img.shape[:2]) > max_tex_size:
            from PIL import Image

            scale = max_tex_size / max(img.shape[:2])
            new_wh = (int(img.shape[1] * scale), int(img.shape[0] * scale))
            img = np.asarray(Image.fromarray(img).resize(new_wh))
        tex = jnp.asarray(img, dtype=jnp.float32) / 255.0
        uv_np = np.asarray(mesh.uv, dtype=np.float32).copy()
        uv_np[:, 1] = 1.0 - uv_np[:, 1]
        uv = jnp.asarray(uv_np)
    else:
        colors = mesh.vertex_colors
        if colors is None:
            colors = np.full((len(mesh.vertices), 3), 128, dtype=np.uint8)
        vertex_color = jnp.asarray(colors[:, :3], dtype=jnp.float32) / 255.0

    faces_np = morton_sort_faces(
        np.asarray(mesh.vertices, np.float64),
        np.asarray(mesh.faces, np.int64),
    )
    return MeshTensors(
        pos=jnp.asarray(mesh.vertices, dtype=jnp.float32),
        faces=jnp.asarray(faces_np, dtype=jnp.int32),
        vnormals=jnp.asarray(mesh.vertex_normals, dtype=jnp.float32),
        vertex_color=vertex_color,
        uv=uv,
        tex=tex,
    )
