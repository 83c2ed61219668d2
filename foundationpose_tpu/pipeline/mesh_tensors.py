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


def make_mesh_tensors(mesh: TriMesh, max_tex_size: int | None = None) -> MeshTensors:
    """Mirror of Utils.py:104-130 including the texture V-flip (uv[:,1] = 1-v)."""
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

    return MeshTensors(
        pos=jnp.asarray(mesh.vertices, dtype=jnp.float32),
        faces=jnp.asarray(mesh.faces, dtype=jnp.int32),
        vnormals=jnp.asarray(mesh.vertex_normals, dtype=jnp.float32),
        vertex_color=vertex_color,
        uv=uv,
        tex=tex,
    )
