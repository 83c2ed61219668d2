"""Exact per-pixel texturing vs vertex-color bake at the bench shape.

The exact path now samples from a quad-packed table (ONE gather per
covered pixel, ops/rasterizer.py::_sample_texture_quad). This measures
what exact texturing costs relative to the default bake on the actual
hypothesis-render workload (252 poses x 160^2 crops).

    python tools/profile_texture.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere, sample_views_icosphere
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.meshio import TriMesh, compute_mesh_diameter, texture_to_vertex_colors
    from foundationpose_tpu.ops import render_mesh

    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    n = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(n[:, 1], n[:, 0]) / (2 * np.pi) + 0.5,
         n[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)
    baked = texture_to_vertex_colors(mesh)

    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
    views = sample_views_icosphere(n_views=40)
    poses = np.linalg.inv(views)[:252].astype(np.float32)
    poses[:, :3, 3] = [0.02, -0.01, 0.9]
    diam = jnp.float32(compute_mesh_diameter(mesh.vertices))
    crop_tf = compute_crop_window_tf(
        jnp.asarray(poses), jnp.asarray(K), 1.2, 160, diam
    )
    base = dict(
        out_hw=(160, 160), crop_tf=crop_tf,
        vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
        use_light=True, tile=32, max_faces_per_tile=256, cull_backfaces=True,
    )
    pos_j = jnp.asarray(mesh.vertices.astype(np.float32))
    fac_j = jnp.asarray(mesh.faces.astype(np.int32))
    pz = jnp.asarray(poses)
    Kj = jnp.asarray(K)

    uvf = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)
    t_exact = timeit(lambda: render_mesh(
        pos_j, fac_j, pz, Kj,
        uv=jnp.asarray(uvf), tex=jnp.asarray(tex.astype(np.float32) / 255.0),
        **base,
    ))
    t_baked = timeit(lambda: render_mesh(
        pos_j, fac_j, pz, Kj,
        vertex_color=jnp.asarray(baked.vertex_colors.astype(np.float32) / 255.0),
        **base,
    ))
    print(f"exact per-pixel texture (quad-packed, 1 gather/px): {t_exact:7.1f} ms")
    print(f"vertex-color bake (default):                        {t_baked:7.1f} ms")


if __name__ == "__main__":
    main()
