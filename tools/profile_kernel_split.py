"""Split the pallas raster kernel's device time into fill (binning)
vs fine-eval by compiling ablated kernel variants, and sweep tile size.

    python tools/profile_kernel_split.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def build_inputs(tile, mfpt):
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.models.networks import init_refine_net, init_score_net
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf

    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
         nrm[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)

    raster = RasterCfg(tile=tile, max_faces_per_tile=mfpt, cull_backfaces=True)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster),
    )
    rp = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), cfg.scorer.net)
    est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=rp, scorer_params=sp)
    mt = est.mesh_tensors

    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = [0.02, -0.01, 0.9]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    diam = jnp.float32(est.diameter)
    tf = jax.jit(lambda p: compute_crop_window_tf(p, Kj, 1.2, 160, diam))(posesj)
    return mt, posesj, Kj, tf, raster, render_mesh


def main():
    for tile, mfpt in ((32, 256), (16, 256), (16, 128)):
        mt, posesj, Kj, tf, raster, render_mesh = build_inputs(tile, mfpt)

        def rend(p, tf_):
            return render_mesh(
                mt.pos, mt.faces, p, Kj, out_hw=(160, 160), crop_tf=tf_,
                vertex_color=mt.vertex_color, uv=mt.uv, tex=mt.tex,
                vnormals=mt.vnormals, use_light=True, method="pallas",
                tile=raster.tile, max_faces_per_tile=raster.max_faces_per_tile,
                cull_backfaces=raster.cull_backfaces,
                pose_block=raster.pose_block, raster_rounds=raster.rounds)

        t = timeit(jax.jit(lambda p, tf_: rend(p, tf_).color), posesj, tf)
        print(f"tile={tile:3d} K={mfpt:3d}: full render 252x160^2: {t:7.2f} ms")


if __name__ == "__main__":
    main()
