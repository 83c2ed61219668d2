"""Register throughput with hypothesis funneling vs the parity default.

bench.py's exact workload (252 hyp, 5 refine iters, network scorer),
with EstimatorCfg.prune_after_iter sweeps.

    python tools/profile_funnel.py
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.models.networks import init_refine_net, init_score_net
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, FoundationPose, RasterCfg, RefinerCfg, ScorerCfg,
    )

    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    n = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(n[:, 1], n[:, 0]) / (2 * np.pi) + 0.5,
         n[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)

    H, W = 480, 640
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.9]
    out = render_mesh(
        jnp.asarray(mesh.vertices.astype(np.float32)),
        jnp.asarray(mesh.faces.astype(np.int32)),
        jnp.asarray(gt[None]), jnp.asarray(K), out_hw=(H, W),
        uv=jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)),
        tex=jnp.asarray(tex.astype(np.float32) / 255.0),
        vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
        use_light=True,
    )
    rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
    depth = np.asarray(out.depth[0]).astype(np.float32)
    mask = np.asarray(out.mask[0]).astype(np.uint8)

    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    base = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster),
    )
    rp = init_refine_net(jax.random.PRNGKey(0), base.refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), base.scorer.net)

    for label, cfg in [
        ("parity (no prune)", base),
        ("prune@2 keep 64", dataclasses.replace(base, prune_after_iter=2, prune_keep=64)),
        ("prune@1 keep 64", dataclasses.replace(base, prune_after_iter=1, prune_keep=64)),
        ("prune@2 keep 128", dataclasses.replace(base, prune_after_iter=2, prune_keep=128)),
    ]:
        est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=rp, scorer_params=sp)
        est.register(K, rgb, depth, mask, iteration=5)  # compile
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            est.register(K, rgb, depth, mask, iteration=5)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"{label:22s}: {t*1e3:7.1f} ms  ({252/t:6.1f} hyp/s)")


if __name__ == "__main__":
    main()
