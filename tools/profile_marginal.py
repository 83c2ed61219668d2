"""Marginal stage costs inside the fused register graph.

Times register_graph at iterations=1..5 and with scorer on/off; the
slope gives the true in-graph cost of one refine iteration (render +
warp + net + update), and the intercept difference gives the scorer
stage cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.models.networks import init_refine_net, init_score_net
    from foundationpose_tpu.pipeline.graph import register_graph

    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
         nrm[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)

    H, W = 480, 640
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.9]
    out = render_mesh(
        jnp.asarray(verts.astype(np.float32)),
        jnp.asarray(faces.astype(np.int32)),
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
    cfgs = {
        "network": EstimatorCfg(
            refiner=RefinerCfg(raster=raster),
            scorer=ScorerCfg(mode="network", raster=raster)),
        "depth": EstimatorCfg(
            refiner=RefinerCfg(raster=raster),
            scorer=ScorerCfg(mode="depth", raster=raster)),
    }
    rp = init_refine_net(jax.random.PRNGKey(0), cfgs["network"].refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), cfgs["network"].scorer.net)
    est = FoundationPose(
        mesh=mesh, cfg=cfgs["network"], refiner_params=rp, scorer_params=sp)

    args = dict(
        refiner_params=est.refiner_params,
        scorer_params=est.scorer_params,
        mesh=est.mesh_tensors,
        rot_grid=est.rot_grid,
        hyp_valid=est.hyp_valid,
        K=jnp.asarray(K),
        rgb_u8=jnp.asarray(rgb),
        depth_raw=jnp.asarray(depth),
        mask=jnp.asarray(mask),
        mesh_diameter=jnp.float32(est.diameter),
    )

    for mode in ("network", "depth"):
        ts = {}
        for it in (1, 2, 3, 5):
            ts[it] = timeit(
                lambda it=it: register_graph(
                    cfg=cfgs[mode], iterations=it, **args), n=3)
        slope = (ts[5] - ts[1]) / 4
        print(f"scorer={mode}: " + "  ".join(
            f"it{k}={v:.0f}ms" for k, v in ts.items()))
        print(f"  per-refine-iteration (render+warp+net+update): {slope:.1f} ms")
        print(f"  fixed part (preproc + scorer + sort): {ts[1] - slope:.1f} ms")


if __name__ == "__main__":
    main()
