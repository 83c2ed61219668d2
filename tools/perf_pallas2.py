"""TPU perf + parity for the fused pallas rasterizer at bench shape."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=7, **kw):
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
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.models.networks import init_refine_net, init_score_net

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
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.9]

    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster))
    est = FoundationPose(
        mesh=mesh, cfg=cfg,
        refiner_params=init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net),
        scorer_params=init_score_net(jax.random.PRNGKey(1), cfg.scorer.net))
    mt = est.mesh_tensors

    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = gt[:3, 3]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    tf = compute_crop_window_tf(posesj, Kj, 1.2, 160, jnp.float32(est.diameter))

    common = dict(
        out_hw=(160, 160), crop_tf=tf, uv=mt.uv, tex=mt.tex,
        vnormals=mt.vnormals, use_light=True, tile=32,
        max_faces_per_tile=256, cull_backfaces=True)

    outs = {}
    for method in ("brute", "binned", "pallas"):
        f = jax.jit(lambda m=method: render_mesh(
            mt.pos, mt.faces, posesj, Kj, method=m, **common))
        o = f()
        jax.block_until_ready(o)
        outs[method] = o
        fsum = jax.jit(lambda m=method: (lambda o: o.color.sum() + o.xyz.sum())(
            render_mesh(mt.pos, mt.faces, posesj, Kj, method=m, **common)))
        print(f"render {method:7s}: {timeit(fsum):7.1f} ms")

    for m in ("binned", "pallas"):
        a, b = outs["brute"], outs[m]
        dc = float(jnp.max(jnp.abs(a.color - b.color)))
        dx = float(jnp.max(jnp.abs(a.xyz - b.xyz)))
        dm = int(jnp.sum(a.mask != b.mask))
        print(f"{m} vs brute: color {dc:.2e}  xyz {dx:.2e}  mask px {dm}")


if __name__ == "__main__":
    main()
