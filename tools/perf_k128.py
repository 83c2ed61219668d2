"""Measure pallas render at max_faces_per_tile 128 vs 256 (bench shape).

The kernel's capacity rounds make K=128 EXACT (spilling tiles just run
a second fill+eval round); the question is pure speed: the fill routing
matmul and the fine-eval width halve, but dense tiles pay a second
round. Also checks overflow and parity vs brute.
"""
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

    base = None
    for mft in (256, 128):
        f = jax.jit(lambda p, t_, mft=mft: render_mesh(
            mt.pos, mt.faces, p, Kj, out_hw=(160, 160), crop_tf=t_,
            vertex_color=mt.vertex_color, vnormals=mt.vnormals,
            use_light=True, method="pallas", tile=32,
            max_faces_per_tile=mft, cull_backfaces=True, pose_block=16,
            raster_rounds=4))
        out = jax.block_until_ready(f(posesj, tf))
        ovf = int(np.asarray(out.overflow).sum())
        t = timeit(f, posesj, tf)
        print(f"K={mft:4d}: {t:7.1f} ms raw  overflow={ovf}")
        if base is None:
            base = out
        else:
            dm = int((np.asarray(out.mask) != np.asarray(base.mask)).sum())
            dc = float(np.abs(np.asarray(out.color) - np.asarray(base.color)).max())
            print(f"  vs K=256: mask diff px {dm}, color max |d| {dc:.2e}")


if __name__ == "__main__":
    main()
