"""Split prep (XLA) vs kernel time for the fused pallas rasterizer."""
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
    from foundationpose_tpu.ops.rasterizer import _screen_vertices, _face_coeffs
    from foundationpose_tpu.ops.pallas_raster2 import (
        pack_records, active_chunks, raster_pose_pallas,
    )
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

    fcs = mt.faces
    Fp = fcs.shape[0]
    pad_f = (-Fp) % 512
    if pad_f:
        fcs = jnp.concatenate([fcs, jnp.zeros((pad_f, 3), fcs.dtype)], axis=0)

    light = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    @jax.jit
    def prep(posesj, tf):
        pts_cam_all, xy_all = _screen_vertices(mt.pos, posesj, Kj, tf)
        R_all = posesj[:, :3, :3]

        def per_pose(pc, xy1, R1):
            z_v = pc[:, 2]
            xy_f = xy1[fcs]
            z_f = z_v[fcs]
            valid = jnp.all(z_f > 1e-4, axis=-1)
            p0 = pc[fcs[:, 0]]
            fn = jnp.cross(pc[fcs[:, 1]] - p0, pc[fcs[:, 2]] - p0)
            valid = valid & (jnp.sum(fn * p0, axis=-1) < 0)
            vn_cam = (R1 @ mt.vnormals.T).T
            vn_n = vn_cam / jnp.maximum(
                jnp.linalg.norm(vn_cam, axis=-1, keepdims=True), 1e-12)
            diff = jnp.clip(jnp.sum(vn_n * (-light)[None], axis=-1), 0, 1)[:, None]
            col = mt.uv if mt.uv is not None else mt.vertex_color
            vdata = jnp.concatenate([xy1, pc, col, diff], axis=-1)
            coeffs, zinv = _face_coeffs(xy_f, z_f, valid)
            rec = pack_records(xy_f, z_f, valid, vdata[fcs], coeffs, zinv)
            act, acnt = active_chunks(rec, 160, 160, 32)
            return rec, act, acnt

        return jax.lax.map(
            lambda t_: jax.vmap(per_pose)(*t_),
            (pts_cam_all.reshape(-1, 14, pts_cam_all.shape[1], 3),
             xy_all.reshape(-1, 14, xy_all.shape[1], 2),
             R_all.reshape(-1, 14, 3, 3)))

    rec, act, acnt = prep(posesj, tf)
    N = posesj.shape[0]
    rec = rec.reshape(N, rec.shape[-2], rec.shape[-1])
    act = act.reshape(N, act.shape[-2], act.shape[-1])
    acnt = acnt.reshape(N, -1)
    jax.block_until_ready((rec, act, acnt))
    print(f"prep (records + active lists):   {timeit(prep, posesj, tf):7.1f} ms")
    a = np.asarray(acnt)
    print(f"active chunks/tile: mean {a.mean():.1f}  p95 "
          f"{np.percentile(a, 95):.0f}  max {a.max()}")

    f = jax.jit(lambda rec, act, acnt: raster_pose_pallas(
        rec, act, acnt, 32, 5, 5, K=256)[0].sum())
    print(f"kernel only:                     {timeit(f, rec, act, acnt):7.1f} ms")

    out, ovf = raster_pose_pallas(rec, act, acnt, 32, 5, 5, K=256)
    print(f"overflow faces: {int(np.asarray(ovf).sum())}")


if __name__ == "__main__":
    main()
