"""True in-graph stage costs: each stage jitted with a scalar-reduced
output so HBM materialization of big intermediates doesn't distort it."""
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
    from foundationpose_tpu.ops.rasterizer import (
        _bin_face_records, _screen_vertices,
    )
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.ops.warp import warp_crop
    from foundationpose_tpu.models.networks import (
        init_refine_net, init_score_net, apply_refine_net, apply_score_net,
    )
    from foundationpose_tpu.pipeline.crops import make_crop_inputs

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

    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster))
    rp = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), cfg.scorer.net)
    est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=rp, scorer_params=sp)
    mt = est.mesh_tensors
    N = est.rot_grid.shape[0]

    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = gt[:3, 3]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    diam = jnp.float32(est.diameter)
    rgbj = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    xyzj = jnp.asarray(rng.uniform(0.5, 1.5, (H, W, 3)), jnp.float32)

    tf = compute_crop_window_tf(posesj, Kj, 1.2, 160, diam)

    def rsum(o):
        return o.color.sum() + o.xyz.sum() + (0 if o.normal is None else o.normal.sum())

    for method in ("binned", "pallas"):
        f = jax.jit(lambda m=method: rsum(render_mesh(
            mt.pos, mt.faces, posesj, Kj, out_hw=(160, 160), crop_tf=tf,
            uv=mt.uv, tex=mt.tex, vnormals=mt.vnormals, use_light=True,
            method=m, tile=32, max_faces_per_tile=256, cull_backfaces=True)))
        print(f"render {method} (fused, sum-reduced):   {timeit(f):7.1f} ms")

    # binning alone, sum-reduced
    @jax.jit
    def bin_only():
        pts_cam, xy = _screen_vertices(mt.pos, posesj, Kj, tf)

        def per_pose(pc, xy1):
            z_v = pc[:, 2]
            xy_f = xy1[mt.faces]
            z_f = z_v[mt.faces]
            valid = jnp.all(z_f > 1e-4, axis=-1)
            attr = jnp.zeros((mt.faces.shape[0], 3, 11), jnp.float32)
            return _bin_face_records(
                xy_f, z_f, valid, attr, 160, 160, 32, 256).sum()

        return jax.lax.map(
            lambda t_: jax.vmap(per_pose)(*t_),
            (pts_cam.reshape(-1, 14, pts_cam.shape[1], 3),
             xy.reshape(-1, 14, xy.shape[1], 2))).sum()

    print(f"binning alone (sum-reduced):        {timeit(bin_only):7.1f} ms")

    wf = jax.jit(lambda: warp_crop(rgbj, tf, (160, 160), mode="bilinear").sum()
                 + warp_crop(xyzj, tf, (160, 160), mode="nearest").sum())
    print(f"obs warp rgb+xyz (sum-reduced):     {timeit(wf):7.1f} ms")

    cf = jax.jit(lambda: sum(
        x.sum() for x in make_crop_inputs(
            mt, posesj, Kj, rgbj, xyzj, diam, input_res=160, crop_ratio=1.2,
            normalize_xyz=True, invalid_z=0.4, raster=raster)[:2]))
    print(f"make_crop_inputs (sum-reduced):     {timeit(cf):7.1f} ms")

    A = jnp.asarray(rng.uniform(0, 1, (N, 160, 160, 6)), jnp.float32)
    B = jnp.asarray(rng.uniform(0, 1, (N, 160, 160, 6)), jnp.float32)
    rf = jax.jit(lambda: sum(
        v.sum() for v in apply_refine_net(rp, cfg.refiner.net, A, B).values()))
    print(f"refine net fwd (sum-reduced):       {timeit(rf):7.1f} ms")
    sf = jax.jit(lambda: apply_score_net(sp, cfg.scorer.net, A, B).sum())
    print(f"score net fwd (sum-reduced):        {timeit(sf):7.1f} ms")


if __name__ == "__main__":
    main()
