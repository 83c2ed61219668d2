"""Stage-level profiling of the registration hot path on the real chip.

Times, separately: full register graph, the binned render (end to end),
the binning stage alone, the XLA fine stage alone, the Pallas fine
stage, the observation warp, and the network forwards. Run on TPU:

    python tools/profile_register.py
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
    return float(np.median(ts)) * 1e3  # ms


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.ops.rasterizer import (
        _bin_face_records,
        _screen_vertices,
        _rasterize_binned_interp,
    )
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.ops.warp import warp_crop
    from foundationpose_tpu.models.networks import (
        init_refine_net, init_score_net, apply_refine_net, apply_score_net,
    )

    # same workload as bench.py
    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
         nrm[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces")

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
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster),
    )
    rp = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), cfg.scorer.net)
    est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=rp, scorer_params=sp)
    n_hyp = int(np.asarray(est.hyp_valid).sum())
    N = est.rot_grid.shape[0]
    print(f"hypotheses: {n_hyp} valid / {N} padded")

    # --- full register
    t = timeit(lambda: est.register(K, rgb, depth, mask, iteration=5), n=3)
    print(f"full register:                 {t:8.1f} ms  ({n_hyp / (t/1e3):.0f} hyp/s)")

    # --- renders: 252 crops @ 160^2, using the real hypothesis grid
    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = gt[:3, 3]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    pos = jnp.asarray(mesh.vertices.astype(np.float32))
    fcs = jnp.asarray(mesh.faces.astype(np.int32))
    uvj = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1))
    texj = jnp.asarray(tex.astype(np.float32) / 255.0)
    vn = jnp.asarray(mesh.vertex_normals.astype(np.float32))
    diam = jnp.float32(est.diameter)
    tf = compute_crop_window_tf(posesj, Kj, 1.2, 160, diam)

    common = dict(
        out_hw=(160, 160), crop_tf=tf, uv=uvj, tex=texj, vnormals=vn,
        use_light=True, tile=32, max_faces_per_tile=256, cull_backfaces=True,
    )
    t_binned = timeit(
        lambda: render_mesh(pos, fcs, posesj, Kj, method="binned", **common))
    print(f"render 252x160^2 binned:       {t_binned:8.1f} ms")
    t_pallas = timeit(
        lambda: render_mesh(pos, fcs, posesj, Kj, method="pallas", **common))
    print(f"render 252x160^2 pallas:       {t_pallas:8.1f} ms")

    # --- binning stage alone (vmapped over poses, K=256)
    @jax.jit
    def bin_only(posesj, tf):
        pts_cam, xy = _screen_vertices(pos, posesj, Kj, tf)

        def per_pose(pc, xy1):
            z_v = pc[:, 2]
            xy_f = xy1[fcs]
            z_f = z_v[fcs]
            valid = jnp.all(z_f > 1e-4, axis=-1)
            attr = jnp.zeros((fcs.shape[0], 3, 11), jnp.float32)
            return _bin_face_records(xy_f, z_f, valid, attr, 160, 160, 32, 256)

        return jax.lax.map(
            lambda t_: jax.vmap(per_pose)(*t_),
            (pts_cam.reshape(-1, 14, pts_cam.shape[1], 3),
             xy.reshape(-1, 14, xy.shape[1], 2)),
        )

    t_bin = timeit(bin_only, posesj, tf)
    print(f"  binning stage (K=256,Da=11): {t_bin:8.1f} ms")

    # --- observation warp
    rgbj = jnp.asarray(rgb.astype(np.float32) / 255.0)
    t_warp = timeit(
        jax.jit(lambda: warp_crop(rgbj, tf, (160, 160), mode="bilinear")))
    print(f"  obs warp rgb 252x:           {t_warp:8.1f} ms")

    # --- networks
    A = jnp.asarray(rng.uniform(0, 1, (N, 160, 160, 6)), jnp.float32)
    B = jnp.asarray(rng.uniform(0, 1, (N, 160, 160, 6)), jnp.float32)
    refine_j = jax.jit(lambda a, b: apply_refine_net(rp, cfg.refiner.net, a, b))
    t_ref = timeit(refine_j, A, B)
    print(f"refine net fwd 252 pairs:      {t_ref:8.1f} ms")
    score_j = jax.jit(lambda a, b: apply_score_net(sp, cfg.scorer.net, a, b))
    t_sco = timeit(score_j, A, B)
    print(f"score net fwd 252 pairs:       {t_sco:8.1f} ms")

    est_total = 6 * t_binned + 5 * t_ref + t_sco + 6 * t_warp * 2
    print(f"\nrough sum (6 renders + 5 refine + score + warps): {est_total:.0f} ms")


if __name__ == "__main__":
    main()
