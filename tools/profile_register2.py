"""Device-time profile of the register graph, RTT-calibrated.

Each stage is jitted END-TO-END exactly as the fused graph composes it,
timed with block_until_ready, and the host<->chip round trip (measured
on a trivial jitted op) subtracted — so the numbers are device time,
comparable with the fused register graph's total.

    python tools/profile_register2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, **kw):
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
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.pipeline.crops import make_crop_inputs
    from foundationpose_tpu.pipeline.refiner import refine_poses
    from foundationpose_tpu.pipeline.scorer import score_poses
    from foundationpose_tpu.models.networks import (
        init_refine_net, init_score_net, apply_refine_net, apply_score_net,
    )

    # bench.py workload
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

    # --- RTT calibration
    one = jnp.float32(1.0)
    triv = jax.jit(lambda x: x + 1.0)
    rtt = timeit(triv, one, n=20)
    print(f"RTT (trivial jitted dispatch):  {rtt:7.1f} ms")

    mt = est.mesh_tensors
    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = gt[:3, 3]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    diam = jnp.float32(est.diameter)
    rgbj = jnp.asarray(rgb.astype(np.float32) / 255.0)
    from foundationpose_tpu.geometry.projection import depth_to_xyz_map
    xyz_map = jax.jit(depth_to_xyz_map)(jnp.asarray(depth), Kj)
    xyz_map = jax.block_until_ready(xyz_map)

    # --- full register (fused graph, through est API)
    t_full = timeit(lambda: est.register(K, rgb, depth, mask, iteration=5), n=3)
    print(f"full register:                  {t_full:7.1f} ms")

    # --- crop inputs (render + 2 warps + centering), jitted
    ci = jax.jit(lambda p: make_crop_inputs(
        mt, p, Kj, rgbj, xyz_map, diam,
        input_res=160, crop_ratio=1.2, normalize_xyz=True,
        invalid_z=0.001, raster=raster))
    t_ci = timeit(ci, posesj)
    print(f"crop inputs (render+warps+ctr): {t_ci - rtt:7.1f} ms dev  ({t_ci:.1f} raw)")

    # --- render only, jitted
    ro = jax.jit(lambda p: make_crop_inputs(
        mt, p, Kj, rgbj * 0, xyz_map * 0, diam,
        input_res=160, crop_ratio=1.2, normalize_xyz=True,
        invalid_z=0.001, raster=raster)[0])
    # (same graph shape; warps of zeros cost the same — use A only)

    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    tf = jax.jit(lambda p: compute_crop_window_tf(p, Kj, 1.2, 160, diam))(posesj)
    rend = jax.jit(lambda p, tf_: render_mesh(
        mt.pos, mt.faces, p, Kj, out_hw=(160, 160), crop_tf=tf_,
        vertex_color=mt.vertex_color, uv=mt.uv, tex=mt.tex,
        vnormals=mt.vnormals, use_light=True, method=raster.method,
        tile=raster.tile, max_faces_per_tile=raster.max_faces_per_tile,
        cull_backfaces=raster.cull_backfaces,
        pose_block=raster.pose_block, raster_rounds=raster.rounds))
    t_rend = timeit(rend, posesj, tf)
    print(f"render 252x160^2 (jitted):      {t_rend - rtt:7.1f} ms dev")

    # --- warps, jitted together (rgb bilinear + xyz nearest)
    from foundationpose_tpu.ops.warp import warp_crop
    wb = jax.jit(lambda tf_: (
        warp_crop(rgbj, tf_, (160, 160), mode="bilinear"),
        warp_crop(xyz_map, tf_, (160, 160), mode="nearest")))
    t_warp = timeit(wb, tf)
    print(f"obs warps rgb+xyz 252x:         {t_warp - rtt:7.1f} ms dev")

    # --- refine net fwd, jitted, bf16 (as the graph runs it)
    A = jnp.asarray(rng.uniform(0, 1, (252, 160, 160, 6)), jnp.float32)
    B = jnp.asarray(rng.uniform(0, 1, (252, 160, 160, 6)), jnp.float32)
    rfwd = jax.jit(lambda a, b: apply_refine_net(
        rp, cfg.refiner.net, a, b, dtype=jnp.bfloat16))
    t_rf = timeit(rfwd, A, B)
    print(f"refine net fwd 252 (bf16):      {t_rf - rtt:7.1f} ms dev")

    sfwd = jax.jit(lambda a, b: apply_score_net(
        sp, cfg.scorer.net, a, b, dtype=jnp.bfloat16))
    t_sf = timeit(sfwd, A, B)
    print(f"score net fwd 252 (bf16):       {t_sf - rtt:7.1f} ms dev")

    # --- one full refine iteration x5 (scan) as the graph runs it
    rf5 = jax.jit(lambda p: refine_poses(
        rp, cfg.refiner, mt, p, Kj, rgbj, xyz_map, diam, iterations=5))
    t_r5 = timeit(rf5, posesj, n=5)
    print(f"refine x5 (fused scan):         {t_r5 - rtt:7.1f} ms dev")

    sc = jax.jit(lambda p: score_poses(
        sp, cfg.scorer, mt, p, Kj, rgbj, xyz_map, diam,
        valid=est.hyp_valid))
    t_sc = timeit(sc, posesj, n=5)
    print(f"score (fused):                  {t_sc - rtt:7.1f} ms dev")

    dev_sum = (t_r5 - rtt) + (t_sc - rtt)
    print(f"\nrefine+score device sum:        {dev_sum:7.1f} ms "
          f"(full register raw {t_full:.1f})")
    per_iter = (t_ci - rtt) + (t_rf - rtt)
    print(f"per-iteration (crops + net):    {per_iter:7.1f} ms x5 = {5*per_iter:.1f}")


if __name__ == "__main__":
    main()
