"""Multi-object tracking throughput: MultiTracker vs M single trackers.

Measures, on the attached TPU (or CPU if forced):
  - M independent FoundationPose.track_one_async pipelines (the
    reference's structure: one estimator per object)
  - MultiTracker.track_async (one fused dispatch per frame for all M)

    python tools/profile_multi.py [M]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.models.networks import init_refine_net
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, FoundationPose, MultiTracker, RasterCfg, RefinerCfg,
        ScorerCfg,
    )

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W = 480, 640
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
    rng = np.random.default_rng(0)

    # M bumpy spheres (bench.py-style ~5k faces each), spread over the frame
    meshes, poses = [], []
    for m in range(M):
        verts, faces = icosphere(4, radius=0.08)
        verts = verts * (1.0 + 0.15 * np.sin((5 + m) * verts[:, 2:3]))
        meshes.append(TriMesh(
            vertices=verts.astype(np.float64), faces=faces.astype(np.int64),
            vertex_colors=rng.integers(40, 255, (len(verts), 3)).astype(np.uint8),
        ))
        p = np.eye(4)
        gx = (m % 3 - 1) * 0.25
        gy = (m // 3 - 0.5) * 0.2
        p[:3, 3] = [gx, gy, 1.0 + 0.1 * m]
        poses.append(p)
    poses = np.stack(poses)

    # Composite synthetic frame
    rgb = np.zeros((H, W, 3), np.uint8)
    depth = np.full((H, W), np.inf, np.float32)
    for mesh, pose in zip(meshes, poses):
        out = render_mesh(
            jnp.asarray(mesh.vertices.astype(np.float32)),
            jnp.asarray(mesh.faces.astype(np.int32)),
            jnp.asarray(pose[None].astype(np.float32)), jnp.asarray(K),
            out_hw=(H, W),
            vertex_color=jnp.asarray(mesh.vertex_colors.astype(np.float32) / 255.0),
            vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
            use_light=True,
        )
        d = np.where(np.asarray(out.depth[0]) > 0, np.asarray(out.depth[0]), np.inf)
        closer = d < depth
        depth = np.where(closer, d, depth)
        rgb = np.where(closer[..., None],
                       (np.asarray(out.color[0]) * 255).astype(np.uint8), rgb)
    depth = np.where(np.isinf(depth), 0.0, depth).astype(np.float32)

    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="depth", raster=raster),
    )
    params = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    # Zero the output heads: identity refinement at full compute cost,
    # so poses (and ROI windows) stay stationary across the run.
    for head in ("trans_head", "rot_head"):
        params[head]["1"]["kernel"] = jnp.zeros_like(params[head]["1"]["kernel"])
        params[head]["1"]["bias"] = jnp.zeros_like(params[head]["1"]["bias"])

    ests = []
    for mesh, pose in zip(meshes, poses):
        est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
        raw = pose @ np.linalg.inv(est.get_tf_to_centered_mesh())
        est.pose_last = jnp.asarray(raw, jnp.float32)
        est._pose_hint = raw
        ests.append(est)

    n_frames = 60

    def run_singles():
        futs = []
        for _ in range(n_frames):
            futs.append([e.track_one_async(rgb, depth, K, iteration=2) for e in ests])
            while len(futs) > 2:
                for f in futs.pop(0):
                    f.result()
        for fr in futs:
            for f in fr:
                f.result()

    def run_multi(tracker):
        futs = []
        for _ in range(n_frames):
            futs.append(tracker.track_async(rgb, depth, K, iteration=2))
            while len(futs) > 2:
                futs.pop(0).result()
        for f in futs:
            f.result()

    # M single trackers (reference structure), pipelined per object
    run_singles()  # compile
    t0 = time.perf_counter()
    run_singles()
    t_single = (time.perf_counter() - t0) / n_frames

    tracker = MultiTracker.from_estimators(ests)
    run_multi(tracker)  # compile
    t0 = time.perf_counter()
    run_multi(tracker)
    t_multi = (time.perf_counter() - t0) / n_frames

    print(f"M={M} objects, {n_frames} frames, 2 refine iters/frame")
    print(f"M single trackers : {t_single*1e3:7.1f} ms/frame ({1/t_single:6.1f} FPS all-{M})")
    print(f"MultiTracker      : {t_multi*1e3:7.1f} ms/frame ({1/t_multi:6.1f} FPS all-{M})")


if __name__ == "__main__":
    main()
