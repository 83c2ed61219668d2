"""End-to-end walkthrough on a fully synthetic scene — no datasets or
checkpoints required.

Demonstrates the whole surface in one runnable script:

1. Build two synthetic objects (a textured bumpy sphere + a colored box).
2. Render a composite RGB-D sequence where both objects move.
3. `FoundationPose.register` each object on frame 0.
4. Track BOTH objects with one fused dispatch per frame (`MultiTracker`).
5. Report per-frame ADD error against the synthetic ground truth.
6. Optionally (--reconstruct) train a neural object field from the
   sphere's rendered views and report the recovered mesh bounds.

Without checkpoints the scorer runs in classical depth-alignment mode
and refinement uses zeroed heads (identity): registration still
recovers pose up to the rotation grid + the documented median-depth z
bias, which is what the integration tests pin. Pass --refiner_ckpt /
--scorer_ckpt (converted npz or raw .pth) for the full network path.

    python examples/synthetic_end_to_end.py [--frames 8] [--reconstruct]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_objects():
    import jax.numpy as jnp  # noqa: F401  (ensures jax_config applied)

    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh, make_box

    rng = np.random.default_rng(0)
    verts, faces = icosphere(3, radius=0.06)
    verts = verts * (1.0 + 0.2 * np.sin(6 * verts[:, 2:3]))
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
         nrm[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(128, 128, 3)).astype(np.uint8)
    sphere = TriMesh(
        vertices=verts.astype(np.float64), faces=faces.astype(np.int64),
        uv=uv, texture=tex,
    )
    box = make_box(np.array([0.1, 0.12, 0.16]))
    box.vertex_colors = rng.integers(40, 255, size=(8, 3)).astype(np.uint8)
    return [sphere, box]


def gt_trajectory(n_frames):
    """Ground-truth poses per frame: slow drift + rotation."""
    from foundationpose_tpu.geometry import so3_exp_map
    import jax.numpy as jnp

    base = []
    p0 = np.eye(4)
    p0[:3, 3] = [-0.09, 0.0, 0.8]
    p1 = np.eye(4)
    p1[:3, 3] = [0.09, -0.02, 0.9]
    base = [p0, p1]
    frames = []
    for t in range(n_frames):
        cur = []
        for m, b in enumerate(base):
            p = b.copy()
            w = np.array([0.0, 0.02 * t * (1 + m), 0.015 * t])
            p[:3, :3] = np.asarray(so3_exp_map(jnp.asarray(w[None])))[0] @ b[:3, :3]
            p[:3, 3] = b[:3, 3] + t * np.array([0.004, 0.002 * (-1) ** m, 0.0])
            cur.append(p)
        frames.append(np.stack(cur))
    return frames


def render_frame(meshes, poses, K, H, W):
    import jax.numpy as jnp

    from foundationpose_tpu.ops import render_mesh

    rgb = np.zeros((H, W, 3), np.uint8)
    depth = np.full((H, W), np.inf, np.float32)
    masks = []
    for mesh, pose in zip(meshes, poses):
        kw = {}
        if mesh.has_texture:
            uvf = np.stack([mesh.uv[:, 0], 1.0 - mesh.uv[:, 1]], axis=-1)
            kw = dict(uv=jnp.asarray(uvf),
                      tex=jnp.asarray(mesh.texture.astype(np.float32) / 255.0))
        else:
            kw = dict(vertex_color=jnp.asarray(
                mesh.vertex_colors.astype(np.float32) / 255.0))
        out = render_mesh(
            jnp.asarray(mesh.vertices.astype(np.float32)),
            jnp.asarray(mesh.faces.astype(np.int32)),
            jnp.asarray(pose[None].astype(np.float32)),
            jnp.asarray(K), out_hw=(H, W),
            vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
            use_light=True, **kw,
        )
        d = np.where(np.asarray(out.depth[0]) > 0, np.asarray(out.depth[0]), np.inf)
        closer = d < depth
        depth = np.where(closer, d, depth)
        rgb = np.where(closer[..., None],
                       (np.asarray(out.color[0]) * 255).astype(np.uint8), rgb)
        masks.append(np.asarray(out.mask[0]) & closer)
    return rgb, np.where(np.isinf(depth), 0.0, depth).astype(np.float32), masks


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--reconstruct", action="store_true")
    parser.add_argument("--refiner_ckpt", type=str, default=None)
    parser.add_argument("--scorer_ckpt", type=str, default=None)
    parser.add_argument("--base_width", type=int, default=16,
                        help="net width when no checkpoints are given "
                        "(64 = reference size)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from foundationpose_tpu import FoundationPose, MultiTracker
    from foundationpose_tpu.models.networks import (
        RefineNetCfg, ScoreNetCfg, init_refine_net,
    )
    from foundationpose_tpu.pipeline import EstimatorCfg, RefinerCfg, ScorerCfg
    from foundationpose_tpu.utils.metrics import adds_err

    H, W = 240, 320
    K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]], np.float32)
    meshes = make_objects()
    traj = gt_trajectory(args.frames)

    if args.refiner_ckpt or args.scorer_ckpt:
        cfg = EstimatorCfg()
        refiner_params = None  # loaded via load_weights below
    else:
        w = args.base_width
        cfg = EstimatorCfg(
            refiner=RefinerCfg(net=RefineNetCfg(base_width=w),
                               compute_dtype="float32"),
            scorer=ScorerCfg(net=ScoreNetCfg(base_width=w), mode="depth"),
            # a coarse rotation grid keeps the demo CPU-friendly; raise
            # toward the defaults (40 views / 60 deg) on a TPU
            min_n_views=4,
            inplane_step_deg=90.0,
        )
        # Zeroed heads: identity refinement (no trained weights); the
        # depth scorer still ranks the rotation grid correctly.
        refiner_params = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
        for head in ("trans_head", "rot_head"):
            refiner_params[head]["1"]["kernel"] = jnp.zeros_like(
                refiner_params[head]["1"]["kernel"])
            refiner_params[head]["1"]["bias"] = jnp.zeros_like(
                refiner_params[head]["1"]["bias"])

    print("== frame 0: register each object")
    rgb0, depth0, masks0 = render_frame(meshes, traj[0], K, H, W)
    ests = []
    for m, mesh in enumerate(meshes):
        est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=refiner_params)
        if args.refiner_ckpt or args.scorer_ckpt:
            est.load_weights(args.refiner_ckpt, args.scorer_ckpt)
        pose = est.register(K, rgb0, depth0, masks0[m], iteration=5)
        err = adds_err(pose, traj[0][m], meshes[m].vertices)
        print(f"  object {m}: ADD-S vs gt = {err*1e3:.1f} mm")
        ests.append(est)

    print(f"== frames 1..{args.frames - 1}: MultiTracker (one dispatch/frame)")
    tracker = MultiTracker.from_estimators(ests)
    for t in range(1, args.frames):
        rgb, depth, _ = render_frame(meshes, traj[t], K, H, W)
        poses = tracker.track(rgb, depth, K, iteration=2)
        errs = [adds_err(poses[m], traj[t][m], meshes[m].vertices)
                for m in range(len(meshes))]
        print("  frame %2d: ADD-S = %s mm"
              % (t, ", ".join(f"{e*1e3:.1f}" for e in errs)))

    if args.reconstruct:
        print("== neural object field: reconstruct the sphere from views")
        from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
        from foundationpose_tpu.nerf import NerfCfg, run_neural_object_field

        views = sample_views_icosphere(n_views=4)
        cam_in_obs = views.copy()
        cam_in_obs[:, :3, 3] *= 0.5
        ob_in_cams = np.linalg.inv(cam_in_obs)
        rgbs, depths, masks = [], [], []
        for p in ob_in_cams:
            r, d, ms = render_frame(meshes[:1], p[None], K, H, W)
            rgbs.append(r)
            depths.append(d)
            masks.append(ms[0])
        nerf_cfg = NerfCfg(n_step=400, n_rand=512, n_samples=32,
                           n_samples_around_depth=32, log2_hashmap_size=16,
                           finest_res=128)
        rec_mesh, _ = run_neural_object_field(
            nerf_cfg, K, np.stack(rgbs), np.stack(depths), np.stack(masks),
            cam_in_obs,
        )
        lo, hi = rec_mesh.bounds()
        print(f"  recovered mesh: {len(rec_mesh.vertices)} verts, "
              f"extent {np.round(hi - lo, 3)} m "
              f"(gt sphere extent ~{np.round(np.ptp(meshes[0].vertices, axis=0), 3)})")

    print("done.")


if __name__ == "__main__":
    main()
