"""Demo driver: register on frame 0, track the rest of an RGB-D video.

Equivalent of the reference's run_demo.py:15-78 for YCBInEOAT-format
scene directories (rgb/ depth/ masks/ cam_K.txt).

With no trained checkpoints the scorer falls back to the classical
depth-alignment mode; pass --refiner_ckpt/--scorer_ckpt to use converted
FoundationPose weights (.pth).
"""
from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def build_estimator(mesh, args):
    """Build a FoundationPose, ingesting each checkpoint's shipped
    reference config (embedded npz meta or sidecar config.yml) so the
    pipeline always runs under the settings the weights were trained
    for (predict_pose_refine.py:102-131, predict_score.py:126-143)."""
    import dataclasses

    from foundationpose_tpu.models.loading import load_estimator_checkpoint
    from foundationpose_tpu.pipeline import EstimatorCfg, FoundationPose

    cfg = EstimatorCfg()
    refiner_params = scorer_params = None
    if args.refiner_ckpt:
        refiner_params, rcfg, zfar = load_estimator_checkpoint(
            args.refiner_ckpt, "refiner", base=cfg.refiner
        )
        cfg = dataclasses.replace(cfg, refiner=rcfg)
        if zfar is not None:
            cfg = dataclasses.replace(cfg, zfar=zfar)
    if args.scorer_ckpt:
        scorer_params, scfg, _ = load_estimator_checkpoint(
            args.scorer_ckpt, "scorer", base=cfg.scorer
        )
        cfg = dataclasses.replace(cfg, scorer=scfg)
    if getattr(args, "fast_register", False):
        cfg = cfg.fast_register()

    return FoundationPose(
        mesh=mesh,
        cfg=cfg,
        refiner_params=refiner_params,
        scorer_params=scorer_params,
        debug=args.debug,
        debug_dir=args.debug_dir,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    code_dir = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    parser.add_argument("--mesh_file", type=str, required=True)
    parser.add_argument("--test_scene_dir", type=str, required=True)
    parser.add_argument("--est_refine_iter", type=int, default=5)
    parser.add_argument("--track_refine_iter", type=int, default=2)
    parser.add_argument("--fast_register", action="store_true",
                        help="funneled-register preset (prune@2, keep "
                        "64): ~1.6x registration throughput, ADD-S "
                        "CI-gated within 2 mm of the full register")
    parser.add_argument("--refiner_ckpt", type=str, default=None)
    parser.add_argument("--scorer_ckpt", type=str, default=None)
    parser.add_argument("--debug", type=int, default=1)
    parser.add_argument("--debug_dir", type=str, default=f"{code_dir}/debug")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="[%(funcName)s()] %(message)s")

    from foundationpose_tpu.datasets import YcbineoatReader
    from foundationpose_tpu.meshio import load_mesh
    from foundationpose_tpu.utils.vis import draw_posed_3d_box, draw_xyz_axis

    mesh = load_mesh(args.mesh_file)
    os.makedirs(f"{args.debug_dir}/ob_in_cam", exist_ok=True)
    os.makedirs(f"{args.debug_dir}/track_vis", exist_ok=True)

    est = build_estimator(mesh, args)
    reader = YcbineoatReader(video_dir=args.test_scene_dir, shorter_side=None, zfar=np.inf)
    bbox = mesh.bounds() - mesh.bounds().mean(axis=0, keepdims=True)

    def finish_frame(i, pose, color):
        np.savetxt(f"{args.debug_dir}/ob_in_cam/{reader.id_strs[i]}.txt", pose.reshape(4, 4))
        if args.debug >= 1:
            center_pose = pose @ np.linalg.inv(est.get_tf_to_centered_mesh())
            vis = draw_posed_3d_box(reader.K, img=color.copy(), ob_in_cam=center_pose, bbox=bbox)
            vis = draw_xyz_axis(
                vis, ob_in_cam=center_pose, scale=0.1, K=reader.K,
                thickness=3, transparency=0, is_input_rgb=True,
            )
            import imageio.v2 as imageio

            imageio.imwrite(f"{args.debug_dir}/track_vis/{reader.id_strs[i]}.png", vis)
        logging.info("frame %s done", reader.id_strs[i])

    # Tracking is pipelined: frame i+1..i+k dispatch before frame i's
    # pose is fetched (track_one_async), overlapping host<->device
    # latency with device compute. Poses are identical to blocking
    # track_one calls; only fetch timing changes.
    from collections import deque

    from foundationpose_tpu.pipeline import fetch_track_results

    pending: deque = deque()  # (frame_idx, TrackResult, color)
    for i in range(len(reader.color_files)):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        if i == 0:
            mask = reader.get_mask(0).astype(bool)
            pose = est.register(
                K=reader.K, rgb=color, depth=depth, ob_mask=mask,
                iteration=args.est_refine_iter,
            )
            finish_frame(0, pose, color)
        else:
            pending.append(
                (i, est.track_one_async(
                    rgb=color, depth=depth, K=reader.K,
                    iteration=args.track_refine_iter,
                ), color)
            )
            # Drain in batches of 4: one stacked device fetch per batch
            # (fetch_track_results) instead of one tunnel round trip per
            # pose, while staying 4-8 frames ahead of the device.
            if len(pending) >= 8:
                batch = [pending.popleft() for _ in range(4)]
                poses = fetch_track_results([f for _, f, _ in batch])
                for (j, _f, c), p in zip(batch, poses):
                    finish_frame(j, p, c)
    while pending:
        batch = [pending.popleft() for _ in range(min(4, len(pending)))]
        poses = fetch_track_results([f for _, f, _ in batch])
        for (j, _f, c), p in zip(batch, poses):
            finish_frame(j, p, c)


if __name__ == "__main__":
    main()
