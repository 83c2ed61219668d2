"""Model-free reconstruction CLI (reference: bundlesdf/run_nerf.py:49-115).

Reads a reference-view directory (rgb/*.png, depth_enhanced|depth/*.png,
masks/*.png, cam_in_ob/*.txt, K.txt), trains the neural object field,
and writes model/model.obj in real-world units.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os

import numpy as np


def load_ref_views(base_dir):
    import cv2
    import imageio.v2 as imageio

    color_files = sorted(glob.glob(f"{base_dir}/rgb/*.png"))
    K = np.loadtxt(f"{base_dir}/K.txt").reshape(3, 3)
    rgbs, depths, masks, cam_in_obs = [], [], [], []
    for f in color_files:
        rgbs.append(imageio.imread(f)[..., :3])
        depth_file = f.replace("rgb", "depth_enhanced")
        if not os.path.exists(depth_file):
            depth_file = f.replace("rgb", "depth")
        depths.append(cv2.imread(depth_file, -1) / 1e3)
        masks.append((cv2.imread(f.replace("rgb", "masks"), -1) > 0).astype(np.uint8))
        pose_file = f.replace("rgb", "cam_in_ob").replace(".png", ".txt")
        cam_in_obs.append(np.loadtxt(pose_file).reshape(4, 4))
    return (
        np.asarray(rgbs),
        np.asarray(depths),
        np.asarray(masks),
        np.asarray(cam_in_obs),
        K,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref_view_dir", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="ycbv", choices=["ycbv", "linemod"])
    parser.add_argument("--n_step", type=int, default=None)
    parser.add_argument("--preset", type=str, default="parity",
                        choices=["parity", "fast"],
                        help="'fast' quarters per-step points (TPU_FAST_OVERRIDES)")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--artifact_dir", type=str, default=None,
                        help="periodic eval image/mesh dumps during training")
    parser.add_argument("--i_img", type=int, default=500)
    parser.add_argument("--i_mesh", type=int, default=500)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="[%(funcName)s()] %(message)s")

    import dataclasses

    from foundationpose_tpu.nerf import (
        LINEMOD_OVERRIDES,
        NerfCfg,
        run_neural_object_field,
    )
    from foundationpose_tpu.nerf.config import TPU_FAST_OVERRIDES

    cfg = NerfCfg()
    if args.dataset == "linemod":
        cfg = dataclasses.replace(cfg, **LINEMOD_OVERRIDES)
    if args.preset == "fast":
        cfg = dataclasses.replace(cfg, **TPU_FAST_OVERRIDES)
    if args.n_step is not None:
        cfg = dataclasses.replace(cfg, n_step=args.n_step)

    ob_dirs = sorted(glob.glob(f"{args.ref_view_dir}/ob_*"))
    if not ob_dirs:
        ob_dirs = [args.ref_view_dir]
    for ob_dir in ob_dirs:
        rgbs, depths, masks, cam_in_obs, K = load_ref_views(ob_dir)
        mesh, _runner = run_neural_object_field(
            cfg, K, rgbs, depths, masks, cam_in_obs,
            artifact_dir=args.artifact_dir, i_img=args.i_img, i_mesh=args.i_mesh,
        )
        out_dir = args.out_dir or f"{ob_dir}/model"
        os.makedirs(out_dir, exist_ok=True)
        mesh.export(f"{out_dir}/model.obj")
        logging.info("mesh -> %s/model.obj (%d verts)", out_dir, len(mesh.vertices))


if __name__ == "__main__":
    main()
