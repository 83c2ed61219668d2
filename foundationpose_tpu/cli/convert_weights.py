"""One-shot conversion of the reference's torch checkpoints to npz.

The reference ships refiner/scorer weights as torch checkpoints
(learning/training/predict_pose_refine.py:97-102,
learning/training/predict_score.py:117-157). This converts them once to
the flat-npz param format `FoundationPose(..., refiner_path=...,
scorer_path=...)` / `load_params` consume — after which torch is no
longer needed at inference time.

    python -m foundationpose_tpu.cli.convert_weights \
        --refiner_ckpt weights/.../model_best.pth --out_dir weights_npz
"""
from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--refiner_ckpt", type=str, default=None)
    parser.add_argument("--scorer_ckpt", type=str, default=None)
    parser.add_argument("--out_dir", type=str, required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if not (args.refiner_ckpt or args.scorer_ckpt):
        parser.error("pass --refiner_ckpt and/or --scorer_ckpt")

    from foundationpose_tpu.models.convert import (
        convert_refine_net,
        convert_score_net,
        detect_use_bn,
        load_torch_state_dict,
    )
    from foundationpose_tpu.utils.checkpoint import save_params

    os.makedirs(args.out_dir, exist_ok=True)
    for ckpt, convert, name in (
        (args.refiner_ckpt, convert_refine_net, "refiner"),
        (args.scorer_ckpt, convert_score_net, "scorer"),
    ):
        if not ckpt:
            continue
        sd = load_torch_state_dict(ckpt)
        params = convert(sd, detect_use_bn(sd))
        out = os.path.join(args.out_dir, f"{name}.npz")
        save_params(out, params)
        logging.info("%s: %s -> %s", name, ckpt, out)


if __name__ == "__main__":
    main()
