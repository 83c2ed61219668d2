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
    parser.add_argument(
        "--refiner_config", type=str, default=None,
        help="checkpoint config.yml (default: auto-discover next to the .pth)",
    )
    parser.add_argument("--scorer_config", type=str, default=None)
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
    from foundationpose_tpu.models.reference_config import (
        apply_reference_defaults,
        find_sidecar_yaml,
        load_reference_yaml,
        refiner_cfg_from_reference,
        scorer_cfg_from_reference,
    )
    from foundationpose_tpu.utils.checkpoint import save_params

    os.makedirs(args.out_dir, exist_ok=True)
    for ckpt, cfg_path, convert, name in (
        (args.refiner_ckpt, args.refiner_config, convert_refine_net, "refiner"),
        (args.scorer_ckpt, args.scorer_config, convert_score_net, "scorer"),
    ):
        if not ckpt:
            continue
        cfg_path = cfg_path or find_sidecar_yaml(ckpt)
        sd = load_torch_state_dict(ckpt)
        use_bn = detect_use_bn(sd)
        meta: dict = {"kind": name, "use_bn": use_bn}
        if cfg_path:
            raw_cfg = load_reference_yaml(cfg_path)
            logging.info("%s: ingesting checkpoint config %s", name, cfg_path)
            # validate + derive the typed config NOW so a bad/unsupported
            # config fails at conversion, not at first inference
            if name == "refiner":
                typed = refiner_cfg_from_reference(raw_cfg)
            else:
                typed = scorer_cfg_from_reference(raw_cfg)
            resolved = apply_reference_defaults(raw_cfg, name)
            if bool(resolved.get("use_BN")) != use_bn:
                raise SystemExit(
                    f"{name}: config says use_BN={resolved.get('use_BN')} but "
                    f"the checkpoint {'has' if use_bn else 'lacks'} BatchNorm "
                    "statistics"
                )
            # embed the RESOLVED reference config (defaults applied) so
            # loaders reconstruct the exact pipeline config, no guessing
            meta["reference_config"] = _jsonable(resolved)
            logging.info("%s cfg: %s", name, typed)
        else:
            logging.warning(
                "%s: no config.yml found next to %s — loaders will use "
                "framework defaults with use_bn detected from the weights; "
                "pass --%s_config if the checkpoint shipped one",
                name, ckpt, name,
            )
        params = convert(sd, use_bn)
        out = os.path.join(args.out_dir, f"{name}.npz")
        save_params(out, params, meta=meta)
        logging.info("%s: %s -> %s", name, ckpt, out)


def _jsonable(d: dict):
    import math

    out = {}
    for k, v in d.items():
        if isinstance(v, float) and math.isinf(v):
            v = "Infinity"  # JSON-safe; re-parsed by apply_reference_defaults
        out[k] = v
    return out


if __name__ == "__main__":
    main()
