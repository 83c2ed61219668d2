"""Checkpoint loading that always pairs weights with their config.

The reference instantiates each predictor from a run directory holding
model_best.pth + config.yml and applies backward-compat defaults in code
(predict_pose_refine.py:93-141, predict_score.py:117-157). Here the
equivalent single entry point is :func:`load_estimator_checkpoint`: it
accepts either a converted .npz (cli.convert_weights embeds the resolved
reference config as metadata) or a raw torch .pth (the sidecar
config.yml is auto-discovered), and returns weights together with the
typed pipeline config they were trained for — so released checkpoints
with non-default configs (6d rotation, BatchNorm, other normalizers)
can never run under wrong settings.
"""
from __future__ import annotations

import dataclasses
import logging

logger = logging.getLogger(__name__)


def _has_bn(params: dict) -> bool:
    trunk = params.get("encodeA") or params.get("encoderA") or {}
    return "bn" in trunk.get("0", {})


def load_estimator_checkpoint(path: str, kind: str, base=None):
    """Load refiner/scorer weights from .npz (converted) or .pth (torch).

    Returns (params, cfg, zfar): `cfg` is a RefinerCfg/ScorerCfg derived
    from the checkpoint's reference config when available, else `base`
    (framework defaults) with use_bn detected from the weight structure.
    `zfar` is the checkpoint config's depth clamp, or None.
    """
    from ..pipeline.config import RefinerCfg, ScorerCfg
    from .reference_config import (
        find_sidecar_yaml,
        load_reference_yaml,
        refiner_cfg_from_reference,
        scorer_cfg_from_reference,
        zfar_from_reference,
    )

    assert kind in ("refiner", "scorer"), kind
    base = base or (RefinerCfg() if kind == "refiner" else ScorerCfg())
    from_ref = (
        refiner_cfg_from_reference if kind == "refiner" else scorer_cfg_from_reference
    )

    if path.endswith(".npz"):
        from ..utils.checkpoint import load_params_meta

        params, meta = load_params_meta(path)
        raw = (meta or {}).get("reference_config")
        if raw is not None:
            return params, from_ref(raw, base), zfar_from_reference(raw, kind)
        # Natively-trained checkpoints (FoundationPose.save_weights)
        # embed their live pipeline config the same way converted
        # reference checkpoints embed config.yml — weights never load
        # under the wrong net width / crop res / delta parameterization.
        pc = (meta or {}).get("pipeline_cfg")
        if pc is not None:
            return params, cfg_from_meta_dict(pc, base), None
        use_bn = (meta or {}).get("use_bn", _has_bn(params))
        logger.info(
            "%s %s: no embedded reference config; using framework defaults "
            "(use_bn=%s)", kind, path, use_bn,
        )
        return params, _fallback_cfg(base, kind, use_bn), None

    # raw torch checkpoint: convert in-memory, ingest the sidecar yaml
    from .convert import (
        convert_refine_net,
        convert_score_net,
        detect_use_bn,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(path)
    use_bn = detect_use_bn(sd)
    convert = convert_refine_net if kind == "refiner" else convert_score_net
    params = convert(sd, use_bn)
    ycfg = find_sidecar_yaml(path)
    if ycfg:
        raw = load_reference_yaml(ycfg)
        logger.info("%s: ingesting checkpoint config %s", kind, ycfg)
        return params, from_ref(raw, base), zfar_from_reference(raw, kind)
    logger.info(
        "%s %s: no sidecar config.yml; using framework defaults (use_bn=%s)",
        kind, path, use_bn,
    )
    return params, _fallback_cfg(base, kind, use_bn), None


def cfg_from_meta_dict(d: dict, base):
    """Rebuild a RefinerCfg/ScorerCfg from its dataclasses.asdict dict
    (JSON round-tripped: tuples arrive as lists — coerce back so the
    frozen config stays hashable for jit static args)."""
    d = dict(d)
    net_d = d.pop("net", None)
    raster_d = d.pop("raster", None)

    def coerce(cfg, upd):
        upd = {
            k: tuple(v) if isinstance(v, list) else v for k, v in upd.items()
        }
        known = {f.name for f in dataclasses.fields(cfg)}
        return dataclasses.replace(
            cfg, **{k: v for k, v in upd.items() if k in known}
        )

    out = coerce(base, d)
    if net_d is not None:
        out = dataclasses.replace(out, net=coerce(base.net, net_d))
    if raster_d is not None:
        out = dataclasses.replace(out, raster=coerce(base.raster, raster_d))
    return out


def _fallback_cfg(base, kind: str, use_bn: bool):
    cfg = dataclasses.replace(base, net=dataclasses.replace(base.net, use_bn=use_bn))
    if kind == "scorer":
        cfg = dataclasses.replace(cfg, mode="network")  # weights imply network
    return cfg
