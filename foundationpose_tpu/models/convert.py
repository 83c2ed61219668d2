"""Torch checkpoint -> JAX param-tree conversion for the reference nets.

The released FoundationPose weights (weights/<run>/model_best.pth,
loaded at predict_pose_refine.py:138-141 / predict_score.py:151-154) are
torch state_dicts; this module maps them onto the param schema of
networks.py. Layout changes:
  conv weight (O, I, kh, kw) -> (kh, kw, I, O)
  linear weight (O, I)       -> (I, O)
  MHA in_proj_weight (3D, D) -> (D, 3D)
"""
from __future__ import annotations

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin_w(w):
    return np.transpose(np.asarray(w), (1, 0))


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth checkpoint to a {name: np.ndarray} dict (CPU torch).

    Tolerates the wrappers seen in the wild: a {'model': ...} or
    {'state_dict': ...} envelope (predict_pose_refine.py:139-140) and
    DataParallel/DistributedDataParallel 'module.' key prefixes."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("model", "state_dict"):
        if wrapper in ckpt and isinstance(ckpt[wrapper], dict):
            ckpt = ckpt[wrapper]
            break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if not hasattr(v, "detach"):  # skip non-tensor metadata entries
            continue
        out[k] = v.detach().cpu().numpy()
    return out


def _convert_conv_bn(sd, prefix, use_bn):
    """ConvBNReLU: torch Sequential 'net.0' conv (+ 'net.1' bn)."""
    p = {
        "conv": {
            "kernel": _conv_w(sd[f"{prefix}.net.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.net.0.bias"]),
        }
    }
    if use_bn:
        p["bn"] = {
            "scale": np.asarray(sd[f"{prefix}.net.1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.net.1.bias"]),
            "mean": np.asarray(sd[f"{prefix}.net.1.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.net.1.running_var"]),
        }
    return p


def _convert_res(sd, prefix, use_bn):
    p = {
        "conv1": {
            "kernel": _conv_w(sd[f"{prefix}.conv1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.conv1.bias"]),
        },
        "conv2": {
            "kernel": _conv_w(sd[f"{prefix}.conv2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.conv2.bias"]),
        },
    }
    if use_bn:
        for bn in ("bn1", "bn2"):
            p[bn] = {
                "scale": np.asarray(sd[f"{prefix}.{bn}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.{bn}.bias"]),
                "mean": np.asarray(sd[f"{prefix}.{bn}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.{bn}.running_var"]),
            }
    else:
        # inference without BN still needs identity stats if keys absent
        pass
    return p


def _convert_trunk_a(sd, name, use_bn):
    return {
        "0": _convert_conv_bn(sd, f"{name}.0", use_bn),
        "1": _convert_conv_bn(sd, f"{name}.1", use_bn),
        "2": _convert_res(sd, f"{name}.2", use_bn),
        "3": _convert_res(sd, f"{name}.3", use_bn),
    }


def _convert_trunk_ab(sd, name, use_bn):
    return {
        "0": _convert_res(sd, f"{name}.0", use_bn),
        "1": _convert_res(sd, f"{name}.1", use_bn),
        "2": _convert_conv_bn(sd, f"{name}.2", use_bn),
        "3": _convert_res(sd, f"{name}.3", use_bn),
        "4": _convert_res(sd, f"{name}.4", use_bn),
    }


def _convert_mha(sd, prefix):
    return {
        "in_proj": {
            "kernel": _lin_w(sd[f"{prefix}.in_proj_weight"]),
            "bias": np.asarray(sd[f"{prefix}.in_proj_bias"]),
        },
        "out_proj": {
            "kernel": _lin_w(sd[f"{prefix}.out_proj.weight"]),
            "bias": np.asarray(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def _convert_transformer_layer(sd, prefix):
    return {
        "self_attn": _convert_mha(sd, f"{prefix}.self_attn"),
        "linear1": {
            "kernel": _lin_w(sd[f"{prefix}.linear1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.linear1.bias"]),
        },
        "linear2": {
            "kernel": _lin_w(sd[f"{prefix}.linear2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.linear2.bias"]),
        },
        "norm1": {
            "scale": np.asarray(sd[f"{prefix}.norm1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm1.bias"]),
        },
        "norm2": {
            "scale": np.asarray(sd[f"{prefix}.norm2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm2.bias"]),
        },
    }


def convert_refine_net(sd: dict, use_bn: bool) -> dict:
    """state_dict of the reference RefineNet -> networks.init_refine_net tree."""
    return {
        "encodeA": _convert_trunk_a(sd, "encodeA", use_bn),
        "encodeAB": _convert_trunk_ab(sd, "encodeAB", use_bn),
        "trans_head": {
            "0": _convert_transformer_layer(sd, "trans_head.0"),
            "1": {
                "kernel": _lin_w(sd["trans_head.1.weight"]),
                "bias": np.asarray(sd["trans_head.1.bias"]),
            },
        },
        "rot_head": {
            "0": _convert_transformer_layer(sd, "rot_head.0"),
            "1": {
                "kernel": _lin_w(sd["rot_head.1.weight"]),
                "bias": np.asarray(sd["rot_head.1.bias"]),
            },
        },
    }


def convert_score_net(sd: dict, use_bn: bool) -> dict:
    """state_dict of the reference ScoreNetMultiPair -> param tree."""
    return {
        "encoderA": _convert_trunk_a(sd, "encoderA", use_bn),
        "encoderAB": _convert_trunk_ab(sd, "encoderAB", use_bn),
        "att": _convert_mha(sd, "att"),
        "att_cross": _convert_mha(sd, "att_cross"),
        "linear": {
            "kernel": _lin_w(sd["linear.weight"]),
            "bias": np.asarray(sd["linear.bias"]),
        },
    }


def detect_use_bn(sd: dict) -> bool:
    return any("running_mean" in k for k in sd)
