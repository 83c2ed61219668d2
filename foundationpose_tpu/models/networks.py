"""RefineNet and ScoreNetMultiPair as pure JAX functions (NHWC, bf16-ready).

Architecture parity with the reference (learning/models/refine_network.py:26-93,
learning/models/score_network.py:27-90): a shared conv trunk encodes the
rendered (A) and observed (B) crops, concatenated features pass a second
trunk, 400 spatial tokens get sinusoidal positions, then transformer heads
regress the pose delta (refiner) or cross-hypothesis-attended scores.

Channel widths scale with `base_width` (64 reproduces the reference:
64/128 trunk-A, 256/512 trunk-AB, 512-d tokens); smaller values give
cheap nets for tests and ablations.

Inputs are NHWC (B, 160, 160, c_in) with c_in=6 (RGB + centered XYZ map).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import layers as L


@dataclasses.dataclass(frozen=True)
class RefineNetCfg:
    c_in: int = 6
    use_bn: bool = True
    rot_rep: str = "axis_angle"  # or "6d"
    num_heads: int = 4
    base_width: int = 64

    @property
    def embed_dim(self) -> int:
        return self.base_width * 8

    @property
    def rot_dim(self) -> int:
        return 3 if self.rot_rep == "axis_angle" else 6


@dataclasses.dataclass(frozen=True)
class ScoreNetCfg:
    c_in: int = 6
    use_bn: bool = True
    num_heads: int = 4
    base_width: int = 64

    @property
    def embed_dim(self) -> int:
        return self.base_width * 8


def _init_encode_a(key, c_in, use_bn, w):
    ks = jax.random.split(key, 4)
    p = {
        "0": {"conv": L.init_conv(ks[0], 7, 7, c_in, w)},
        "1": {"conv": L.init_conv(ks[1], 3, 3, w, 2 * w)},
        "2": _init_res(ks[2], 2 * w),
        "3": _init_res(ks[3], 2 * w),
    }
    if use_bn:
        p["0"]["bn"] = L.init_bn(w)
        p["1"]["bn"] = L.init_bn(2 * w)
    return p


def _init_res(key, c):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": L.init_conv(k1, 3, 3, c, c),
        "conv2": L.init_conv(k2, 3, 3, c, c),
        "bn1": L.init_bn(c),
        "bn2": L.init_bn(c),
    }


def _init_encode_ab(key, use_bn, w):
    ks = jax.random.split(key, 5)
    p = {
        "0": _init_res(ks[0], 4 * w),
        "1": _init_res(ks[1], 4 * w),
        "2": {"conv": L.init_conv(ks[2], 3, 3, 4 * w, 8 * w)},
        "3": _init_res(ks[3], 8 * w),
        "4": _init_res(ks[4], 8 * w),
    }
    if use_bn:
        p["2"]["bn"] = L.init_bn(8 * w)
    return p


def _apply_encode_a(p, x, use_bn, dtype):
    x = L.conv_bn_relu(p["0"], x, stride=2, use_bn=use_bn, dtype=dtype)
    x = L.conv_bn_relu(p["1"], x, stride=2, use_bn=use_bn, dtype=dtype)
    x = L.resnet_basic_block(p["2"], x, use_bn=use_bn, dtype=dtype)
    x = L.resnet_basic_block(p["3"], x, use_bn=use_bn, dtype=dtype)
    return x


def _apply_encode_ab(p, x, use_bn, dtype):
    x = L.resnet_basic_block(p["0"], x, use_bn=use_bn, dtype=dtype)
    x = L.resnet_basic_block(p["1"], x, use_bn=use_bn, dtype=dtype)
    x = L.conv_bn_relu(p["2"], x, stride=2, use_bn=use_bn, dtype=dtype)
    x = L.resnet_basic_block(p["3"], x, use_bn=use_bn, dtype=dtype)
    x = L.resnet_basic_block(p["4"], x, use_bn=use_bn, dtype=dtype)
    return x


# -------------------------------------------------------------- RefineNet


def init_refine_net(key, cfg: RefineNetCfg):
    ks = jax.random.split(key, 6)
    d = cfg.embed_dim
    return {
        "encodeA": _init_encode_a(ks[0], cfg.c_in, cfg.use_bn, cfg.base_width),
        "encodeAB": _init_encode_ab(ks[1], cfg.use_bn, cfg.base_width),
        "trans_head": {
            "0": L.init_transformer_layer(ks[2], d, 512),
            "1": L.init_linear(ks[3], d, 3),
        },
        "rot_head": {
            "0": L.init_transformer_layer(ks[4], d, 512),
            "1": L.init_linear(ks[5], d, cfg.rot_dim),
        },
    }


def apply_refine_net(params, cfg: RefineNetCfg, A, B, dtype=jnp.bfloat16):
    """A, B: (N, 160, 160, c_in) -> {'trans': (N, 3), 'rot': (N, rot_dim)}.

    Mirrors refine_network.py:73-93: A and B share encodeA by stacking on
    the batch axis, features concat on channels, 20x20xD -> 400 tokens.
    """
    n = A.shape[0]
    x = jnp.concatenate([A, B], axis=0).astype(dtype)
    x = _apply_encode_a(params["encodeA"], x, cfg.use_bn, dtype)
    ab = jnp.concatenate([x[:n], x[n:]], axis=-1)
    ab = _apply_encode_ab(params["encodeAB"], ab, cfg.use_bn, dtype)
    tokens = ab.reshape(n, -1, cfg.embed_dim)  # (N, 400, D) row-major
    pe = L.positional_embedding(cfg.embed_dim, tokens.shape[1]).astype(dtype)
    tokens = tokens + pe

    t = L.transformer_encoder_layer(
        params["trans_head"]["0"], tokens, cfg.num_heads, dtype=dtype
    )
    trans = L.linear(params["trans_head"]["1"], t, dtype=dtype).mean(axis=1)
    r = L.transformer_encoder_layer(
        params["rot_head"]["0"], tokens, cfg.num_heads, dtype=dtype
    )
    rot = L.linear(params["rot_head"]["1"], r, dtype=dtype).mean(axis=1)
    return {"trans": trans.astype(jnp.float32), "rot": rot.astype(jnp.float32)}


# ------------------------------------------------------------- ScoreNet


def init_score_net(key, cfg: ScoreNetCfg):
    ks = jax.random.split(key, 5)
    d = cfg.embed_dim
    return {
        "encoderA": _init_encode_a(ks[0], cfg.c_in, cfg.use_bn, cfg.base_width),
        "encoderAB": _init_encode_ab(ks[1], cfg.use_bn, cfg.base_width),
        "att": L.init_mha(ks[2], d),
        "att_cross": L.init_mha(ks[3], d),
        "linear": L.init_linear(ks[4], d, 1),
    }


def apply_score_net(params, cfg: ScoreNetCfg, A, B, dtype=jnp.bfloat16):
    """A, B: (L, 160, 160, c_in) -> score logits (L,).

    Mirrors score_network.py:60-90 with batch size 1: per-pair features
    via self-attention + mean-pool, then cross-attention over the L
    hypotheses of the comparison group.
    """
    n = A.shape[0]
    x = jnp.concatenate([A, B], axis=0).astype(dtype)
    x = _apply_encode_a(params["encoderA"], x, cfg.use_bn, dtype)
    ab = jnp.concatenate([x[:n], x[n:]], axis=-1)
    ab = _apply_encode_ab(params["encoderAB"], ab, cfg.use_bn, dtype)
    tokens = ab.reshape(n, -1, cfg.embed_dim)
    pe = L.positional_embedding(cfg.embed_dim, tokens.shape[1]).astype(dtype)
    tokens = tokens + pe
    tokens = L.multihead_attention(params["att"], tokens, cfg.num_heads, dtype=dtype)
    feats = tokens.mean(axis=1)  # (L, D)
    group = feats[None]  # (1, L, D): one comparison group
    group = L.multihead_attention(params["att_cross"], group, cfg.num_heads, dtype=dtype)
    logits = L.linear(params["linear"], group, dtype=dtype)[0, :, 0]
    return logits.astype(jnp.float32)
