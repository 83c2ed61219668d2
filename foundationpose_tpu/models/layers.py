"""Neural net building blocks as pure functions over param pytrees.

Semantics mirror the torch modules used by the reference networks
(learning/models/network_modules.py) so that released .pth checkpoints
convert losslessly (see convert.py), but the implementation is
TPU-idiomatic: NHWC layout, explicit bf16 compute with f32 accumulation
(the AMP equivalent of predict_pose_refine.py:190), f32 params.

Param schemas:
  conv:   {"kernel": (kh, kw, Cin, Cout), "bias": (Cout,)}
  linear: {"kernel": (Cin, Cout), "bias": (Cout,)}
  bn:     {"scale", "bias", "mean", "var"} each (C,)
  ln:     {"scale", "bias"} each (C,)
  mha:    {"in_proj": linear(D, 3D), "out_proj": linear(D, D)}
  transformer_layer: {"self_attn": mha, "linear1": linear(D, ff),
                      "linear2": linear(ff, D), "norm1": ln, "norm2": ln}
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401

BN_EPS = 1e-5
LN_EPS = 1e-5


# ----------------------------------------------------------------- init


def _fan_in_uniform(key, shape, fan_in):
    """torch kaiming_uniform(a=sqrt(5)) default for conv/linear weights."""
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_conv(key, kh, kw, cin, cout, bias=True):
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    p = {"kernel": _fan_in_uniform(k1, (kh, kw, cin, cout), fan_in)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def init_linear(key, cin, cout, bias=True):
    k1, k2 = jax.random.split(key)
    p = {"kernel": _fan_in_uniform(k1, (cin, cout), cin)}
    if bias:
        bound = 1.0 / math.sqrt(cin)
        p["bias"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def init_bn(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_ln(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init_mha(key, d):
    k1, k2 = jax.random.split(key)
    # torch MultiheadAttention: in_proj xavier_uniform, out_proj kaiming-ish.
    limit = math.sqrt(6.0 / (d + 3 * d))
    in_proj = {
        "kernel": jax.random.uniform(k1, (d, 3 * d), jnp.float32, -limit, limit),
        "bias": jnp.zeros((3 * d,), jnp.float32),
    }
    return {"in_proj": in_proj, "out_proj": init_linear(k2, d, d)}


def init_transformer_layer(key, d, ff):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(k1, d),
        "linear1": init_linear(k2, d, ff),
        "linear2": init_linear(k3, ff, d),
        "norm1": init_ln(d),
        "norm2": init_ln(d),
    }


# ---------------------------------------------------------------- apply


def conv2d(p, x, stride=1, dtype=jnp.float32):
    """NHWC conv with torch 'same-ish' padding p=(k-1)//2."""
    kh, kw = p["kernel"].shape[0], p["kernel"].shape[1]
    pad_h = (kh - 1) // 2
    pad_w = (kw - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def linear(p, x, dtype=jnp.float32):
    y = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def batchnorm(p, x):
    """Inference-mode BN over the channel (last) axis, f32."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return ((x32 - p["mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)


def layernorm(p, x):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def conv_bn_relu(p, x, stride, use_bn, dtype=jnp.float32):
    """ConvBNReLU (network_modules.py:37-50)."""
    y = conv2d(p["conv"], x, stride=stride, dtype=dtype)
    if use_bn:
        y = batchnorm(p["bn"], y)
    return jax.nn.relu(y)


def resnet_basic_block(p, x, use_bn, dtype=jnp.float32):
    """ResnetBasicBlock with bias=True, stride 1, no downsample
    (network_modules.py:73-111 as instantiated by the reference nets)."""
    out = conv2d(p["conv1"], x, stride=1, dtype=dtype)
    if use_bn:
        out = batchnorm(p["bn1"], out)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, stride=1, dtype=dtype)
    if use_bn:
        out = batchnorm(p["bn2"], out)
    return jax.nn.relu(out + x)


def positional_embedding(d_model: int, max_len: int) -> jnp.ndarray:
    """Sinusoidal table (1, max_len, d_model) (network_modules.py:115-137)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )[None]
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe[None]


def multihead_attention(p, x, num_heads, dtype=jnp.float32):
    """Self-attention, torch MultiheadAttention semantics (batch_first).

    The core (head split -> logits -> softmax -> attnV -> merge) runs as
    one fused Pallas kernel on TPU (ops/attention.py) — the XLA form
    spends ~8 ms/layer of HBM traffic on the materialized f32 logits and
    six layout copies at the RefineNet shape. Same math either way.
    """
    from ..ops.attention import attention_core

    qkv = linear(p["in_proj"], x, dtype=dtype)  # (B, L, 3D)
    out = attention_core(qkv.astype(dtype), num_heads).astype(dtype)
    return linear(p["out_proj"], out, dtype=dtype)


def transformer_encoder_layer(p, x, num_heads, dtype=jnp.float32):
    """torch nn.TransformerEncoderLayer defaults: post-norm, relu FF,
    dropout inactive at inference (refine_network.py:57)."""
    y = multihead_attention(p["self_attn"], x, num_heads, dtype=dtype)
    x = layernorm(p["norm1"], x + y)
    ff = linear(p["linear2"], jax.nn.relu(linear(p["linear1"], x, dtype=dtype)), dtype=dtype)
    return layernorm(p["norm2"], x + ff)
