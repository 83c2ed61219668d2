"""Fused multi-head self-attention core (Pallas TPU).

The transformer heads of RefineNet/ScoreNet run self-attention at
(B=252, L=400, D=512, H=4). In pure XLA that path materializes, per
layer, three head-split transposes of q/k/v, a 645 MB f32 logits tensor,
a multi-pass softmax over it, and a merge transpose — ~8 ms of HBM
traffic for 83 GFLOP of matmul (measured; the MXU work alone is
~0.5 ms). This kernel does the whole core per (batch, head) program in
VMEM: slice q/k/v straight out of the packed in-projection output
(no splits, no transposes), logits + softmax f32 on-chip, weights bf16
into the attnV matmul, and writes the head's lanes of the merged
(B, L, D) output directly. HBM traffic drops to reading qkv once and
writing the output once.

Semantics match torch nn.MultiheadAttention's core (batch_first), i.e.
the XLA path in models/layers.py — parity-tested against it in
tests/test_attention.py. Training still works: a custom VJP recomputes
the backward through the XLA reference core.

Reference context: refine_network.py:57 / score_network.py:60-90 run
these heads via torch; there is no reference kernel to port — this is
TPU-native engineering for the same math.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import jax_config  # noqa: F401

_LANE = 128
_SUBLANE = 16  # bf16 sublane tile


def _round_up(x, m):
    return (x + m - 1) // m * m


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, l_valid):
    q = q_ref[0]  # (Lp, dh) bf16
    k = k_ref[0]
    v = v_ref[0]
    # precision=DEFAULT explicitly: the package-wide
    # jax_default_matmul_precision=float32 (jax_config.py) maps to a
    # contract precision Mosaic rejects for bf16 operands.
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale  # (Lp, Lp) f32
    if l_valid < logits.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < l_valid, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    o_ref[0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def _attention_core_pallas(qkv, num_heads, interpret=False):
    """qkv (B, L, 3D) bf16 -> merged attention output (B, L, D) bf16."""
    B, L, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    scale = 1.0 / math.sqrt(dh)
    Lp = _round_up(L, _SUBLANE)
    x = qkv.astype(jnp.bfloat16)
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))

    def at(off):
        return pl.BlockSpec((1, Lp, dh), lambda b, h: (b, 0, off + h))

    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, l_valid=L),
        grid=(B, num_heads),
        in_specs=[at(0), at(num_heads), at(2 * num_heads)],
        out_specs=pl.BlockSpec((1, Lp, dh), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, Lp, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x, x, x)
    return out[:, :L, :] if Lp != L else out


def _attention_core_xla(qkv, num_heads):
    """Reference core: identical math via plain XLA (models/layers.py)."""
    B, L, threeD = qkv.shape
    D = threeD // 3
    dh = D // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, L, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum(
        "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum(
        "bhlm,bhmd->bhld", attn, v, preferred_element_type=jnp.float32
    )
    return out.transpose(0, 2, 1, 3).reshape(B, L, D).astype(qkv.dtype)


def _routes_to_pallas(dtype, D, num_heads) -> bool:
    """Dispatch predicate for the fused kernel. bf16 input only: the
    kernel computes its matmuls in bf16, so routing an f32 pipeline
    (compute_dtype="float32") through it would silently downcast."""
    return (
        jax.default_backend() == "tpu"
        and dtype == jnp.bfloat16
        and D % num_heads == 0
        and (D // num_heads) % _LANE == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def attention_core(qkv, num_heads):
    """Self-attention core on packed qkv (B, L, 3D) -> (B, L, D).

    TPU + bf16 input: fused Pallas kernel (no HBM logits). Elsewhere —
    including f32 inputs on TPU — the XLA reference (see
    _routes_to_pallas). Gradients always flow through the XLA math
    (recompute backward).
    """
    D = qkv.shape[-1] // 3
    if _routes_to_pallas(qkv.dtype, D, num_heads):
        return _attention_core_pallas(qkv, num_heads)
    return _attention_core_xla(qkv, num_heads)


def _attention_fwd(qkv, num_heads):
    return attention_core(qkv, num_heads), qkv


def _attention_bwd(num_heads, qkv, g):
    _, vjp = jax.vjp(lambda t: _attention_core_xla(t, num_heads), qkv)
    return vjp(g.astype(qkv.dtype))


attention_core.defvjp(_attention_fwd, _attention_bwd)
