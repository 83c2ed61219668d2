"""Fused Pallas attention core vs the XLA reference math.

The TPU kernel (ops/attention.py) is validated here in interpret mode on
the CPU mesh; the COMPILED kernel is additionally gated on chip by
bench.py::parity_gate (attn_max_abs in the BENCH JSON) at the RefineNet
head shape. The custom VJP must match differentiating the XLA core
directly (trainers differentiate through multihead_attention).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.ops.attention import (
    _attention_core_pallas,
    _attention_core_xla,
    attention_core,
)


@pytest.mark.parametrize(
    "B,L,D,H",
    [
        (3, 400, 512, 4),   # refine/score head shape (batch shrunk)
        (1, 252, 512, 4),   # scorer cross-attention (L padded to 256)
        (2, 16, 256, 2),    # tiny, exercises dh=128 with 2 heads
    ],
)
def test_pallas_core_matches_xla(B, L, D, H):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.uniform(-1, 1, (B, L, 3 * D)), jnp.bfloat16)
    ref = np.asarray(_attention_core_xla(qkv, H), np.float32)
    out = np.asarray(
        _attention_core_pallas(qkv, H, interpret=True), np.float32
    )
    assert np.abs(ref - out).max() <= 2e-3  # one bf16 ulp at |x|<=0.25


def test_padding_mask_ignores_padded_keys():
    # L=20 pads to 32 in the kernel; the masked columns must not leak
    # into the softmax (zero-padded keys would otherwise get weight).
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.uniform(-1, 1, (2, 20, 3 * 256)), jnp.bfloat16)
    ref = np.asarray(_attention_core_xla(qkv, 2), np.float32)
    out = np.asarray(
        _attention_core_pallas(qkv, 2, interpret=True), np.float32
    )
    assert np.abs(ref - out).max() <= 2e-3


def test_dispatch_falls_back_off_tpu():
    # On the CPU test mesh attention_core must route to the XLA core.
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.uniform(-1, 1, (2, 24, 3 * 256)), jnp.float32)
    out = np.asarray(attention_core(qkv, 2))
    ref = np.asarray(_attention_core_xla(qkv, 2))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dispatch_predicate_rejects_f32():
    # The kernel computes in bf16; an f32 pipeline (compute_dtype=
    # "float32") must fall back to the XLA core even on TPU — only the
    # dtype leg can be asserted backend-independently, so pin the whole
    # predicate table with the backend leg factored out.
    from unittest import mock

    from foundationpose_tpu.ops.attention import _routes_to_pallas

    with mock.patch("jax.default_backend", return_value="tpu"):
        assert _routes_to_pallas(jnp.bfloat16, 512, 4)
        assert not _routes_to_pallas(jnp.float32, 512, 4)  # dtype leg
        assert not _routes_to_pallas(jnp.bfloat16, 512, 3)  # D % H
        assert not _routes_to_pallas(jnp.bfloat16, 256, 4)  # dh % 128
    with mock.patch("jax.default_backend", return_value="cpu"):
        assert not _routes_to_pallas(jnp.bfloat16, 512, 4)


def test_custom_vjp_matches_xla_grad():
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.uniform(-1, 1, (2, 24, 3 * 256)), jnp.float32)

    def loss_fused(t):
        return (attention_core(t, 2) ** 2).sum()

    def loss_ref(t):
        return (_attention_core_xla(t, 2) ** 2).sum()

    g_fused = np.asarray(jax.grad(loss_fused)(qkv))
    g_ref = np.asarray(jax.grad(loss_ref)(qkv))
    np.testing.assert_allclose(g_fused, g_ref, rtol=1e-5, atol=1e-6)
