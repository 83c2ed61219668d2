"""Per-segment device time + achieved TFLOP/s of the RefineNet forward
(encodeA / encodeAB / heads) at the register batch (252 pairs, bf16).

Measurement note: the axon tunnel has ~26 ms RTT and
`jax.block_until_ready` does not reliably block across it, so single-shot
wall timings are garbage. Every probe here runs K iterations inside ONE
jitted `lax.fori_loop` (with a data dependence between iterations so XLA
cannot elide them), fetches one scalar, and divides out K after
subtracting the trivial-fetch RTT. This is the only timing pattern that
has produced self-consistent numbers on this link.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit_loop(fn, *args, K=10, n=8):
    """Times K fori_loop iterations of `fn(*args) -> scalar` inside one jit
    (args passed as real arguments so the HLO stays small); returns
    per-iteration ms after RTT subtraction."""

    @jax.jit
    def run(*a):
        def body(i, carry):
            # true data dependence (×1e-30: not foldable, not hoistable)
            out = fn((a[0] + carry * 1e-30).astype(a[0].dtype), *a[1:])
            return out.astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    trivial = jax.jit(lambda: jnp.float32(1.0))
    np.asarray(trivial())
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(trivial())
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    np.asarray(run(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - rtt) * 1e3 / K


def flops_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        return float((c or {}).get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    from foundationpose_tpu.models.networks import (
        RefineNetCfg, init_refine_net, _apply_encode_a, _apply_encode_ab,
        apply_refine_net,
    )
    from foundationpose_tpu.models import layers as L

    cfg = RefineNetCfg()
    params = init_refine_net(jax.random.PRNGKey(0), cfg)
    N = 252
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(0, 1, (N, 160, 160, 6)), jnp.float32)
    B = jnp.asarray(rng.uniform(0, 1, (N, 160, 160, 6)), jnp.float32)

    def seg(name, fn, *args):
        # fn takes (x, params, ...) with params as a real jit argument so the
        # weights don't get baked into the HLO (remote_compile 413s on that).
        ms = timeit_loop(fn, *args)
        fl = flops_of(jax.jit(fn), *args)
        tfs = fl / (ms * 1e-3) / 1e12 if ms > 0 else float("nan")
        print(f"{name:24s} {ms:7.2f} ms/iter  ({fl/1e12:.2f} TFLOP, {tfs:5.0f} TFLOP/s)")
        return ms

    t_full = seg("full fwd", lambda a, p, b: sum(
        v.sum() for v in apply_refine_net(p, cfg, a, b).values()), A, params, B)

    t_encA = seg("encodeA (504x)", lambda a, p, b: _apply_encode_a(
        p["encodeA"], jnp.concatenate([a, b], 0).astype(jnp.bfloat16),
        cfg.use_bn, jnp.bfloat16).sum(), A, params, B)

    x = jnp.asarray(rng.uniform(0, 1, (N, 40, 40, 256)), jnp.bfloat16)
    t_encAB = seg("encodeAB (252x)", lambda v, p: _apply_encode_ab(
        p["encodeAB"], v, cfg.use_bn, jnp.bfloat16).sum(), x, params)

    tok = jnp.asarray(rng.uniform(0, 1, (N, 400, cfg.embed_dim)), jnp.bfloat16)

    def heads(tk, p):
        t1 = L.transformer_encoder_layer(
            p["trans_head"]["0"], tk, cfg.num_heads, dtype=jnp.bfloat16)
        r1 = L.transformer_encoder_layer(
            p["rot_head"]["0"], tk, cfg.num_heads, dtype=jnp.bfloat16)
        return t1.sum() + r1.sum()

    t_heads = seg("2 heads (252x)", heads, tok, params)
    print(f"sum of segments: {t_encA + t_encAB + t_heads:.2f} ms vs full {t_full:.2f} ms")


if __name__ == "__main__":
    main()
