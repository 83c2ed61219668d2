"""Stage-level timing of the RefineNet forward at the register workload.

Times encodeA (stride-2 stem + res blocks), encodeAB, and the two
transformer heads separately (each jitted end-to-end from the crop
inputs, RTT-subtracted), to see which stage owns the ~56 ms and whether
a stem reparameterization (e.g. space-to-depth) could pay.

    python tools/profile_refine_layers.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from foundationpose_tpu.models import layers as L
    from foundationpose_tpu.models.networks import (
        RefineNetCfg, _apply_encode_a, _apply_encode_ab, init_refine_net,
        apply_refine_net,
    )

    cfg = RefineNetCfg()
    params = init_refine_net(jax.random.PRNGKey(0), cfg)
    N = 252
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((N, 160, 160, 6)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((N, 160, 160, 6)), jnp.float32)
    dt = jnp.bfloat16

    rtt = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros(()))
    print(f"RTT:                {rtt:6.1f} ms")

    full = jax.jit(lambda p, a, b: apply_refine_net(p, cfg, a, b, dtype=dt))
    print(f"full forward (252): {timeit(full, params, A, B) - rtt:6.1f} ms dev")

    enc_a = jax.jit(
        lambda p, a, b: _apply_encode_a(
            p["encodeA"], jnp.concatenate([a, b], 0).astype(dt), cfg.use_bn, dt
        )
    )
    print(f"encodeA (504):      {timeit(enc_a, params, A, B) - rtt:6.1f} ms dev")

    x504 = jax.block_until_ready(enc_a(params, A, B))
    ab = jnp.concatenate([x504[:N], x504[N:]], axis=-1)
    enc_ab = jax.jit(
        lambda p, x: _apply_encode_ab(p["encodeAB"], x, cfg.use_bn, dt)
    )
    print(f"encodeAB (252):     {timeit(enc_ab, params, ab) - rtt:6.1f} ms dev")

    feats = jax.block_until_ready(enc_ab(params, ab))
    tokens = feats.reshape(N, -1, cfg.embed_dim)
    pe = L.positional_embedding(cfg.embed_dim, tokens.shape[1]).astype(dt)
    tokens = tokens + pe

    def heads(p, t):
        tr = L.transformer_encoder_layer(p["trans_head"]["0"], t, cfg.num_heads, dtype=dt)
        trans = L.linear(p["trans_head"]["1"], tr, dtype=dt).mean(axis=1)
        r = L.transformer_encoder_layer(p["rot_head"]["0"], t, cfg.num_heads, dtype=dt)
        rot = L.linear(p["rot_head"]["1"], r, dtype=dt).mean(axis=1)
        return trans, rot

    heads_j = jax.jit(heads)
    print(f"two heads (252):    {timeit(heads_j, params, tokens) - rtt:6.1f} ms dev")

    # Stem alone: how much does the 7x7 s2 6->64 conv cost?
    stem = jax.jit(
        lambda p, a, b: L.conv_bn_relu(
            p["encodeA"]["0"],
            jnp.concatenate([a, b], 0).astype(dt),
            stride=2, use_bn=cfg.use_bn, dtype=dt,
        )
    )
    print(f"stem conv (504):    {timeit(stem, params, A, B) - rtt:6.1f} ms dev")


if __name__ == "__main__":
    main()
