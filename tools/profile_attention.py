"""Micro-profile of the transformer head at the register shape
(B=252, L=400, D=512, H=4): which op eats the time."""
import os
import sys
import time
import math

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


B, L, D, H = 252, 400, 512, 4
dh = D // H
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-1, 1, (B, L, D)), jnp.bfloat16)
Wqkv = jnp.asarray(rng.uniform(-0.05, 0.05, (D, 3 * D)), jnp.bfloat16)
q4 = jnp.asarray(rng.uniform(-1, 1, (B, H, L, dh)), jnp.bfloat16)
k4 = jnp.asarray(rng.uniform(-1, 1, (B, H, L, dh)), jnp.bfloat16)
v4 = jnp.asarray(rng.uniform(-1, 1, (B, H, L, dh)), jnp.bfloat16)
att = jnp.asarray(rng.uniform(0, 1, (B, H, L, L)), jnp.bfloat16)

probes = {
    "qkv proj (B,L,D)x(D,3D)": jax.jit(
        lambda a: jnp.dot(a, Wqkv, preferred_element_type=jnp.float32).sum()
    ),
    "logits bhld,bhmd->bhlm": jax.jit(
        lambda a, b: jnp.einsum(
            "bhld,bhmd->bhlm", a, b, preferred_element_type=jnp.float32
        ).sum()
    ),
    "softmax f32 on logits": jax.jit(
        lambda a: jax.nn.softmax(a.astype(jnp.float32), axis=-1).sum()
    ),
    "attnV bhlm,bhmd->bhld": jax.jit(
        lambda a, b: jnp.einsum(
            "bhlm,bhmd->bhld", a, b, preferred_element_type=jnp.float32
        ).sum()
    ),
    "merge transpose+reshape": jax.jit(
        lambda a: a.transpose(0, 2, 1, 3).reshape(B, L, D).sum()
    ),
    "split heads (B,L,D)->(B,H,L,dh)": jax.jit(
        lambda a: a.reshape(B, L, H, dh).transpose(0, 2, 1, 3).sum()
    ),
}
args = {
    "qkv proj (B,L,D)x(D,3D)": (x,),
    "logits bhld,bhmd->bhlm": (q4, k4),
    "softmax f32 on logits": (att,),
    "attnV bhlm,bhmd->bhld": (att, v4),
    "merge transpose+reshape": (q4,),
    "split heads (B,L,D)->(B,H,L,dh)": (x,),
}
for name, f in probes.items():
    print(f"{name:36s} {timeit(f, *args[name]):7.2f} ms")

# fused attention alternative: one batched matmul over (B*H) with
# jax.lax.dot_general batch dims, logits kept bf16 until softmax
def fused(a, b, c):
    lg = jax.lax.dot_general(
        a, b, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32) / math.sqrt(dh)
    w = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        w, c, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32).sum()

print(f"{'full attn core (dot_general)':36s} {timeit(jax.jit(fused), q4, k4, v4):7.2f} ms")
