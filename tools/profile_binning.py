"""Micro-benchmarks for the binning stage's primitive choices.

Per pose: F=5120 faces, T=25 tiles, K=256 slots. 252 poses.
Candidates: top_k (current), cumsum+scatter, sort, gather throughput.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=7, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


N, F, T, K, D = 252, 5120, 25, 256, 46
rng = np.random.default_rng(0)

# realistic sparse mask: ~300 faces per tile
mask = jnp.asarray(rng.uniform(size=(N, T, F)) < (300.0 / F))
rec = jnp.asarray(rng.standard_normal((N, F, D)), jnp.float32)
face_ids = jax.lax.broadcasted_iota(jnp.int32, (T, F), 1)

# --- current: top_k over (T, F)
@jax.jit
def via_topk(mask, rec):
    def per_pose(m, r):
        keys = jnp.where(m, F - face_ids, 0)
        top_keys, _ = jax.lax.top_k(keys, K)
        slot_face = F - top_keys
        rp = jnp.concatenate([r, jnp.zeros((1, D), r.dtype)], axis=0)
        return rp[slot_face]
    return jax.lax.map(lambda t: jax.vmap(per_pose)(*t),
                       (mask.reshape(-1, 14, T, F), rec.reshape(-1, 14, F, D))
                       ).sum()

print(f"top_k(K={K}) pack:            {timeit(via_topk, mask, rec):7.1f} ms")

# --- top_k cost alone (no gather)
@jax.jit
def topk_only(mask):
    def per_pose(m):
        keys = jnp.where(m, F - face_ids, 0)
        top_keys, _ = jax.lax.top_k(keys, K)
        return top_keys.sum()
    return jax.lax.map(lambda m: jax.vmap(per_pose)(m),
                       mask.reshape(-1, 14, T, F)).sum()

print(f"top_k alone:                  {timeit(topk_only, mask):7.1f} ms")

# --- cumsum alone over F axis
@jax.jit
def cumsum_only(mask):
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    return pos.sum()

print(f"cumsum over (N,T,F):          {timeit(cumsum_only, mask):7.1f} ms")

# --- cumsum + scatter rows (per pose: T*F candidate writes, masked)
@jax.jit
def via_scatter(mask, rec):
    def per_pose(m, r):  # m (T, F), r (F, D)
        pos = jnp.cumsum(m.astype(jnp.int32), axis=-1) - 1  # (T, F)
        tidx = jax.lax.broadcasted_iota(jnp.int32, (T, F), 0)
        flat = jnp.where(m & (pos < K), tidx * K + pos, T * K)  # (T, F)
        out = jnp.zeros((T * K + 1, D), r.dtype)
        # scatter all (T, F) rows (invalid -> trash row)
        src = jnp.broadcast_to(r[None], (T, F, D)).reshape(T * F, D)
        out = out.at[flat.reshape(-1)].set(src, mode="drop")
        return out
    return jax.lax.map(lambda t: jax.vmap(per_pose)(*t),
                       (mask.reshape(-1, 14, T, F), rec.reshape(-1, 14, F, D))
                       ).sum()

print(f"cumsum+scatter (TxF rows):    {timeit(via_scatter, mask, rec):7.1f} ms")

# --- scatter only 4 corner contributions per face (F*4 rows)
@jax.jit
def via_scatter4(mask, rec):
    # fake 4 candidate tiles per face (just to measure scatter F*4 rows)
    def per_pose(m, r):
        tiles = jnp.stack([
            jnp.arange(F) % T, (jnp.arange(F) + 1) % T,
            (jnp.arange(F) + 5) % T, (jnp.arange(F) + 6) % T], axis=1)  # (F,4)
        ok = m[tiles[:, 0], jnp.arange(F)][:, None]  # fake validity
        pos = jnp.cumsum(jnp.ones((F, 4), jnp.int32), axis=0) % K
        flat = jnp.where(ok, tiles * K + pos, T * K)
        out = jnp.zeros((T * K + 1, D), r.dtype)
        src = jnp.broadcast_to(r[:, None], (F, 4, D)).reshape(F * 4, D)
        out = out.at[flat.reshape(-1)].set(src, mode="drop")
        return out
    return jax.lax.map(lambda t: jax.vmap(per_pose)(*t),
                       (mask.reshape(-1, 14, T, F), rec.reshape(-1, 14, F, D))
                       ).sum()

print(f"cumsum+scatter (Fx4 rows):    {timeit(via_scatter4, mask, rec):7.1f} ms")

# --- gather throughput: T*K rows of D floats per pose
idx = jnp.asarray(rng.integers(0, F, (N, T * K)), jnp.int32)

@jax.jit
def gather_only(idx, rec):
    def per_pose(i, r):
        return r[i]
    return jax.lax.map(lambda t: jax.vmap(per_pose)(*t),
                       (idx.reshape(-1, 14, T * K), rec.reshape(-1, 14, F, D))
                       ).sum()

print(f"gather T*K rows of D:         {timeit(gather_only, idx, rec):7.1f} ms")

# --- sort of (T*F) keys per pose
@jax.jit
def sort_only(mask):
    def per_pose(m):
        keys = jnp.where(m, face_ids, jnp.int32(1 << 30)) + (
            jax.lax.broadcasted_iota(jnp.int32, (T, F), 0) << 16)
        return jnp.sort(keys.reshape(-1))[: T * K].sum()
    return jax.lax.map(lambda m: jax.vmap(per_pose)(m),
                       mask.reshape(-1, 14, T, F)).sum()

print(f"sort T*F keys:                {timeit(sort_only, mask):7.1f} ms")

# --- argsort along F per tile (descending mask) as top_k substitute
@jax.jit
def argsort_f(mask):
    def per_pose(m):
        keys = jnp.where(m, F - face_ids, 0)
        srt = jnp.sort(keys, axis=-1)
        return srt[:, -K:].sum()
    return jax.lax.map(lambda m: jax.vmap(per_pose)(m),
                       mask.reshape(-1, 14, T, F)).sum()

print(f"full sort along F per tile:   {timeit(argsort_f, mask):7.1f} ms")
