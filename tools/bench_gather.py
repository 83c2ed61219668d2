"""Microbenchmark: XLA gather/scatter cost scaling on the TPU.

Questions this answers (drives the hashgrid encoder design):
1. Does row-gather cost scale with the number of gathered slices or
   with bytes (slice width / dtype)?
2. How much does a (2, C) window slice per fetch save vs two (1, C)
   fetches?
3. Does table size / locality matter?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    rng = np.random.default_rng(0)
    T = 36_000_000  # ~ hash table rows at parity config
    M = 16_777_216  # fetches per variant (16.7M)

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        tab2 = jnp.asarray(rng.standard_normal((T, 2)), dtype)
        idx = jnp.asarray(rng.integers(0, T - 4, M), jnp.int32)

        f_row = jax.jit(lambda t, i: t[i].sum())
        ms = timeit(f_row, tab2, idx)
        print(f"{name} rows (M,2):        {ms:7.1f} ms  "
              f"{M / ms * 1e3 / 1e6:6.0f} Mrows/s")

        # 2-row window per fetch: idx -> rows [i, i+2)
        def win2(t, i):
            return jax.lax.gather(
                t, i[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(),
                    start_index_map=(0,), operand_batching_dims=(),
                    start_indices_batching_dims=(),
                ),
                slice_sizes=(2, 2), mode="clip",
            ).sum()

        ms = timeit(jax.jit(win2), tab2, idx[: M // 2])
        print(f"{name} windows (M/2,2,2): {ms:7.1f} ms  "
              f"(fetches {M//2/1e6:.1f}M, same rows)")

        # 4-row window
        def win4(t, i):
            return jax.lax.gather(
                t, i[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(),
                    start_index_map=(0,), operand_batching_dims=(),
                    start_indices_batching_dims=(),
                ),
                slice_sizes=(4, 2), mode="clip",
            ).sum()

        ms = timeit(jax.jit(win4), tab2, idx[: M // 4])
        print(f"{name} windows (M/4,4,2): {ms:7.1f} ms  "
              f"(fetches {M//4/1e6:.1f}M, same rows)")

        del tab2

    # wider rows, same fetch count
    for W in (4, 8):
        tabw = jnp.asarray(rng.standard_normal((T // W * 2, W)), jnp.float32)
        idxw = jnp.asarray(rng.integers(0, T // W * 2, M), jnp.int32)
        f = jax.jit(lambda t, i: t[i].sum())
        ms = timeit(f, tabw, idxw)
        print(f"f32 rows (M,{W}):        {ms:7.1f} ms  "
              f"{M / ms * 1e3 / 1e6:6.0f} Mrows/s")
        del tabw

    # small table (fits cache?) vs big
    for Ts in (1 << 15, 1 << 19, 1 << 22):
        tab = jnp.asarray(rng.standard_normal((Ts, 2)), jnp.float32)
        idxs = jnp.asarray(rng.integers(0, Ts, M), jnp.int32)
        f = jax.jit(lambda t, i: t[i].sum())
        ms = timeit(f, tab, idxs)
        print(f"f32 table 2^{int(np.log2(Ts))} rows:    {ms:7.1f} ms  "
              f"{M / ms * 1e3 / 1e6:6.0f} Mrows/s")

    # sorted (spatially local) indices vs random
    tab = jnp.asarray(rng.standard_normal((T, 2)), jnp.float32)
    idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, T, M), jnp.int32))
    f = jax.jit(lambda t, i: t[i].sum())
    print(f"f32 rows sorted idx:    {timeit(f, tab, idx_sorted):7.1f} ms")


if __name__ == "__main__":
    main()
