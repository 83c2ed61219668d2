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


def timeit(fn, tab, idxs, n=5):
    """idxs: list of DIFFERENT index arrays — identical repeated
    dispatches can be short-circuited by the runtime and time as 0."""
    out = fn(tab, idxs[-1])
    jax.block_until_ready(out)
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        out = fn(tab, idxs[k % len(idxs)])
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def make_idxs(rng, lo, hi, m, n=5):
    return [jnp.asarray(rng.integers(lo, hi, m), jnp.int32) for _ in range(n)]


def main():
    rng = np.random.default_rng(0)
    T = 36_000_000  # ~ hash table rows at parity config
    M = 16_777_216  # fetches per variant (16.7M)

    def win(slice_rows):
        def f(t, i):
            return jax.lax.gather(
                t, i[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(),
                    start_index_map=(0,), operand_batching_dims=(),
                    start_indices_batching_dims=(),
                ),
                slice_sizes=(slice_rows, 2), mode="clip",
            ).sum()
        return jax.jit(f)

    f_row = jax.jit(lambda t, i: t[i].sum())

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        tab2 = jnp.asarray(rng.standard_normal((T, 2)), dtype)
        idxs = make_idxs(rng, 0, T - 4, M)
        ms = timeit(f_row, tab2, idxs)
        print(f"{name} rows (M,2):        {ms:7.1f} ms  "
              f"{M / ms * 1e3 / 1e6:6.0f} Mrows/s")
        ms = timeit(win(2), tab2, [i[: M // 2] for i in idxs])
        print(f"{name} windows (M/2,2,2): {ms:7.1f} ms  "
              f"(fetches {M//2/1e6:.1f}M, same rows)")
        ms = timeit(win(4), tab2, [i[: M // 4] for i in idxs])
        print(f"{name} windows (M/4,4,2): {ms:7.1f} ms  "
              f"(fetches {M//4/1e6:.1f}M, same rows)")
        del tab2

    for W in (4, 8):
        tabw = jnp.asarray(rng.standard_normal((T // W * 2, W)), jnp.float32)
        idxw = make_idxs(rng, 0, T // W * 2, M)
        ms = timeit(f_row, tabw, idxw)
        print(f"f32 rows (M,{W}):        {ms:7.1f} ms  "
              f"{M / ms * 1e3 / 1e6:6.0f} Mrows/s")
        del tabw

    for Ts in (1 << 15, 1 << 19, 1 << 22):
        tab = jnp.asarray(rng.standard_normal((Ts, 2)), jnp.float32)
        idxs2 = make_idxs(rng, 0, Ts, M)
        ms = timeit(f_row, tab, idxs2)
        print(f"f32 table 2^{int(np.log2(Ts))} rows:    {ms:7.1f} ms  "
              f"{M / ms * 1e3 / 1e6:6.0f} Mrows/s")
        del tab

    tab = jnp.asarray(rng.standard_normal((T, 2)), jnp.float32)
    idx_sorted = [jnp.sort(i) for i in make_idxs(rng, 0, T, M)]
    print(f"f32 rows sorted idx:    {timeit(f_row, tab, idx_sorted):7.1f} ms")


if __name__ == "__main__":
    main()
