"""Pallas TPU kernel: sorted segment-add into a dense table.

XLA's scatter-add on TPU serializes (~80 ns/update: 1.4 s for the 16.7M
hash-grid gradient updates of ONE NeRF step at 512 rays, OOM at the full
2048-ray config). This kernel rebuilds the dense gradient with
VMEM-resident one-hot accumulation instead:

1. XLA sorts the (index, update) stream by index (bitonic sort is
   vector-friendly: ~80 ms for 16.7M keys) and computes each table
   block's contribution range with a tiny searchsorted on the block
   boundaries.
2. The kernel walks table blocks; per block it streams the 128-aligned
   rows overlapping its contribution range (async DMA off scalar-
   prefetched bounds), builds a (block, 128) one-hot, and reduces
   updates into the block accumulator. Duplicate indices simply add;
   rows straddling block boundaries are masked per block, never
   double-counted.

All HBM layouts keep a 128-lane minor dimension (idx as (M/128, 128),
updates as channel planes (C, M/128, 128), output as (C, blocks, block))
— anything minor-dim-1 would be tile-padded 128x by Mosaic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import jax_config  # noqa: F401

_LANE = 128  # hardware lane width; storage rows are row_width entries


def _seg_add_kernel(
    lo_ref, idx_ref, upd_ref, out_ref, idx_s, upd_s, sem, *,
    block, n_rows, cdim, rows_per_chunk,
):
    """lo_ref: scalar-prefetch (n_blocks+1,) int32 contribution bounds.
    idx_ref: (n_rows, 128) int32 sorted indices (HBM).
    upd_ref: (cdim, n_rows, 128) f32 sorted updates (HBM).
    out_ref: (cdim, block) dense gradient block.
    idx_s: VMEM (R, 128) scratch; upd_s: VMEM (cdim, R, 128); sem: DMA.
    Chunks are R=rows_per_chunk 8-aligned storage rows (Mosaic slices of
    an (n, 128) HBM memref must be 8-row aligned)."""
    R = rows_per_chunk
    span = R * _LANE
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = lo_ref[b + 1]
    base = b * block
    c0 = lo // span
    n_chunks = jnp.maximum((hi + span - 1) // span - c0, 0)

    e_iota = jax.lax.broadcasted_iota(jnp.int32, (block, _LANE), 0) + base
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def body(ci, acc):
        sc = c0 + ci
        cp1 = pltpu.make_async_copy(
            idx_ref.at[pl.ds(sc * R, R), :], idx_s, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            upd_ref.at[:, pl.ds(sc * R, R), :], upd_s, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        # Static unroll over the R rows of the chunk (Mosaic vector
        # layouts are 2D; 3D broadcasts crash the layout pass).
        for r in range(R):
            idx_r = idx_s[r : r + 1, :]  # (1, 128)
            pos = (sc * R + r) * _LANE + s_iota
            valid = (pos >= lo) & (pos < hi)
            oh = ((idx_r == e_iota) & valid).astype(jnp.float32)  # (block, 128)
            contribs = []
            for c in range(cdim):
                contribs.append(
                    jnp.sum(oh * upd_s[c, r : r + 1, :], axis=1)
                )  # (block,)
            acc = acc + jnp.stack(contribs, axis=0)
        return acc  # (cdim, block)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((cdim, block), jnp.float32)
    )
    out_ref[:, :] = acc


@functools.partial(
    jax.jit, static_argnames=("table_size", "block", "rows_per_chunk", "interpret")
)
def sorted_segment_add_pallas(
    idx: jax.Array,  # (M,) int32, ANY order (sorted internally)
    upd: jax.Array,  # (M, C) f32
    table_size: int,
    block: int = 512,
    rows_per_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Dense (table_size, C) sum of updates grouped by index.

    Out-of-range indices (>= table_size, e.g. a drop sentinel) are
    ignored.
    """
    M, C = idx.shape[0], upd.shape[1]
    n_blocks = (table_size + block - 1) // block
    padded_size = n_blocks * block

    pad = (-M) % (rows_per_chunk * _LANE)
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad,), padded_size + 1, jnp.int32)]
        )
        upd = jnp.concatenate([upd, jnp.zeros((pad, C), upd.dtype)])
    Mp = idx.shape[0]
    n_rows = Mp // _LANE

    sorted_vals = jax.lax.sort(
        [idx] + [upd[:, c] for c in range(C)], num_keys=1
    )
    idx_s = sorted_vals[0]
    upd_planes = jnp.stack(sorted_vals[1:], axis=0).reshape(C, n_rows, _LANE)
    idx_rows = idx_s.reshape(n_rows, _LANE)

    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * block
    lo = jnp.searchsorted(idx_s, bounds, side="left").astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _seg_add_kernel, block=block, n_rows=n_rows, cdim=C,
            rows_per_chunk=rows_per_chunk,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (C, block), lambda i, lo_ref: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_per_chunk, _LANE), jnp.int32),
                pltpu.VMEM((C, rows_per_chunk, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((C, padded_size), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lo, idx_rows, upd_planes)
    return out.T[:table_size]


def sorted_segment_add(idx, upd, table_size, interpret=False):
    """Dispatch: Pallas on TPU, plain scatter elsewhere (CPU tests)."""
    if jax.default_backend() == "tpu" or interpret:
        return sorted_segment_add_pallas(
            idx, upd, table_size, interpret=interpret
        )
    return jnp.zeros((table_size, upd.shape[1]), upd.dtype).at[idx].add(
        upd, mode="drop"
    )


def sorted_segment_add_planes(idx, upd_planes, table_size, interpret=False):
    """Channel-plane variant: upd_planes (C, M) — avoids ever building an
    (M, C) array (minor-dim-C layouts tile-pad badly on TPU)."""
    if jax.default_backend() == "tpu" or interpret:
        return _segment_add_from_planes(
            idx, upd_planes, table_size, interpret=interpret
        )
    return (
        jnp.zeros((table_size, upd_planes.shape[0]), upd_planes.dtype)
        .at[idx]
        .add(upd_planes.T, mode="drop")
    )


@functools.partial(
    jax.jit, static_argnames=("table_size", "block", "rows_per_chunk", "interpret")
)
def _segment_add_from_planes(
    idx, upd_planes, table_size, block=512, rows_per_chunk=8, interpret=False
):
    C, M = upd_planes.shape
    n_blocks = (table_size + block - 1) // block
    padded_size = n_blocks * block

    pad = (-M) % (rows_per_chunk * _LANE)
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad,), padded_size + 1, jnp.int32)]
        )
        upd_planes = jnp.concatenate(
            [upd_planes, jnp.zeros((C, pad), upd_planes.dtype)], axis=1
        )
    Mp = idx.shape[0]
    n_rows = Mp // _LANE

    sorted_vals = jax.lax.sort(
        [idx] + [upd_planes[c] for c in range(C)], num_keys=1
    )
    idx_s = sorted_vals[0]
    upd_sorted = jnp.stack(sorted_vals[1:], axis=0).reshape(C, n_rows, _LANE)
    idx_rows = idx_s.reshape(n_rows, _LANE)

    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * block
    lo = jnp.searchsorted(idx_s, bounds, side="left").astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _seg_add_kernel, block=block, n_rows=n_rows, cdim=C,
            rows_per_chunk=rows_per_chunk,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (C, block), lambda i, lo_ref: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_per_chunk, _LANE), jnp.int32),
                pltpu.VMEM((C, rows_per_chunk, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((C, padded_size), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lo, idx_rows, upd_sorted)
    return out.T[:table_size]
