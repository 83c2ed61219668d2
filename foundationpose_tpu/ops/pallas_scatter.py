"""Pallas TPU kernel: sorted segment-add into a dense table.

XLA's scatter-add on TPU serializes (~80 ns/update: 1.4 s for the 16.7M
hash-grid gradient updates of ONE NeRF step at 512 rays, OOM at the full
2048-ray config). This kernel rebuilds the dense gradient with a
one-hot MXU contraction instead:

1. XLA sorts the (index, update) stream by index (bitonic sort is
   vector-friendly: ~60 ms for 16.7M keys + 8 payload planes) and
   computes each table block's contribution range with a tiny
   searchsorted on the block boundaries.
2. The kernel walks table blocks; per block it streams `span`-wide
   chunks of the sorted flat (index, update-planes) arrays overlapping
   its range (async DMA off scalar-prefetched bounds), builds ONE
   (block, span) equality one-hot, and reduces ALL channels in ONE
   matmul: acc (C, block) += upd (C, span) @ oh^T. Duplicate indices
   simply add; chunk lanes outside the block's range are masked by the
   position test (and could not match the block's row-id iota anyway).

Layouts are flat 128-lane-minor: idx (1, M), updates (2C, M) bf16
hi/lo-split planes, output (C, blocks*block). Updates are split into
hi + lo bf16 parts BEFORE the sort (Mosaic kernels support only
DEFAULT/HIGHEST dot precision), so the contraction is one native bf16
MXU pass and each update lands with ~2^-16 relative error, f32
accumulated — gradient-grade accuracy. (The previous formulation
reduced each 128-lane row on the VPU: 840 ms at 16.7M x 8 channels on
v5e; this one is matmul-bound.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import jax_config  # noqa: F401

_LANE = 128  # hardware lane width


def _seg_add_kernel(
    lo_ref, idx0_ref, upd0_ref, idx_hbm, upd_hbm, out_ref,
    idx_s, upd_s, sem, *,
    block, cdim, span,
):
    """lo_ref: scalar-prefetch (n_blocks+1,) int32 contribution bounds.
    idx0_ref/upd0_ref: the block's FIRST overlapping chunk, delivered by
    a prefetch-driven BlockSpec — Mosaic double-buffers these across
    grid steps, so the common one-chunk block pays no DMA latency.
    idx_hbm (1, Mp) i32 / upd_hbm (2*cdim, Mp) bf16: full sorted flat
    streams for the rare additional chunks (manual DMA into scratch).
    out_ref: (cdim, block) dense gradient block."""
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = lo_ref[b + 1]
    base = b * block
    n_data_chunks = idx_hbm.shape[1] // span
    c0 = jnp.minimum(lo // span, n_data_chunks - 1)  # match the
    # BlockSpec clamp (lo == Mp when every update precedes this block)
    n_chunks = jnp.maximum((hi + span - 1) // span - c0, 0)

    e_col = (
        jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) + base
    )  # (block, 1) table row ids of this block
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)

    def contribution(idx_vec, upd_vec, sc):
        pos = sc * span + s_iota
        valid = (pos >= lo) & (pos < hi)
        oh = ((idx_vec == e_col) & valid).astype(
            jnp.bfloat16
        )  # (block, span), exactly representable
        return jax.lax.dot_general(
            upd_vec, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,  # the session-wide
            # float32 precision pin is incompatible with bf16 operands
        )  # (2*cdim, block), one native bf16 MXU pass, f32 accumulate
        # (a (block, 2C) orientation + per-block transpose measured
        # slower: the relayout costs more than the 16-row passes save)

    acc = contribution(idx0_ref[:], upd0_ref[:], c0)

    def body(ci, acc):
        sc = c0 + ci
        cp1 = pltpu.make_async_copy(
            idx_hbm.at[:, pl.ds(sc * span, span)], idx_s, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            upd_hbm.at[:, pl.ds(sc * span, span)], upd_s, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        return acc + contribution(idx_s[:], upd_s[:], sc)

    acc = jax.lax.fori_loop(1, jnp.maximum(n_chunks, 1), body, acc)
    # fold the hi/lo split: update = hi + lo to ~2^-16 relative
    out_ref[:, :] = acc[:cdim, :] + acc[cdim:, :]


def _hi_lo_split(upd_planes):
    """(C, ...) f32 -> hi, lo (C, ...) bf16 with update == hi + lo to
    ~2^-16 relative. The hi part is built by MANTISSA BIT-MASKING, not
    dtype rounding: XLA runs with --xla_allow_excess_precision, which
    elides the rounding in `upd - f32(bf16(upd))` and silently zeroes
    the lo part (measured: 1.75e-3 relative error instead of ~1e-5)."""
    hi_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(upd_planes, jnp.uint32)
        & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    hi16 = hi_f32.astype(jnp.bfloat16)  # exact: mantissa already fits
    lo16 = (upd_planes - hi_f32).astype(jnp.bfloat16)
    return hi16, lo16


def _run_block_kernel(
    idx_s, upd_sorted, table_size, block, span, interpret,
    channel_major=False,
):
    """Run the per-table-block one-hot contraction over an ALREADY
    SORTED flat stream. idx_s (Mp,) int32 ascending (Mp % span == 0),
    upd_sorted (2C, Mp) bf16 hi/lo planes -> (table_size, C) f32, or
    (C, table_size) when channel_major (the kernel's native layout —
    no transpose)."""
    C = upd_sorted.shape[0] // 2
    n_blocks = (table_size + block - 1) // block
    padded_size = n_blocks * block

    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * block
    lo = jnp.searchsorted(idx_s, bounds, side="left").astype(jnp.int32)

    n_data_chunks = idx_s.shape[0] // span

    def chunk0_map(i, lo_ref):
        # the block's first overlapping chunk, clamped like the kernel
        return (0, jnp.minimum(lo_ref[i] // span, n_data_chunks - 1))

    out = pl.pallas_call(
        functools.partial(_seg_add_kernel, block=block, cdim=C, span=span),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, span), chunk0_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * C, span), chunk0_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (C, block), lambda i, lo_ref: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, span), jnp.int32),
                pltpu.VMEM((2 * C, span), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((C, padded_size), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lo, idx_s[None, :], upd_sorted, idx_s[None, :], upd_sorted)
    if channel_major:
        return out[:, :table_size]
    return out.T[:table_size]


@functools.partial(
    jax.jit, static_argnames=("table_size", "block", "span", "interpret")
)
def _segment_add_flat(
    idx: jax.Array,  # (M,) int32, ANY order (sorted internally)
    upd_planes: jax.Array,  # (C, M) f32
    table_size: int,
    block: int = 1024,
    span: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Dense (table_size, C) sum of updates grouped by index.

    Out-of-range indices (>= table_size, e.g. a drop sentinel) are
    ignored."""
    C, M = upd_planes.shape
    n_blocks = (table_size + block - 1) // block
    padded_size = n_blocks * block

    pad = (-M) % span
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad,), padded_size + 1, jnp.int32)]
        )
        upd_planes = jnp.concatenate(
            [upd_planes, jnp.zeros((C, pad), upd_planes.dtype)], axis=1
        )

    # hi/lo bf16 operand split BEFORE the sort: the one-hot contraction
    # runs as a single native bf16 MXU pass, and the sort payload halves.
    hi16, lo16 = _hi_lo_split(upd_planes)
    sorted_vals = jax.lax.sort(
        [idx]
        + [hi16[c] for c in range(C)]
        + [lo16[c] for c in range(C)],
        num_keys=1,
    )
    idx_s = sorted_vals[0]
    upd_sorted = jnp.stack(sorted_vals[1:], axis=0)  # (2C, Mp) bf16
    return _run_block_kernel(
        idx_s, upd_sorted, table_size, block, span, interpret
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "table_size", "block", "span", "interpret", "out_channel_major"
    ),
)
def _segment_add_leveled(
    idx_lv: jax.Array,  # (L, N) int32; row l's values all in level l's
    #                     [offset_l, offset_l + size_l) table segment
    upd_planes: jax.Array,  # (C, L, N) f32
    table_size: int,
    block: int = 1024,
    span: int = 1024,
    interpret: bool = False,
    out_channel_major: bool = False,  # True -> (C, table_size): skips
    #                     the multi-GB transpose of the kernel's native
    #                     channel-major output at NeRF table sizes
) -> jax.Array:
    """Leveled variant of _segment_add_flat: one BATCHED sort of L rows
    of N keys instead of one flat L*N sort (~30% fewer bitonic stages at
    NeRF shapes, and each row sorts in better locality). Because the
    rows' index ranges are disjoint and ascending in l, concatenating
    the per-row sorted streams yields a globally sorted stream with no
    merge step — the block kernel consumes it unchanged."""
    C, L, N = upd_planes.shape
    n_blocks = (table_size + block - 1) // block
    padded_size = n_blocks * block

    hi16, lo16 = _hi_lo_split(upd_planes)
    sorted_vals = jax.lax.sort(
        [idx_lv]
        + [hi16[c] for c in range(C)]
        + [lo16[c] for c in range(C)],
        num_keys=1,
    )  # batched over the leading L dim, sorted along the last
    idx_s = sorted_vals[0].reshape(-1)
    upd_sorted = jnp.stack(
        [v.reshape(-1) for v in sorted_vals[1:]], axis=0
    )  # (2C, L*N) bf16

    pad = (-idx_s.shape[0]) % span
    if pad:  # sentinel > every index: the stream stays globally sorted
        idx_s = jnp.concatenate(
            [idx_s, jnp.full((pad,), padded_size + 1, jnp.int32)]
        )
        upd_sorted = jnp.concatenate(
            [upd_sorted, jnp.zeros((2 * C, pad), upd_sorted.dtype)], axis=1
        )
    return _run_block_kernel(
        idx_s, upd_sorted, table_size, block, span, interpret,
        channel_major=out_channel_major,
    )


def _seg_add_factored_kernel(
    lo_ref, idx0_ref, w0_ref, g0_ref, idx_hbm, w_hbm, g_hbm, out_ref,
    idx_s, w_s, g_s, sem, *,
    block, nw, cdim, span,
):
    """Factored variant of _seg_add_kernel for the oct hash-grid
    gradient: the sorted stream carries the trilinear corner weights
    w (nw bf16 planes) and the per-channel output cotangents g as hi/lo
    bf16 pairs (2*cdim/nw... see wrapper) INSTEAD of the nw*C expanded
    update planes — 13 sorted operands instead of 33 at the NeRF
    config, which is where the backward's time goes. The kernel expands
    w_q * g_c per chunk on the VPU (f32, exact: both factors are bf16),
    re-splits the products hi/lo, and runs the same one-hot MXU
    contraction. out rows: q * C + c."""
    C = cdim // nw
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = lo_ref[b + 1]
    base = b * block
    n_data_chunks = idx_hbm.shape[1] // span
    c0 = jnp.minimum(lo // span, n_data_chunks - 1)
    n_chunks = jnp.maximum((hi + span - 1) // span - c0, 0)

    e_col = (
        jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) + base
    )
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)

    def contribution(idx_vec, w_vec, g_vec, sc):
        pos = sc * span + s_iota
        valid = (pos >= lo) & (pos < hi)
        oh = ((idx_vec == e_col) & valid).astype(jnp.bfloat16)
        exp_hi, exp_lo = [], []
        for q in range(nw):
            wq = w_vec[q : q + 1, :].astype(jnp.float32)
            for c in range(C):
                gc = g_vec[c : c + 1, :].astype(jnp.float32) + g_vec[
                    C + c : C + c + 1, :
                ].astype(jnp.float32)
                p = wq * gc  # exact: bf16 x ~bf16-pair in f32
                # hi part by mantissa bit-masking (same hazard as
                # _hi_lo_split: dtype rounding `p - f32(bf16(p))` is
                # elided under --xla_allow_excess_precision, zeroing
                # the lo plane — observed in interpret mode).
                p_hi_f32 = jax.lax.bitcast_convert_type(
                    jax.lax.bitcast_convert_type(p, jnp.uint32)
                    & jnp.uint32(0xFFFF0000),
                    jnp.float32,
                )
                exp_hi.append(p_hi_f32.astype(jnp.bfloat16))  # exact
                exp_lo.append((p - p_hi_f32).astype(jnp.bfloat16))
        upd = jnp.concatenate(exp_hi + exp_lo, axis=0)  # (2*cdim, span)
        return jax.lax.dot_general(
            upd, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (2*cdim, block)

    acc = contribution(idx0_ref[:], w0_ref[:], g0_ref[:], c0)

    def body(ci, acc):
        sc = c0 + ci
        cps = [
            pltpu.make_async_copy(
                idx_hbm.at[:, pl.ds(sc * span, span)], idx_s, sem.at[0]
            ),
            pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(sc * span, span)], w_s, sem.at[1]
            ),
            pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(sc * span, span)], g_s, sem.at[2]
            ),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        return acc + contribution(idx_s[:], w_s[:], g_s[:], sc)

    acc = jax.lax.fori_loop(1, jnp.maximum(n_chunks, 1), body, acc)
    out_ref[:, :] = acc[:cdim, :] + acc[cdim:, :]


@functools.partial(
    jax.jit,
    static_argnames=("table_size", "block", "span", "interpret"),
)
def _segment_add_factored(
    idx_lv: jax.Array,  # (L, N) int32, per-level rows (see leveled)
    w_planes: jax.Array,  # (nw, L, N) f32 corner weights
    g_planes: jax.Array,  # (C, L, N) f32 cotangents
    table_size: int,
    block: int = 1024,
    span: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Dense (table_size, nw*C) sums of the OUTER-PRODUCT updates
    upd[q*C+c] = w[q] * g[c], factored through the sort: only the
    1 + nw + 2*C operand planes are sorted (vs 2*nw*C expanded), and
    the kernel expands per chunk. w is rounded to bf16 (~2^-9 relative
    on the trilinear weight — far inside NGP gradient noise; torch-ngp
    accumulates grid gradients in fp16); g keeps hi/lo bf16 precision
    (~2^-16)."""
    nw, L, N = w_planes.shape
    C = g_planes.shape[0]
    cdim = nw * C
    n_blocks = (table_size + block - 1) // block
    padded_size = n_blocks * block

    ghi, glo = _hi_lo_split(g_planes)
    sorted_vals = jax.lax.sort(
        [idx_lv]
        + [w_planes[q].astype(jnp.bfloat16) for q in range(nw)]
        + [ghi[c] for c in range(C)]
        + [glo[c] for c in range(C)],
        num_keys=1,
    )  # batched over L
    idx_s = sorted_vals[0].reshape(-1)
    w_sorted = jnp.stack(
        [v.reshape(-1) for v in sorted_vals[1 : 1 + nw]], axis=0
    )
    g_sorted = jnp.stack(
        [v.reshape(-1) for v in sorted_vals[1 + nw :]], axis=0
    )

    pad = (-idx_s.shape[0]) % span
    if pad:
        idx_s = jnp.concatenate(
            [idx_s, jnp.full((pad,), padded_size + 1, jnp.int32)]
        )
        w_sorted = jnp.concatenate(
            [w_sorted, jnp.zeros((nw, pad), w_sorted.dtype)], axis=1
        )
        g_sorted = jnp.concatenate(
            [g_sorted, jnp.zeros((2 * C, pad), g_sorted.dtype)], axis=1
        )

    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * block
    lo = jnp.searchsorted(idx_s, bounds, side="left").astype(jnp.int32)
    n_data_chunks = idx_s.shape[0] // span

    def chunk0_map(i, lo_ref):
        return (0, jnp.minimum(lo_ref[i] // span, n_data_chunks - 1))

    out = pl.pallas_call(
        functools.partial(
            _seg_add_factored_kernel, block=block, nw=nw, cdim=cdim,
            span=span,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, span), chunk0_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, span), chunk0_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (2 * C, span), chunk0_map, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (cdim, block), lambda i, lo_ref: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, span), jnp.int32),
                pltpu.VMEM((nw, span), jnp.bfloat16),
                pltpu.VMEM((2 * C, span), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((cdim, padded_size), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        lo, idx_s[None, :], w_sorted, g_sorted,
        idx_s[None, :], w_sorted, g_sorted,
    )
    return out.T[:table_size]


def factored_segment_add(
    idx_lv, w_planes, g_planes, table_size, interpret=False
):
    """(L, N) per-level indices + (nw, L, N) weights + (C, L, N)
    cotangents -> dense (table_size, nw*C) sums of w[q]*g[c] updates.
    Row l's indices MUST lie in level l's table segment. Falls back to
    expanded scatter-add off-TPU (w rounded bf16 to match the kernel)."""
    if jax.default_backend() == "tpu" or interpret:
        return _segment_add_factored(
            idx_lv, w_planes, g_planes, table_size, interpret=interpret
        )
    nw, L, N = w_planes.shape
    C = g_planes.shape[0]
    w16 = w_planes.astype(jnp.bfloat16).astype(jnp.float32)
    upd = (w16[:, None] * g_planes[None]).reshape(nw * C, L * N)
    return (
        jnp.zeros((table_size, nw * C), g_planes.dtype)
        .at[idx_lv.reshape(-1)]
        .add(upd.T, mode="drop")
    )


def sorted_segment_add_leveled(
    idx_lv, upd_planes, table_size, interpret=False,
    out_channel_major=False,
):
    """(L, N) per-level indices + (C, L, N) update planes -> dense
    (table_size, C) sums. Row l's indices MUST lie in level l's table
    segment (segments disjoint, ascending) — the NeRF hash-grid
    gradient shape. Falls back to scatter-add off-TPU."""
    if jax.default_backend() == "tpu" or interpret:
        return _segment_add_leveled(
            idx_lv, upd_planes, table_size, interpret=interpret,
            out_channel_major=out_channel_major,
        )
    C = upd_planes.shape[0]
    out = (
        jnp.zeros((table_size, C), upd_planes.dtype)
        .at[idx_lv.reshape(-1)]
        .add(upd_planes.reshape(C, -1).T, mode="drop")
    )
    return out.T if out_channel_major else out


def sorted_segment_add_pallas(
    idx, upd, table_size, block=512, rows_per_chunk=None, interpret=False
):
    """(M,) idx + (M, C) updates -> dense (table_size, C) sums.

    rows_per_chunk is accepted for backward compatibility and ignored
    (the kernel streams fixed `span`-wide chunks)."""
    del rows_per_chunk
    return _segment_add_flat(
        idx, upd.T, table_size, block=block, interpret=interpret
    )


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
        return _segment_add_flat(
            idx, upd_planes, table_size, interpret=interpret
        )
    return (
        jnp.zeros((table_size, upd_planes.shape[0]), upd_planes.dtype)
        .at[idx]
        .add(upd_planes.T, mode="drop")
    )
