"""Fused Pallas TPU rasterizer: in-VMEM binning + subtile fine eval.

One kernel per pose replaces BOTH stages of the binned rasterizer,
eliminating the XLA primitives that dominated the old path (measured on
v5e, 252 poses x 160^2 x 5k faces: top_k face->tile packing 61 ms,
slot-record gather 39 ms, fine eval 42 ms):

* Binning: faces arrive Morton-sorted (spatially coherent index order,
  see pipeline/mesh_tensors.py), so a 128-face chunk projects to a
  compact screen patch. XLA precomputes per-(pose, tile) ACTIVE chunk
  lists from chunk screen bboxes (a tiny (T, C) top_k); the kernel
  loops only over a tile's active chunks and compacts the faces whose
  bbox overlaps the tile into a (D2, K) VMEM accumulator using
  cumsum-as-matmul ranks + a one-hot MXU scatter. No face top_k, no
  HBM gather; routing is exact (each record lands in exactly one slot;
  0/1-weighted f32 matmuls at HIGHEST precision reproduce the operand
  bit-for-bit via the 3-way bf16 split).
* Capacity rounds: a tile holding more than K faces (e.g. a flat mesh
  seen edge-on compresses thousands of faces into a sliver) is
  processed in up to `rounds` passes, each binning the next K ranks
  and z-merging with the previous best — EXACT up to rounds*K faces
  per tile, unlike the XLA binned path which silently drops at K.
  Faces beyond rounds*K are dropped and REPORTED per tile in the ovf
  output (ops/rasterizer.py exposes this).
* Fine eval: the WHOLE tile's pixels (tile^2 rows) are edge-tested
  against all K candidates in one VPU pass; the winner's
  perspective-correct barycentrics weight three one-hot matmuls that
  interpolate the vertex attributes directly — no per-pixel gather, no
  winner-record fetch. Depth and coverage ride the SAME matmuls:
  pack_records appends per-vertex [z, 1] attribute rows, and
  perspective-correct interpolation of vertex z equals the screen
  depth (sum_i c_i z_i = sum_i w_i / zsum = 1/zsum) while
  interpolation of the constant 1 under the one-hot weights is exactly
  the 0/1 coverage — so one (Da, K) x (K, tile^2) contraction set per
  tile yields the full [attrs | z | mask] output block, channel-major,
  with no transposes. (The previous per-8x8-subtile eval issued 16x
  more, far smaller, matmuls per tile and needed an MXU identity
  transpose for z; measured 45 -> ~27 ms for the 252x160^2 bench
  render.) Camera-space XYZ is NOT interpolated: it is reconstructed
  in XLA as z * ray(pixel), saving 9 record rows.

Record row layout, shared with the XLA prep (pack_records):
    rows 0..3   face screen bbox [bx0, bx1, by0, by1]
    rows 4..13  sign-normalized edge coefficients (row 13 = ok flag)
    rows 14..16 per-vertex 1/z
    rows 17..   3*Da per-vertex attributes, grouped by vertex
                ([v0 attrs | v1 attrs | v2 attrs]); the last two
                attributes of each vertex group are the appended
                [z, 1] rows (pack_records adds them)

Output rows per tile: [Da-2 interpolated attrs | z | coverage mask]
(= Da rows; pixels row-major within the tile).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import jax_config  # noqa: F401

_BIG = 1e30
_HI = jax.lax.Precision.HIGHEST


def _raster_kernel(
    act_ref,  # (1, T, C) SMEM i32: packed active chunk ids per tile
    acnt_ref,  # (1, 1, T) SMEM i32: active chunk count per tile
    rec_ref,  # (1, C, D2, 128) VMEM f32: chunked face records, this pose
    out_ref,  # (1, T, OUT, P) VMEM f32: [attrs | z | mask] rows
    ovf_ref,  # (1, 1, T) SMEM i32: faces dropped beyond rounds*K
    acc_ref,  # (D2-4, K) VMEM f32 scratch: current round's packed
    # records without the 4 bbox rows (dead after the overlap test)
    *,
    tile: int,
    ntx: int,
    nty: int,
    K: int,
    Da: int,
    rounds: int,
):
    D2 = 17 + 3 * Da
    P = tile * tile
    CW = 8  # chunks binned per group (static unroll width)

    # Rank/cumsum helpers, built once per program. U is the inclusive
    # upper-triangular cumsum operator for 128-lane chunks; L is the
    # strict-lower prefix operator across the CW chunks of a group.
    r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    U = (r128 <= c128).astype(jnp.float32)
    L = (
        jax.lax.broadcasted_iota(jnp.int32, (CW, CW), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (CW, CW), 1)
    ).astype(jnp.float32)
    rowid_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0).astype(
        jnp.float32
    )  # (K, 1)

    # Local pixel offsets within the tile (row-major): (P, 1) for the
    # pixel-major edge eval. No transpose machinery: depth and coverage
    # come out channel-major from the interpolation matmuls.
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (pidx % tile).astype(jnp.float32)
    ly = (pidx // tile).astype(jnp.float32)
    # Row-oriented (1, P) copies for the per-pixel winner math.
    pidr = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    lxr = (pidr % tile).astype(jnp.float32)
    lyr = (pidr // tile).astype(jnp.float32)
    Dm1 = Da - 1

    def do_tile(t, _):
        ty = t // ntx
        tx = t % ntx
        tx0 = (tx * tile).astype(jnp.float32)
        ty0 = (ty * tile).astype(jnp.float32)
        tx1 = tx0 + (tile - 1)
        ty1 = ty0 + (tile - 1)

        def fill(r):
            """Bin ranks [r*K, (r+1)*K) of this tile's overlapping faces
            into acc. Returns the TOTAL overlap count (all ranks).

            Chunks are processed CW at a time with a static unroll: one
            stacked (CW, 128) rank matmul + CW INDEPENDENT one-hot
            routing matmuls (tree-summed). The old one-chunk-at-a-time
            loop serialized scalar load -> dynamic slab read -> rank ->
            route on the loop-carried count; at ~6 active chunks x 25
            tiles x 252 poses that latency chain was ~60% of the whole
            kernel (43 ms of 70 measured on v5e)."""
            acc_ref[:] = jnp.zeros((acc_ref.shape[0], K), jnp.float32)
            n_act = acnt_ref[0, 0, t]
            n_grp = (n_act + (CW - 1)) // CW
            n_act_f = n_act.astype(jnp.float32)

            def do_group(g, base):
                j0 = g * CW
                slabs, ovs = [], []
                for j in range(CW):
                    cid = act_ref[0, t, j0 + j]
                    slab = rec_ref[0, cid, :, :]  # (D2, 128)
                    live = (j0 + j).astype(jnp.float32) < n_act_f
                    ov = (
                        (slab[0:1, :] <= tx1)
                        & (slab[1:2, :] >= tx0)
                        & (slab[2:3, :] <= ty1)
                        & (slab[3:4, :] >= ty0)
                        & (slab[13:14, :] > 0)
                        & live
                    )
                    slabs.append(slab)
                    ovs.append(ov)
                OV = jnp.concatenate(
                    [o.astype(jnp.float32) for o in ovs], axis=0
                )  # (CW, 128)
                ranks = jax.lax.dot_general(
                    OV, U, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (CW, 128) inclusive within-chunk; 0/1 matmul exact
                totals = ranks[:, 127:128]  # (CW, 1)
                bases = jax.lax.dot_general(
                    L, totals, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (CW, 1) exclusive prefix across the group
                tgt = ranks + bases + (base - 1.0 - r * K)  # (CW, 128)
                # Dead lanes (no overlap) keep the running rank of an
                # earlier lane; poison them so the one-hot can't match
                # (arithmetic form — Mosaic rejects bool-concat selects).
                tgt = tgt * OV - (1.0 - OV) * jnp.float32(2e9)
                # ONE wide routing matmul instead of CW small ones: the
                # (D2-4, 128) x (128, K) per-chunk products were MXU
                # issue-latency bound; concatenating the group's slabs
                # and targets along lanes turns them into a single
                # 1024-deep contraction the MXU pipelines end-to-end.
                # bbox rows 0..3 are dead after the overlap test — route
                # only rows 4.. (coeffs | zinv | attrs).
                slab_all = jnp.concatenate(
                    [s[4:] for s in slabs], axis=1
                )  # (D2-4, CW*128)
                tgt_all = tgt.reshape(1, CW * 128)  # chunk-major lanes
                oh_all = (rowid_k == tgt_all).astype(
                    jnp.bfloat16
                )  # (K, CW*128): 0/1, exactly representable in bf16
                # Exact one-hot routing in THREE bf16 MXU passes instead
                # of precision=HIGHEST (which splits BOTH operands 3-way
                # and issues 6 passes): the one-hot side is already
                # bf16-exact, and the standard 3-limb bf16 split of an
                # f32 (24 <= 3x8 mantissa bits, round-to-nearest
                # residuals telescope) reproduces slab_all exactly, so
                # limb-wise products accumulated in f32 equal the f32
                # operand bit-for-bit under 0/1 weights.
                s0 = slab_all.astype(jnp.bfloat16)
                r1 = slab_all - s0.astype(jnp.float32)
                s1 = r1.astype(jnp.bfloat16)
                s2 = (r1 - s1.astype(jnp.float32)).astype(jnp.bfloat16)

                def route(limb):
                    return jax.lax.dot_general(
                        limb, oh_all, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,  # the
                        # session-wide f32 precision pin rejects bf16
                        # operands; DEFAULT is one native MXU pass
                    )  # (D2-4, K)

                acc_ref[:] += route(s0) + route(s1) + route(s2)
                return base + jnp.sum(totals)

            return jax.lax.fori_loop(0, n_grp, do_group, jnp.float32(0.0))

        def eval_tile(width):
            """Edge-test the first `width` candidates of acc against ALL
            tile pixels and interpolate the winner's attributes. Returns
            the finished (Da, P) output block [attrs-2 | z | coverage].

            `width` < K is EXACT whenever the tile's candidate count is
            <= width: fill() packs ranks ascending, so all candidates
            then live in the first `width` lanes.

            acc rows are the record rows MINUS the four bbox rows (fill
            does not route them): [10 coeffs | 3 zinv | 3*Da attrs].
            The last two attrs of each vertex group are [z, 1]
            (pack_records appends them): perspective-correct
            interpolation of vertex z IS the screen depth, and of the
            constant 1 IS the normalizer — so the same three matmuls
            produce the whole output block channel-major, no transpose.

            VPU-lean winner select (each dropped op is a full (P, K)
            vector pass, the kernel's unit of cost):
            * the winner is the MAX of zsum = sum_i w_i/z_i, not the
              min of z = 1/zsum — same ordering for positive depths,
              no per-candidate reciprocal;
            * the inside test is one min3 >= eps (the ok flag of row 9
              is not re-tested: fill() only bins ok faces, and empty
              lanes die on the zsum > 0 guard).

            Winner-record GATHER instead of weighted interpolation:
            the per-pixel one-hot is pure 0/1 — exactly representable
            in bf16 — so ONE (rows, K) x (K, P) contraction per limb
            of the 3-limb bf16 split gathers the winner's ENTIRE
            record column exactly (3 native MXU passes total). The
            previous scheme issued THREE weighted one-hot matmuls at
            HIGHEST precision (= 18 effective passes) whose f32
            weights could not ride the exact-split trick. Barycentrics
            are then recomputed from the gathered coefficient rows in
            (1, P) row orientation — per-pixel VPU math over Da-row
            blocks, negligible next to the (P, K) select. Exact zsum
            ties take the lowest lane (gathered record columns cannot
            sum): at shared edges — the only place exact ties occur —
            both faces interpolate to the same boundary value."""
            px = tx0 + lx  # (P, 1)
            py = ty0 + ly
            A = acc_ref[:, :width]
            w0 = px * A[0:1, :] + py * A[1:2, :] + A[2:3, :]  # (P, K)
            w1 = px * A[3:4, :] + py * A[4:5, :] + A[5:6, :]
            w2 = px * A[6:7, :] + py * A[7:8, :] + A[8:9, :]
            eps = -1e-5
            inside = jnp.minimum(jnp.minimum(w0, w1), w2) >= eps
            zsum = (
                w0 * A[10:11, :] + w1 * A[11:12, :] + w2 * A[12:13, :]
            )
            s = jnp.where(inside & (zsum > 1e-12), zsum, -1.0)
            m = jnp.max(s, axis=1, keepdims=True)  # (P, 1)
            is_max = (s == m) & (m > 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            first = jnp.min(
                jnp.where(is_max, lane, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            ohw = (is_max & (lane == first)).astype(
                jnp.bfloat16
            )  # (P, K) one-hot, exactly representable in bf16

            # 3-limb exact split of the candidate records (rows, K) —
            # tiny next to the (P, K) planes above.
            g0 = A.astype(jnp.bfloat16)
            gr = A - g0.astype(jnp.float32)
            g1 = gr.astype(jnp.bfloat16)
            g2 = (gr - g1.astype(jnp.float32)).astype(jnp.bfloat16)

            def gath(limb):
                return jax.lax.dot_general(
                    limb, ohw, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (rows, P)

            R = gath(g0) + gath(g1) + gath(g2)  # winner records, 0 if
            # the pixel is empty (all-zero one-hot column)

            pxr = tx0 + lxr  # (1, P)
            pyr = ty0 + lyr
            v0 = pxr * R[0:1, :] + pyr * R[1:2, :] + R[2:3, :]  # (1, P)
            v1 = pxr * R[3:4, :] + pyr * R[4:5, :] + R[5:6, :]
            v2 = pxr * R[6:7, :] + pyr * R[7:8, :] + R[8:9, :]
            u0 = v0 * R[10:11, :]
            u1 = v1 * R[11:12, :]
            u2 = v2 * R[12:13, :]
            raw = (
                R[13 : 13 + Da, :] * u0
                + R[13 + Da : 13 + 2 * Da, :] * u1
                + R[13 + 2 * Da :, :] * u2
            )  # (Da, P); row Dm1 interpolates the constant-1 attr =
            # the winner's zsum (the perspective normalizer)
            norm = raw[Dm1:Da, :]  # (1, P), 0 if empty
            inv = jnp.where(norm > 1e-12, 1.0 / norm, 0.0)
            return jnp.concatenate(
                [raw[:Dm1, :] * inv, (norm > 1e-12).astype(jnp.float32)],
                axis=0,
            )

        count = fill(0)

        # Tiered fine eval (exact): empty tiles (~16% on the benchmark
        # workload) skip the eval entirely; tiles whose candidate count
        # fits the first K/2 lanes (~46%) run the edge tests at half
        # vector width. Ranks pack ascending, so both tiers see every
        # candidate they claim to. (A K/4 tier measured slightly
        # SLOWER at the bench shape — too few tiles are that sparse to
        # pay for the extra conditional code.)
        def empty_tile():
            return jnp.zeros((Da, P), jnp.float32)

        if K >= 256:
            blk = jax.lax.cond(
                count == 0.0,
                empty_tile,
                lambda: jax.lax.cond(
                    count <= float(K // 2),
                    lambda: eval_tile(K // 2),
                    lambda: eval_tile(K),
                ),
            )
        else:
            blk = jax.lax.cond(
                count == 0.0, empty_tile, lambda: eval_tile(K)
            )

        for r in range(1, rounds):
            pred = count > float(r * K)

            @pl.when(pred)
            def _():
                fill(r)

            def merged(old):
                new = eval_tile(K)
                zo = jnp.where(old[Da - 1 : Da, :] > 0.5,
                               old[Da - 2 : Da - 1, :], _BIG)
                zn = jnp.where(new[Da - 1 : Da, :] > 0.5,
                               new[Da - 2 : Da - 1, :], _BIG)
                return jnp.where(zn < zo, new, old)

            blk = jax.lax.cond(pred, merged, lambda old: old, blk)

        ovf_ref[0, 0, t] = jnp.maximum(
            count - float(rounds * K), 0.0
        ).astype(jnp.int32)

        out_ref[0, t, :, :] = blk
        return 0

    jax.lax.fori_loop(0, ntx * nty, do_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "ntx", "nty", "K", "rounds", "interpret"),
)
def raster_pose_pallas(
    rec: jax.Array,  # (N, D2, Fp) packed face records, Fp % 128 == 0
    act: jax.Array,  # (N, T, C) int32 packed active chunk ids
    acnt: jax.Array,  # (N, T) int32 active chunk counts
    tile: int,
    ntx: int,
    nty: int,
    K: int = 256,
    rounds: int = 4,
    interpret: bool = False,
):
    """-> (out (N, T, Da, tile^2), ovf (N, T) int32).

    out rows: [Da-2 interpolated attrs | winner z | coverage mask]
    (records carry appended per-vertex [z, 1] attributes whose
    interpolation yields the z and mask rows — see pack_records);
    pixels are row-major within each tile; ops/rasterizer.py
    un-tiles to image order and reconstructs the camera-space XYZ map
    as z * ray. ovf[n, t] counts faces dropped beyond the rounds*K
    per-tile capacity.
    """
    N, D2, Fp = rec.shape
    assert Fp % 128 == 0 and K % 128 == 0
    Da = (D2 - 17) // 3
    T = ntx * nty
    P = tile * tile
    OUT = Da
    C = Fp // 128
    # chunk-major layout: the kernel indexes chunks on a leading dim
    # (cheap address offset) instead of a dynamic lane slice.
    rec_c = rec.reshape(N, D2, C, 128).transpose(0, 2, 1, 3)
    # the group-unrolled fill reads act in blocks of 8 entries; pad the
    # chunk-list width so the last block never indexes out of bounds
    # (padded entries are dead: their lanes fail the `live` test).
    pad_c = (-act.shape[2]) % 8
    if pad_c:
        act = jnp.concatenate(
            [act, jnp.zeros((N, T, pad_c), act.dtype)], axis=2
        )

    kern = functools.partial(
        _raster_kernel, tile=tile, ntx=ntx, nty=nty, K=K, Da=Da,
        rounds=rounds,
    )
    out, ovf = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((N, T, OUT, P), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, T), jnp.int32),
        ),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, T, act.shape[2]), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, D2, 128), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, OUT, P), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((D2 - 4, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(act, acnt[:, None, :], rec_c)
    return out, ovf[:, 0, :]


def pack_records(xy_f, z_f, valid_f, tri_attr, coeffs, zinv):
    """XLA prep: (D2, F) packed record matrix for ONE pose.

    xy_f (F, 3, 2) screen verts, tri_attr (F, 3, Da), coeffs (F, 10),
    zinv (F, 3) from rasterizer._face_coeffs. Invalid faces get an
    empty bbox so they never pass a chunk/tile overlap test.

    Appends per-vertex [z, 1] attribute rows: the kernel's
    perspective-correct interpolation of vertex z equals the winner's
    screen depth, and of the constant 1 (under one-hot weights) equals
    the coverage mask — so depth/mask ride the attribute matmuls and
    the output block needs no extra rows.
    """
    F, _, Da = tri_attr.shape
    tri_attr = jnp.concatenate(
        [tri_attr, z_f[..., None], jnp.ones((F, 3, 1), tri_attr.dtype)],
        axis=-1,
    )  # (F, 3, Da + 2)
    ok = coeffs[:, 9] > 0
    bx0 = jnp.where(ok, jnp.min(xy_f[:, :, 0], axis=1), _BIG)
    bx1 = jnp.where(ok, jnp.max(xy_f[:, :, 0], axis=1), -_BIG)
    by0 = jnp.where(ok, jnp.min(xy_f[:, :, 1], axis=1), _BIG)
    by1 = jnp.where(ok, jnp.max(xy_f[:, :, 1], axis=1), -_BIG)
    rec = jnp.concatenate(
        [
            jnp.stack([bx0, bx1, by0, by1], axis=1),
            coeffs,
            zinv,
            tri_attr.reshape(F, 3 * (Da + 2)),  # per vertex (v0|v1|v2)
        ],
        axis=1,
    )  # (F, D2)
    return rec.T  # (D2, F)


def active_chunks(rec, H, W, tile):
    """XLA prep: packed active-chunk lists for ONE pose.

    rec (D2, F) with F % 128 == 0. Returns (act (T, C) int32 ids packed
    ascending, acnt (T,) int32). A chunk is active for a tile when its
    member faces' joint screen bbox overlaps the tile rect.
    """
    F = rec.shape[1]
    C = F // 128
    nty, ntx = H // tile, W // tile
    T = nty * ntx
    cb = rec[:4].reshape(4, C, 128)
    cx0 = jnp.min(cb[0], axis=1)  # (C,)
    cx1 = jnp.max(cb[1], axis=1)
    cy0 = jnp.min(cb[2], axis=1)
    cy1 = jnp.max(cb[3], axis=1)
    txi = jnp.arange(ntx, dtype=jnp.float32) * tile
    tyi = jnp.arange(nty, dtype=jnp.float32) * tile
    ovx = (cx0[None] <= txi[:, None] + (tile - 1)) & (cx1[None] >= txi[:, None])
    ovy = (cy0[None] <= tyi[:, None] + (tile - 1)) & (cy1[None] >= tyi[:, None])
    ov = (ovy[:, None, :] & ovx[None, :, :]).reshape(T, C)  # (T, C)
    keys = jnp.where(ov, C - jax.lax.broadcasted_iota(jnp.int32, (T, C), 1), 0)
    top, _ = jax.lax.top_k(keys, C)
    act = jnp.where(top > 0, C - top, 0).astype(jnp.int32)  # packed ascending
    acnt = jnp.sum(ov, axis=1).astype(jnp.int32)
    return act, acnt
