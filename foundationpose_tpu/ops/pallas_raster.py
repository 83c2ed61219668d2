"""Pallas TPU kernel for the rasterizer's fine stage (method='pallas').

Fuses, per (pose, tile), the fine rasterization into one VMEM-resident
kernel: each 128-lane chunk of the tile's K candidate records is edge-
evaluated on the VPU, the chunk's nearest-z candidate record is pulled
with a one-hot MXU matmul, and a running best record survives across
chunks — the (tile_pixels x K) working set never touches HBM, and the
perspective-correct interpolation happens in registers.

Status: bit-exact with the XLA binned path
(rasterizer._rasterize_binned_interp) — parity-tested — and currently
within ~25% of its speed on v5e (XLA's fused eval + batched one-hot
matmul is already near the VPU roofline for this shape). The kernel is
the substrate for the next step, in-kernel binning (streaming
Morton-ordered face chunks with @pl.when skip), which the XLA path
cannot express.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import jax_config  # noqa: F401

_BIG = 1e30


def _fine_kernel(rec_ref, out_ref, *, tile, ntx, K, Da, kc):
    """rec_ref: (1, D, K) VMEM block for this (pose, tile) program.
    out_ref: (1, P, OUT) with P = tile*tile, OUT = Da + 1 (mask last)."""
    t = pl.program_id(1)
    ty = t // ntx
    tx = t % ntx

    P = tile * tile
    # Row-major pixel index p -> (py, px) = divmod(p, tile), computed as a
    # (P, 1) int iota (Mosaic: no float iota, no (t,t)->(P,1) reshape).
    pidx = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * tile + pidx % tile).astype(jnp.float32)
    py = (ty * tile + pidx // tile).astype(jnp.float32)

    n_chunks = K // kc

    def eval_chunk(c):
        """c: (D, kc) record slab -> z (P, kc)."""
        w0 = px * c[0][None] + py * c[1][None] + c[2][None]
        w1 = px * c[3][None] + py * c[4][None] + c[5][None]
        w2 = px * c[6][None] + py * c[7][None] + c[8][None]
        eps = -1e-5
        inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps) & (c[9][None] > 0)
        zsum = w0 * c[10][None] + w1 * c[11][None] + w2 * c[12][None]
        return jnp.where(inside & (zsum > 1e-12), 1.0 / zsum, _BIG)

    # ---- single pass: per chunk, find the chunk's nearest-z candidate,
    # pull its record with a one-hot MXU matmul, and keep it where it
    # beats the running best (no second evaluation sweep).
    D = 13 + 3 * Da

    def body(i, carry):
        best_z, win = carry
        c = rec_ref[0, :, pl.ds(i * kc, kc)]  # (D, kc)
        z = eval_chunk(c)  # (P, kc)
        zmin = jnp.min(z, axis=1, keepdims=True)
        # One-hot of the first lane attaining zmin (argmin semantics:
        # blending exact-z ties would corrupt the coeffs; no cumsum in
        # Mosaic, so select the minimum matching lane index instead).
        lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        is_min = z == zmin
        first = jnp.min(
            jnp.where(is_min, lane, jnp.int32(2**30)), axis=1, keepdims=True
        )
        oh = (is_min & (lane == first)).astype(jnp.float32)
        cand = jax.lax.dot_general(
            oh, c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, D)
        better = zmin < best_z
        return (
            jnp.where(better, zmin, best_z),
            jnp.where(better, cand, win),
        )

    init = (
        jnp.full((P, 1), _BIG, jnp.float32),
        jnp.zeros((P, D), jnp.float32),
    )
    best_z, win = jax.lax.fori_loop(0, n_chunks, body, init)
    covered = best_z < _BIG

    # ---- interpolation from the winner's own edge coefficients
    pxf = px[:, 0:1]
    pyf = py[:, 0:1]
    w0 = pxf * win[:, 0:1] + pyf * win[:, 1:2] + win[:, 2:3]
    w1 = pxf * win[:, 3:4] + pyf * win[:, 4:5] + win[:, 5:6]
    w2 = pxf * win[:, 6:7] + pyf * win[:, 7:8] + win[:, 8:9]
    zsum = jnp.maximum(
        w0 * win[:, 10:11] + w1 * win[:, 11:12] + w2 * win[:, 12:13], 1e-12
    )
    c0 = w0 * win[:, 10:11] / zsum
    c1 = w1 * win[:, 11:12] / zsum
    c2 = 1.0 - c0 - c1
    a0 = win[:, 13 : 13 + Da]
    a1 = win[:, 13 + Da : 13 + 2 * Da]
    a2 = win[:, 13 + 2 * Da : 13 + 3 * Da]
    interp = a0 * c0 + a1 * c1 + a2 * c2  # (P, Da)

    out_ref[0, :, :Da] = jnp.where(covered, interp, 0.0)
    out_ref[0, :, Da : Da + 1] = covered.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("tile", "ntx", "nty", "kc", "interpret")
)
def fine_raster_pallas(
    rec: jax.Array,  # (NT, D, K) per-(pose,tile) records, K lane-aligned
    tile: int,
    ntx: int,
    nty: int,
    kc: int = 128,
    interpret: bool = False,
):
    """-> (NT, P, Da+1): interpolated attrs + coverage mask per pixel.

    rec rows are flattened pose-major then tile (row-major over the
    nty x ntx tile grid)."""
    NT, D, K = rec.shape
    Da = (D - 13) // 3
    P = tile * tile
    OUT = Da + 1
    T = ntx * nty
    n_pose = NT // T

    return pl.pallas_call(
        functools.partial(_fine_kernel, tile=tile, ntx=ntx, K=K, Da=Da, kc=kc),
        out_shape=jax.ShapeDtypeStruct((NT, P, OUT), jnp.float32),
        grid=(n_pose, T),
        in_specs=[
            pl.BlockSpec(
                (1, D, K), lambda n, t: (n * T + t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, P, OUT), lambda n, t: (n * T + t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(rec)
