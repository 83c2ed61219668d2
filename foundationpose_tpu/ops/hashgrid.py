"""Multi-level hash-grid encoder (instant-NGP style), pure JAX + Pallas.

TPU-native replacement for the reference's torch-ngp CUDA extension
(bundlesdf/mycuda/torch_ngp_grid_encoder/gridencoder.cu:96-246 forward,
248-365 backward, grid.py:92-158 module). Semantics match the CUDA
kernel exactly:

* level scale  = 2^(level*S) * base - 1,  S = log2(finest/base)/(L-1)
* resolution   = ceil(scale) + 1
* sample pos   = x*scale + 0.5 (align_corners=False), trilinear corners
* index        = linear (stride res+1) when the level grid fits the
                 hashmap, else xor-prime fast_hash; modulo hashmap size
* out-of-[0,1] inputs produce zeros

TPU layout design: every big intermediate is (N, L*8) — with the default
16 levels that is exactly one 128-lane vector row per point, so nothing
gets tile-padded (naive (N, L, 8, C) layouts explode 16-64x in HBM and
OOM'd the NeRF step). Per-level reductions run as matmuls against a
static block-diagonal summing matrix (MXU), and the backward's
scatter-add uses the Pallas sorted-segment-add kernel
(ops/pallas_scatter.py) instead of XLA's serialized scatter.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import jax_config  # noqa: F401

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridCfg:
    n_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 32
    desired_resolution: int = 512
    log2_hashmap_size: int = 22
    # "oct": TPU-native layout — same index formula as "quad" but the
    #   rolled-copy table packs ALL EIGHT cell corners per row, so the
    #   forward gathers ONE row per (point, level): the NGP descriptor
    #   minimum (the TPU gather cost is per fetched slice, ~13-15
    #   ns/row on v5e, measured — nearly independent of row width).
    # "quad": hashed levels index (x + s*y + z*P) so the four
    #   (x, y)-plane corners sit in adjacent table rows; ONE 4-corner
    #   row fetch per (point, level, z-corner).
    # "cuda": index-exact torch-ngp semantics (gridencoder.cu:96-246),
    #   8 row fetches per point-level. The NeRF runner uses "oct";
    #   "cuda" is the default here so standalone uses keep
    #   reference-exact indexing.
    layout: str = "cuda"

    @property
    def per_level_scale(self) -> float:
        return float(
            np.exp2(
                np.log2(self.desired_resolution / self.base_resolution)
                / max(self.n_levels - 1, 1)
            )
        )

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.level_dim

    def level_tables(self):
        """Per-level (resolution, hashmap_size, offset) numpy arrays."""
        max_params = 2**self.log2_hashmap_size
        res, sizes, offsets = [], [], []
        offset = 0
        for lv in range(self.n_levels):
            scale = np.exp2(lv * np.log2(self.per_level_scale)) * self.base_resolution - 1.0
            resolution = int(np.ceil(scale)) + 1
            params = min(max_params, (resolution + 1) ** 3)
            params = int(np.ceil(params / 8) * 8)
            res.append(resolution)
            sizes.append(params)
            offsets.append(offset)
            offset += params
        return (
            np.array(res, np.int64),
            np.array(sizes, np.int64),
            np.array(offsets, np.int64),
            offset,
        )


def init_hashgrid(key, cfg: HashGridCfg):
    _, _, _, total = cfg.level_tables()
    return jax.random.uniform(
        key, (total, cfg.level_dim), jnp.float32, -1e-4, 1e-4
    )


def _level_scales(cfg: HashGridCfg):
    lv = np.arange(cfg.n_levels, dtype=np.float64)
    return (
        np.exp2(lv * np.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0
    ).astype(np.float32)


def _slot_constants(cfg: HashGridCfg):
    """Static per-slot (L*8 lanes) constants: scale, size, offset, dense
    flag, corner bits — each slot is (level, corner)."""
    res_np, sizes_np, offsets_np, total = cfg.level_tables()
    L = cfg.n_levels
    scales = np.repeat(_level_scales(cfg), 8)  # (L*8,)
    sizes = np.repeat(sizes_np, 8).astype(np.uint32)
    offsets = np.repeat(offsets_np, 8)
    strides = np.repeat(res_np + 1, 8).astype(np.uint32)
    dense = np.repeat(((res_np + 1) ** 3) <= sizes_np, 8)
    corner_bits = np.tile(
        np.array([[(i >> d) & 1 for d in range(3)] for i in range(8)]), (L, 1)
    )  # (L*8, 3)
    # Block-diagonal level-summing matrix: (L*8, L) with S[l*8+k, l] = 1.
    S = np.zeros((L * 8, L), np.float32)
    for l in range(L):
        S[l * 8 : (l + 1) * 8, l] = 1.0
    return scales, sizes, offsets, strides, dense, corner_bits, S, total


def _corner_data(x: jax.Array, cfg: HashGridCfg):
    """Per-(level, corner) slot data in flat (N, L*8) layout.

    Returns flat table indices (N, L*8) int32, trilinear weights
    (N, L*8), per-axis factors 3 x (N, L*8), and the oob mask (N,).
    """
    scales, sizes, offsets, strides, dense, corner_bits, _S, _tot = (
        _slot_constants(cfg)
    )
    x01 = (x + 1.0) / 2.0
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # (N,)

    pos = x01[:, :, None] * jnp.asarray(_level_scales(cfg))[None, None] + 0.5
    # pos: (N, 3, L) -> grid/frac per axis per level
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # (N, 3, L)
    pg = pos_grid.astype(jnp.uint32)

    bits = jnp.asarray(corner_bits.reshape(cfg.n_levels, 8, 3))  # (L, 8, 3)

    # Expand per axis to slot layout (N, L*8) without >2D minor dims:
    def slots(a):  # a: (N, 3, L) -> three (N, L*8) arrays per axis
        return [
            jnp.repeat(a[:, d, :], 8, axis=-1) for d in range(3)
        ]

    pg_s = slots(pg)  # 3 x (N, L8) uint32
    frac_s = slots(frac)  # 3 x (N, L8)
    bit_s = [
        jnp.asarray(corner_bits[:, d])[None].astype(jnp.uint32) for d in range(3)
    ]  # 3 x (1, L8)

    corner_pg = [pg_s[d] + bit_s[d] for d in range(3)]
    factors = [
        jnp.where(bit_s[d].astype(bool), frac_s[d], 1.0 - frac_s[d])
        for d in range(3)
    ]
    w = factors[0] * factors[1] * factors[2]  # (N, L8)

    strides_j = jnp.asarray(strides)[None]
    linear = (
        corner_pg[0]
        + corner_pg[1] * strides_j
        + corner_pg[2] * strides_j * strides_j
    )
    primes = jnp.asarray(_PRIMES)
    hashed = (
        corner_pg[0] * primes[0]
        ^ corner_pg[1] * primes[1]
        ^ corner_pg[2] * primes[2]
    )
    idx = jnp.where(jnp.asarray(dense)[None], linear, hashed) % jnp.asarray(sizes)[None]
    flat = idx.astype(jnp.int32) + jnp.asarray(offsets.astype(np.int32))[None]
    return flat, w, factors, oob


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode(embeddings: jax.Array, x: jax.Array, cfg: HashGridCfg) -> jax.Array:
    """x: (N, 3) in [-1, 1] (bound=1 like grid.py:147) -> (N, L*C).

    Output channel order matches the CUDA kernel: level-major, channel
    within level.
    """
    if cfg.layout == "oct":
        return _ocencode_fwd_impl(embeddings, x, cfg)
    if cfg.layout == "quad":
        return _qencode_fwd_impl(embeddings, x, cfg)
    return _encode_fwd_impl(embeddings, x, cfg)


# ----------------------------------------------------------------- quad
#
# TPU-native layout. Per level (resolution res, stride s = res + 1):
#     index(x, y, z) = (x + s*y + H(z)) mod size
#     H(z) = s^2 * z               when the level grid fits the hashmap
#          = z * 805459861         otherwise (z-scrambled, x/y linear:
#                                  in-plane corners NEVER collide)
# so the cell corners (x+{0,1}, y+{0,1}, z) occupy rows
# {i, i+1, i+s, i+s+1}. A per-step QUAD table with rows
#     quad[i] = [t[i] | t[i+1] | t[i+s] | t[i+s+1]]   (cyclic per level)
# built from 4 rolled copies (pure bandwidth, ~1 GB/s-scale) lets the
# forward fetch all four (x, y)-plane corners of a sample in ONE row:
# 2 fetches per (point, level) instead of 8. The backward segment-adds
# into quad-gradient rows and folds them back with the inverse rolls.


def _quad_slot_constants(cfg: HashGridCfg):
    """Static per-slot constants in the (L*2) slot layout (level-major,
    z-corner minor): scale, size, offset, stride, H-multiplier, zbit."""
    res_np, sizes_np, offsets_np, total = cfg.level_tables()
    L = cfg.n_levels
    strides = (res_np + 1).astype(np.uint32)
    dense = ((res_np + 1) ** 3) <= sizes_np
    # uint32 wraparound is exact: hashed level sizes are 2^log2_hashmap
    # (a power of two dividing 2^32), dense linear indices fit easily.
    hmul = np.where(dense, strides * strides, np.uint32(_PRIMES[2])).astype(
        np.uint32
    )
    scales = np.repeat(_level_scales(cfg), 2)
    sizes2 = np.repeat(sizes_np, 2).astype(np.uint32)
    offsets2 = np.repeat(offsets_np, 2)
    strides2 = np.repeat(strides, 2)
    hmul2 = np.repeat(hmul, 2)
    zbit = np.tile(np.array([0, 1], np.uint32), L)
    # level-sum matrix (L*2, L)
    S = np.zeros((L * 2, L), np.float32)
    for l in range(L):
        S[l * 2 : (l + 1) * 2, l] = 1.0
    return scales, sizes2, offsets2, strides2, hmul2, zbit, S, total


def build_quad_table(embeddings: jax.Array, cfg: HashGridCfg) -> jax.Array:
    """(total, C) -> (total, 4*C) bf16 rolled-copy quad table (per level).

    bf16 rows: the gather is descriptor-cost-dominated but 32-byte f32
    rows still fetch ~16% slower than 16-byte rows (measured on v5e);
    fp16-grade table reads are standard NGP practice. Master params
    stay f32 — only this per-step derived copy is narrowed."""
    res_np, sizes_np, offsets_np, _tot = cfg.level_tables()
    emb16 = embeddings.astype(jnp.bfloat16)
    segs = []
    for l in range(cfg.n_levels):
        off = int(offsets_np[l])
        size = int(sizes_np[l])
        s = int(res_np[l]) + 1
        t = jax.lax.dynamic_slice_in_dim(emb16, off, size, 0)
        segs.append(
            jnp.concatenate(
                [
                    t,
                    jnp.roll(t, -1, axis=0),
                    jnp.roll(t, -s, axis=0),
                    jnp.roll(t, -(s + 1), axis=0),
                ],
                axis=1,
            )
        )
    return jnp.concatenate(segs, axis=0)  # (total, 4C) bf16


def _quad_corner_data(x: jax.Array, cfg: HashGridCfg):
    """Per-(level, z-corner) slot data in flat (N, L*2) layout.

    Returns flat quad-row indices (N, L2) int32, per-axis interpolation
    fractions fx/fy (N, L2) and wz (N, L2), and the oob mask (N,)."""
    scales2, sizes2, offsets2, strides2, hmul2, zbit, _S, _tot = (
        _quad_slot_constants(cfg)
    )
    x01 = (x + 1.0) / 2.0
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # (N,)

    pos = x01[:, :, None] * jnp.asarray(_level_scales(cfg))[None, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # (N, 3, L)
    pg = pos_grid.astype(jnp.uint32)

    def slots2(a):  # (N, 3, L) -> per-axis (N, L*2)
        return [jnp.repeat(a[:, d, :], 2, axis=-1) for d in range(3)]

    pg_s = slots2(pg)
    frac_s = slots2(frac)
    zb = jnp.asarray(zbit)[None]  # (1, L2)
    lin = (
        pg_s[0]
        + pg_s[1] * jnp.asarray(strides2)[None]
        + (pg_s[2] + zb) * jnp.asarray(hmul2)[None]
    )
    idx = lin % jnp.asarray(sizes2)[None]
    flat = idx.astype(jnp.int32) + jnp.asarray(
        offsets2.astype(np.int32)
    )[None]  # (N, L2)
    fx, fy, fz = frac_s
    wz = jnp.where(zb.astype(bool), fz, 1.0 - fz)  # (N, L2)
    return flat, fx, fy, wz, oob


def _quad_gather_reduce(quad, flat, fx, fy, wz, oob, cfg):
    """Row-gather quad rows and trilerp on the VPU + one level-sum
    matmul. Returns the encoding (N, L*C) and the per-(corner, channel)
    value planes (4*C, N, L2) for the backward."""
    N, L2 = flat.shape
    C = cfg.level_dim
    S_j = jnp.asarray(_quad_slot_constants(cfg)[6])
    vals = quad[flat.reshape(-1)]  # (M2, 4C) bf16 row gather
    planes = jnp.stack(
        [vals[:, p].reshape(N, L2) for p in range(4 * C)], axis=0
    )  # (4C, N, L2) bf16: p = q * C + c, corner order [00, 10, 01, 11]
    wq = [
        (1.0 - fx) * (1.0 - fy),
        fx * (1.0 - fy),
        (1.0 - fx) * fy,
        fx * fy,
    ]
    outs = []
    for c in range(C):
        acc = jnp.zeros((N, L2), jnp.float32)
        for q in range(4):
            acc = acc + wq[q] * planes[q * C + c].astype(jnp.float32)
        outs.append(
            jnp.dot(acc * wz, S_j, preferred_element_type=jnp.float32)
        )  # (N, L)
    out = jnp.stack(outs, axis=-1).reshape(N, cfg.out_dim)
    return jnp.where(oob[:, None], 0.0, out), planes


@partial(jax.jit, static_argnames=("cfg",))
def _qencode_fwd_impl(embeddings, x, cfg):
    quad = build_quad_table(embeddings, cfg)
    flat, fx, fy, wz, oob = _quad_corner_data(x, cfg)
    out, _planes = _quad_gather_reduce(quad, flat, fx, fy, wz, oob, cfg)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _qencode_fwd_res(embeddings, x, cfg):
    quad = build_quad_table(embeddings, cfg)
    flat, fx, fy, wz, oob = _quad_corner_data(x, cfg)
    out, planes = _quad_gather_reduce(quad, flat, fx, fy, wz, oob, cfg)
    return out, planes


@partial(jax.jit, static_argnames=("cfg", "table_size"))
def _qencode_bwd_impl(cfg, table_size, x, planes, g):
    from .pallas_scatter import sorted_segment_add_planes

    scales2, sizes2, offsets2, strides2, _hmul2, _zbit, S, _tot = (
        _quad_slot_constants(cfg)
    )
    N = x.shape[0]
    L = cfg.n_levels
    C = cfg.level_dim
    flat, fx, fy, wz, oob = _quad_corner_data(x, cfg)
    g_masked = jnp.where(oob[:, None], 0.0, g)  # (N, L*C)
    g_lc = g_masked.reshape(N, L, C)
    S_j = jnp.asarray(S)  # (L2, L)
    g_slots = [
        jnp.dot(g_lc[:, :, c], S_j.T, preferred_element_type=jnp.float32)
        for c in range(C)
    ]  # C x (N, L2)

    wq = [
        (1.0 - fx) * (1.0 - fy),
        fx * (1.0 - fy),
        (1.0 - fx) * fy,
        fx * fy,
    ]

    # --- d quad rows -> segment-add -> fold rolls back to d embeddings
    idx_flat = jnp.where(oob[:, None], jnp.int32(table_size), flat).reshape(-1)
    upd = jnp.stack(
        [
            (wz * wq[q] * g_slots[c]).reshape(-1)
            for q in range(4)
            for c in range(C)
        ],
        axis=0,
    )  # (4C, M2)
    dq = sorted_segment_add_planes(idx_flat, upd, table_size)  # (T, 4C)

    res_np, sizes_np, offsets_np, _ = cfg.level_tables()
    d_segs = []
    for l in range(cfg.n_levels):
        off = int(offsets_np[l])
        size = int(sizes_np[l])
        s = int(res_np[l]) + 1
        dql = jax.lax.dynamic_slice_in_dim(dq, off, size, 0)  # (S, 4C)
        d_segs.append(
            dql[:, 0 * C : 1 * C]
            + jnp.roll(dql[:, 1 * C : 2 * C], 1, axis=0)
            + jnp.roll(dql[:, 2 * C : 3 * C], s, axis=0)
            + jnp.roll(dql[:, 3 * C : 4 * C], s + 1, axis=0)
        )
    d_emb = jnp.concatenate(d_segs, axis=0)

    # --- d x: analytic trilinear derivative, dpos/dx = scale / 2
    ve_g = []  # per corner q: sum_c planes * g
    for q in range(4):
        acc = jnp.zeros_like(fx)
        for c in range(C):
            acc = acc + planes[q * C + c].astype(jnp.float32) * g_slots[c]
        ve_g.append(acc)
    scale_slot = jnp.asarray(scales2)[None] / 2.0  # (1, L2)
    dfx = wz * ((1.0 - fy) * (ve_g[1] - ve_g[0]) + fy * (ve_g[3] - ve_g[2]))
    dfy = wz * ((1.0 - fx) * (ve_g[2] - ve_g[0]) + fx * (ve_g[3] - ve_g[1]))
    zsign = jnp.asarray(
        np.where(_quad_slot_constants(cfg)[5] > 0, 1.0, -1.0).astype(np.float32)
    )[None]
    sq = jnp.zeros_like(fx)
    for q in range(4):
        sq = sq + wq[q] * ve_g[q]
    dfz = zsign * sq
    d_x = jnp.stack(
        [
            jnp.sum(dfx * scale_slot, axis=1),
            jnp.sum(dfy * scale_slot, axis=1),
            jnp.sum(dfz * scale_slot, axis=1),
        ],
        axis=-1,
    )
    d_x = jnp.where(oob[:, None], 0.0, d_x).astype(x.dtype)
    return d_emb, d_x


# ----------------------------------------------------------------- oct
#
# One fetch per (point, level) — the NGP descriptor minimum. Same index
# formula as the quad layout (x + s*y + H(z), H = s^2 z dense /
# z*805459861 hashed), but the table packs ALL EIGHT cell corners of
# base index i in one (8*C)-wide bf16 row via 8 rolled copies:
#     oct[i] = [t[i+d] for d in (0, 1, s, s+1, h, h+1, h+s, h+s+1)]
# (shifts mod size; h = the level's z multiplier). The TPU gather cost
# is per fetched row, nearly independent of row width (13-15 ns/row
# measured on v5e), so halving descriptors vs quad ~halves the
# hash-grid forward. The backward segment-adds per LEVEL: flat indices
# in slot-major (L, N) rows are each confined to level l's disjoint,
# ascending table segment, so a BATCHED per-row sort concatenates into
# a globally sorted stream with no merge (sorted_segment_add_leveled).


def _oct_slot_constants(cfg: HashGridCfg):
    """Static per-level constants: scale, size, offset, stride, the
    z-corner row shift h (s^2 dense / prime hashed), level-start rows."""
    res_np, sizes_np, offsets_np, total = cfg.level_tables()
    strides = (res_np + 1).astype(np.uint32)
    dense = ((res_np + 1) ** 3) <= sizes_np
    hmul = np.where(dense, strides * strides, np.uint32(_PRIMES[2])).astype(
        np.uint32
    )
    return (
        _level_scales(cfg),
        sizes_np.astype(np.uint32),
        offsets_np,
        strides,
        hmul,
        total,
    )


def _oct_shifts(cfg: HashGridCfg):
    """Per level: the eight corner row shifts, mod the level size.
    Corner order q = dz*4 + dy*2 + dx (matches _oct_gather_reduce)."""
    res_np, sizes_np, _offsets, _total = cfg.level_tables()
    dense = ((res_np + 1) ** 3) <= sizes_np
    out = []
    for l in range(cfg.n_levels):
        s = int(res_np[l]) + 1
        h = s * s if dense[l] else int(_PRIMES[2])
        size = int(sizes_np[l])
        out.append([(dz * h + dy * s + dx) % size
                    for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)])
    return out


def build_oct_table(embeddings: jax.Array, cfg: HashGridCfg) -> jax.Array:
    """(total, C) -> (total, 8*C) bf16 rolled-copy oct table (per level).

    Like build_quad_table but all eight corners: a pure-bandwidth
    derived copy rebuilt each step (~2 GB/s-scale traffic at the NeRF
    config); master params stay f32."""
    res_np, sizes_np, offsets_np, _tot = cfg.level_tables()
    emb16 = embeddings.astype(jnp.bfloat16)
    shifts = _oct_shifts(cfg)
    segs = []
    for l in range(cfg.n_levels):
        off = int(offsets_np[l])
        size = int(sizes_np[l])
        t = jax.lax.dynamic_slice_in_dim(emb16, off, size, 0)
        segs.append(
            jnp.concatenate(
                [jnp.roll(t, -sh, axis=0) for sh in shifts[l]], axis=1
            )
        )
    return jnp.concatenate(segs, axis=0)  # (total, 8C) bf16


def _oct_corner_data(x: jax.Array, cfg: HashGridCfg):
    """Per-level slot data in flat (N, L) layout.

    Returns flat base-corner table rows (N, L) int32, per-axis
    interpolation fractions fx/fy/fz (N, L), and the oob mask (N,)."""
    scales, sizes_np, offsets_np, strides, hmul, _tot = _oct_slot_constants(cfg)
    x01 = (x + 1.0) / 2.0
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # (N,)

    pos = x01[:, :, None] * jnp.asarray(_level_scales(cfg))[None, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # (N, 3, L)
    pg = pos_grid.astype(jnp.uint32)

    # uint32 wraparound is exact: hashed level sizes are powers of two
    # dividing 2^32, dense linear indices fit without wraparound.
    lin = (
        pg[:, 0, :]
        + pg[:, 1, :] * jnp.asarray(strides)[None]
        + pg[:, 2, :] * jnp.asarray(hmul)[None]
    )
    idx = lin % jnp.asarray(sizes_np)[None]
    flat = idx.astype(jnp.int32) + jnp.asarray(
        offsets_np.astype(np.int32)
    )[None]  # (N, L)
    return flat, frac[:, 0, :], frac[:, 1, :], frac[:, 2, :], oob


def _oct_weights(fx, fy, fz):
    """Eight trilinear corner weights, order q = dz*4 + dy*2 + dx."""
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    return [
        wz[dz] * wy[dy] * wx[dx]
        for dz in (0, 1)
        for dy in (0, 1)
        for dx in (0, 1)
    ]


def _oct_gather_reduce(oct_t, flat, fx, fy, fz, oob, cfg):
    """Row-gather oct rows and trilerp on the VPU. Returns the encoding
    (N, L*C) and the per-(corner, channel) value planes (8*C, N, L) for
    the backward. No level-sum matmul: with one slot per level the
    weighted sum IS the level output."""
    N, L = flat.shape
    C = cfg.level_dim
    vals = oct_t[flat.reshape(-1)]  # (N*L, 8C) bf16 row gather
    planes = jnp.stack(
        [vals[:, p].reshape(N, L) for p in range(8 * C)], axis=0
    )  # (8C, N, L) bf16: p = q * C + c
    w8 = _oct_weights(fx, fy, fz)
    outs = []
    for c in range(C):
        acc = jnp.zeros((N, L), jnp.float32)
        for q in range(8):
            acc = acc + w8[q] * planes[q * C + c].astype(jnp.float32)
        outs.append(acc)
    out = jnp.stack(outs, axis=-1).reshape(N, cfg.out_dim)
    return jnp.where(oob[:, None], 0.0, out), planes


@partial(jax.jit, static_argnames=("cfg",))
def _ocencode_fwd_impl(embeddings, x, cfg):
    oct_t = build_oct_table(embeddings, cfg)
    flat, fx, fy, fz, oob = _oct_corner_data(x, cfg)
    out, _planes = _oct_gather_reduce(oct_t, flat, fx, fy, fz, oob, cfg)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _ocencode_fwd_res(embeddings, x, cfg):
    oct_t = build_oct_table(embeddings, cfg)
    flat, fx, fy, fz, oob = _oct_corner_data(x, cfg)
    out, planes = _oct_gather_reduce(oct_t, flat, fx, fy, fz, oob, cfg)
    return out, planes


@partial(jax.jit, static_argnames=("cfg", "table_size"))
def _ocencode_bwd_impl(cfg, table_size, x, planes, g):
    from .pallas_scatter import factored_segment_add

    scales, sizes_np, offsets_np, _strides, _hmul, _tot = _oct_slot_constants(
        cfg
    )
    N = x.shape[0]
    L = cfg.n_levels
    C = cfg.level_dim
    flat, fx, fy, fz, oob = _oct_corner_data(x, cfg)
    g_masked = jnp.where(oob[:, None], 0.0, g)  # (N, L*C)
    g_lc = g_masked.reshape(N, L, C)
    g_slots = [g_lc[:, :, c] for c in range(C)]  # C x (N, L)
    w8 = _oct_weights(fx, fy, fz)

    # --- d oct rows -> factored leveled segment-add -> fold rolls back.
    # The update for row flat[n, l] is the OUTER PRODUCT w8[q] *
    # g_slots[c]; factored_segment_add sorts only the factors (8 weight
    # + 2C cotangent planes instead of 2*8*C expanded hi/lo planes) and
    # expands per chunk inside the kernel — the sort is the backward's
    # dominant cost. oob rows: point the index at the level's own first
    # row (updates are already zeroed) so each (L, N) row stays within
    # its level segment for the batched sort.
    off_l = jnp.asarray(offsets_np.astype(np.int32))[None]  # (1, L)
    idx_lv = jnp.where(oob[:, None], off_l, flat).T  # (L, N)
    w_planes = jnp.stack([w8[q].T for q in range(8)], axis=0)  # (8, L, N)
    g_planes = jnp.stack([g_slots[c].T for c in range(C)], axis=0)
    # row-major dq: XLA fuses the kernel-output transpose into the
    # slice+roll+concat fold below (measured faster than folding the
    # kernel's channel-major layout with 1D row slices).
    dq = factored_segment_add(
        idx_lv, w_planes, g_planes, table_size
    )  # (T, 8C), rows q*C+c

    shifts = _oct_shifts(cfg)
    d_segs = []
    for l in range(cfg.n_levels):
        off = int(offsets_np[l])
        size = int(sizes_np[l])
        dql = jax.lax.dynamic_slice_in_dim(dq, off, size, 0)  # (S, 8C)
        acc = dql[:, 0:C]  # shift 0
        for q in range(1, 8):
            acc = acc + jnp.roll(
                dql[:, q * C : (q + 1) * C], shifts[l][q], axis=0
            )
        d_segs.append(acc)
    d_emb = jnp.concatenate(d_segs, axis=0)

    # --- d x: analytic trilinear derivative, dpos/dx = scale / 2
    ve_g = []  # per corner q: sum_c planes * g
    for q in range(8):
        acc = jnp.zeros_like(fx)
        for c in range(C):
            acc = acc + planes[q * C + c].astype(jnp.float32) * g_slots[c]
        ve_g.append(acc)
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)

    def corner(dz, dy, dx):
        return ve_g[dz * 4 + dy * 2 + dx]

    dfx = sum(
        wz[dz] * wy[dy] * (corner(dz, dy, 1) - corner(dz, dy, 0))
        for dz in (0, 1)
        for dy in (0, 1)
    )
    dfy = sum(
        wz[dz] * wx[dx] * (corner(dz, 1, dx) - corner(dz, 0, dx))
        for dz in (0, 1)
        for dx in (0, 1)
    )
    dfz = sum(
        wy[dy] * wx[dx] * (corner(1, dy, dx) - corner(0, dy, dx))
        for dy in (0, 1)
        for dx in (0, 1)
    )
    scale_l = jnp.asarray(_level_scales(cfg))[None] / 2.0  # (1, L)
    d_x = jnp.stack(
        [
            jnp.sum(dfx * scale_l, axis=1),
            jnp.sum(dfy * scale_l, axis=1),
            jnp.sum(dfz * scale_l, axis=1),
        ],
        axis=-1,
    )
    d_x = jnp.where(oob[:, None], 0.0, d_x).astype(x.dtype)
    return d_emb, d_x


def _gather_and_reduce(embeddings, flat, w, oob, cfg):
    """Row-gather corner embeddings and level-sum them on the MXU.

    Row gathers ((total, C) rows) are ~2.4x faster than per-channel plane
    gathers on TPU; the gathered (M, C) tensor is consumed immediately
    (XLA fuses it — storing it would tile-pad 64x). Returns the encoding
    (N, L*C) and the gathered values as channel planes (C, N, L8) for the
    backward pass.
    """
    N = flat.shape[0]
    L8 = flat.shape[1]
    S_j = jnp.asarray(_slot_constants(cfg)[6])
    vals = embeddings[flat.reshape(-1)]  # (M, C) row gather, fused
    planes = jnp.stack(
        [vals[:, c].reshape(N, L8) for c in range(cfg.level_dim)], axis=0
    )  # (C, N, L8) — safe layout for residual storage
    outs = [
        jnp.dot(planes[c] * w, S_j, preferred_element_type=jnp.float32)
        for c in range(cfg.level_dim)
    ]
    out = jnp.stack(outs, axis=-1).reshape(N, cfg.out_dim)
    return jnp.where(oob[:, None], 0.0, out), planes


@partial(jax.jit, static_argnames=("cfg",))
def _encode_fwd_impl(embeddings, x, cfg):
    flat, w, _factors, oob = _corner_data(x, cfg)
    out, _planes = _gather_and_reduce(embeddings, flat, w, oob, cfg)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _encode_fwd_res(embeddings, x, cfg):
    flat, w, _factors, oob = _corner_data(x, cfg)
    out, planes = _gather_and_reduce(embeddings, flat, w, oob, cfg)
    return out, planes


def _encode_fwd(embeddings, x, cfg):
    if cfg.layout == "oct":
        out, planes = _ocencode_fwd_res(embeddings, x, cfg)
    elif cfg.layout == "quad":
        out, planes = _qencode_fwd_res(embeddings, x, cfg)
    else:
        out, planes = _encode_fwd_res(embeddings, x, cfg)
    return out, (embeddings.shape[0], x, planes)


@partial(jax.jit, static_argnames=("cfg", "table_size"))
def _encode_bwd_impl(cfg, table_size, x, planes, g):
    from .pallas_scatter import sorted_segment_add_planes

    scales_s, _sizes, _offs, _strides, _dense, corner_bits, S, _tot = (
        _slot_constants(cfg)
    )
    N = x.shape[0]
    L = cfg.n_levels
    C = cfg.level_dim
    flat, w, factors, oob = _corner_data(x, cfg)
    g_masked = jnp.where(oob[:, None], 0.0, g)  # (N, L*C)
    g_lc = g_masked.reshape(N, L, C)
    S_j = jnp.asarray(S)  # (L8, L)
    g_slots = [
        jnp.dot(g_lc[:, :, c], S_j.T, preferred_element_type=jnp.float32)
        for c in range(C)
    ]  # C x (N, L8)

    # --- d embeddings: per-channel planes, one flat segment-add
    # (Pallas kernel; XLA scatter would serialize).
    idx_flat = jnp.where(oob[:, None], jnp.int32(table_size), flat).reshape(-1)
    upd = jnp.stack([(w * g_slots[c]).reshape(-1) for c in range(C)], axis=0)
    d_emb = sorted_segment_add_planes(idx_flat, upd, table_size)

    # --- d x: analytic trilinear derivative (dpos/dx = scale / 2),
    # reusing the forward's gathered corner values (no second gather).
    ve_g = jnp.zeros_like(w)
    for c in range(C):
        ve_g = ve_g + planes[c] * g_slots[c]
    scale_slot = jnp.asarray(scales_s)[None] / 2.0  # (1, L8)
    signs = [
        jnp.asarray(np.where(corner_bits[:, d] > 0, 1.0, -1.0).astype(np.float32))[None]
        for d in range(3)
    ]
    o01 = factors[1] * factors[2]
    o02 = factors[0] * factors[2]
    o03 = factors[0] * factors[1]
    dxs = [
        jnp.sum(ve_g * signs[0] * o01 * scale_slot, axis=1),
        jnp.sum(ve_g * signs[1] * o02 * scale_slot, axis=1),
        jnp.sum(ve_g * signs[2] * o03 * scale_slot, axis=1),
    ]
    d_x = jnp.stack(dxs, axis=-1)
    d_x = jnp.where(oob[:, None], 0.0, d_x).astype(x.dtype)
    return d_emb, d_x


def _encode_bwd(cfg, res, g):
    table_size, x, planes = res
    if cfg.layout == "oct":
        d_emb, d_x = _ocencode_bwd_impl(cfg, table_size, x, planes, g)
    elif cfg.layout == "quad":
        d_emb, d_x = _qencode_bwd_impl(cfg, table_size, x, planes, g)
    else:
        d_emb, d_x = _encode_bwd_impl(cfg, table_size, x, planes, g)
    return d_emb, d_x


hashgrid_encode.defvjp(_encode_fwd, _encode_bwd)
