"""Multi-level hash-grid encoder (instant-NGP style), pure JAX.

TPU-native replacement for the reference's torch-ngp CUDA extension
(bundlesdf/mycuda/torch_ngp_grid_encoder/gridencoder.cu:96-246 forward,
grid.py:92-158 module). Semantics match the CUDA kernel exactly:

* level scale  = 2^(level*S) * base - 1,  S = log2(finest/base)/(L-1)
* resolution   = ceil(scale) + 1
* sample pos   = x*scale + 0.5 (align_corners=False), trilinear corners
* index        = linear (stride res+1) when the level grid fits the
                 hashmap, else xor-prime fast_hash; modulo hashmap size
* out-of-[0,1] inputs produce zeros

The backward pass (scatter-add into embeddings, gridencoder.cu:248-365)
falls out of JAX autodiff of the gather — XLA emits the same scatter-add.
Embeddings live in ONE flat (total_params, C) table with per-level
offsets, so the whole encoder is a single vmap over levels.
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


@partial(jax.jit, static_argnames=("cfg",))
def hashgrid_encode(embeddings: jax.Array, x: jax.Array, cfg: HashGridCfg) -> jax.Array:
    """x: (N, 3) in [-1, 1] (bound=1 like grid.py:147) -> (N, L*C)."""
    x01 = (x + 1.0) / 2.0
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # (N,)

    res_np, sizes_np, offsets_np, _ = cfg.level_tables()
    scales = jnp.asarray(_level_scales(cfg))  # (L,)
    resolutions = jnp.asarray(res_np, jnp.uint32)
    sizes = jnp.asarray(sizes_np, jnp.uint32)
    offsets = jnp.asarray(offsets_np, jnp.int64)
    # A level uses the dense linear index iff (res+1)^3 fits its hashmap
    # (the CUDA kernel hashes when stride > hashmap_size, gridencoder.cu:67).
    dense = jnp.asarray(((res_np + 1).astype(np.int64) ** 3) <= sizes_np.astype(np.int64))

    primes = jnp.asarray(_PRIMES)

    # Corner offsets (8, 3)
    corners = jnp.asarray(
        [[(i >> d) & 1 for d in range(3)] for i in range(8)], jnp.uint32
    )

    def encode_level(scale, resolution, size, offset, is_dense):
        pos = x01 * scale + 0.5  # (N, 3), align_corners=False
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pg = pos_grid.astype(jnp.uint32)  # (N, 3)

        corner_pg = pg[:, None, :] + corners[None]  # (N, 8, 3)
        # trilinear weights
        w = jnp.prod(
            jnp.where(corners[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :]),
            axis=-1,
        )  # (N, 8)

        stride = resolution + 1
        linear = (
            corner_pg[..., 0]
            + corner_pg[..., 1] * stride
            + corner_pg[..., 2] * stride * stride
        )
        hashed = (
            corner_pg[..., 0] * primes[0]
            ^ corner_pg[..., 1] * primes[1]
            ^ corner_pg[..., 2] * primes[2]
        )
        idx = jnp.where(is_dense, linear, hashed) % size  # (N, 8) uint32
        flat = idx.astype(jnp.int64) + offset
        vals = embeddings[flat]  # (N, 8, C)
        return jnp.sum(vals * w[..., None], axis=1)  # (N, C)

    per_level = jax.vmap(encode_level, in_axes=(0, 0, 0, 0, 0), out_axes=1)(
        scales, resolutions, sizes, offsets, dense
    )  # (N, L, C)
    out = per_level.reshape(x.shape[0], cfg.out_dim)
    return jnp.where(oob[:, None], 0.0, out)
