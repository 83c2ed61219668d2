import numpy as np
import jax
import jax.numpy as jnp

from foundationpose_tpu.ops.hashgrid import (
    HashGridCfg,
    hashgrid_encode,
    init_hashgrid,
)

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def reference_encode(embeddings, x, cfg):
    """Straight numpy port of the CUDA kernel semantics
    (gridencoder.cu:96-195) for testing."""
    x01 = (np.asarray(x) + 1.0) / 2.0
    res_np, sizes_np, offsets_np, _ = cfg.level_tables()
    out = np.zeros((len(x01), cfg.out_dim), np.float32)
    S = np.log2(cfg.per_level_scale)
    for n in range(len(x01)):
        if np.any((x01[n] < 0) | (x01[n] > 1)):
            continue
        for lv in range(cfg.n_levels):
            scale = np.exp2(lv * S) * cfg.base_resolution - 1.0
            resolution = int(np.ceil(scale)) + 1
            pos = x01[n] * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            acc = np.zeros(cfg.level_dim, np.float32)
            dense = (resolution + 1) ** 3 <= sizes_np[lv]
            for c in range(8):
                w = 1.0
                cp = pg.copy()
                for d in range(3):
                    if (c >> d) & 1:
                        w *= frac[d]
                        cp[d] += 1
                    else:
                        w *= 1 - frac[d]
                if dense:
                    idx = cp[0] + cp[1] * (resolution + 1) + cp[2] * (resolution + 1) ** 2
                else:
                    idx = np.uint64(0)
                    for d in range(3):
                        idx ^= np.uint64((cp[d] * PRIMES[d]) % (1 << 32))
                idx = int(idx % np.uint64(sizes_np[lv]))
                acc += w * embeddings[offsets_np[lv] + idx]
            out[n, lv * cfg.level_dim : (lv + 1) * cfg.level_dim] = acc
    return out


class TestHashGrid:
    cfg = HashGridCfg(
        n_levels=4, level_dim=2, base_resolution=4, desired_resolution=32,
        log2_hashmap_size=10,
    )

    def test_matches_reference(self):
        key = jax.random.PRNGKey(0)
        emb = np.asarray(init_hashgrid(key, self.cfg))
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
        got = np.asarray(hashgrid_encode(jnp.asarray(emb), jnp.asarray(x), self.cfg))
        want = reference_encode(emb, x, self.cfg)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_out_of_bounds_zero(self):
        key = jax.random.PRNGKey(1)
        emb = init_hashgrid(key, self.cfg)
        x = jnp.array([[1.5, 0.0, 0.0], [0.0, -2.0, 0.5]])
        out = np.asarray(hashgrid_encode(emb, x, self.cfg))
        np.testing.assert_allclose(out, 0.0)

    def test_continuity(self):
        """Encoding is continuous: tiny input changes -> tiny output changes."""
        key = jax.random.PRNGKey(2)
        emb = init_hashgrid(key, self.cfg)
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.9, 0.9, (16, 3)).astype(np.float32)
        a = np.asarray(hashgrid_encode(emb, jnp.asarray(x), self.cfg))
        b = np.asarray(hashgrid_encode(emb, jnp.asarray(x + 1e-5), self.cfg))
        assert np.abs(a - b).max() < 1e-3

    def test_gradient_flows_to_embeddings(self):
        key = jax.random.PRNGKey(3)
        emb = init_hashgrid(key, self.cfg)
        x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (8, 3)), jnp.float32)

        def loss(e):
            return jnp.sum(hashgrid_encode(e, x, self.cfg) ** 2)

        g = jax.grad(loss)(emb)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_gradient_matches_finite_difference(self):
        key = jax.random.PRNGKey(4)
        emb = init_hashgrid(key, self.cfg)
        x = jnp.asarray([[0.2, -0.3, 0.4]], jnp.float32)

        def loss(e):
            return jnp.sum(hashgrid_encode(e, x, self.cfg))

        g = np.asarray(jax.grad(loss)(emb))
        # check a few nonzero entries by FD
        nz = np.argwhere(np.abs(g) > 1e-8)[:5]
        emb_np = np.asarray(emb)
        for i, j in nz:
            eps = 1e-3
            ep = emb_np.copy()
            ep[i, j] += eps
            em = emb_np.copy()
            em[i, j] -= eps
            fd = (
                float(loss(jnp.asarray(ep))) - float(loss(jnp.asarray(em)))
            ) / (2 * eps)
            np.testing.assert_allclose(g[i, j], fd, rtol=1e-2, atol=1e-4)

    def test_full_size_config_shapes(self):
        cfg = HashGridCfg()  # 16 levels, 2 ch, 2^22 entries
        _, _, _, total = cfg.level_tables()
        assert cfg.out_dim == 32
        assert total > 2**22  # multiple saturated levels
