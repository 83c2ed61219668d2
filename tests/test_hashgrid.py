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


class TestCustomVJP:
    cfg = HashGridCfg(
        n_levels=4, level_dim=2, base_resolution=4, desired_resolution=32,
        log2_hashmap_size=10,
    )

    def _autodiff_reference(self, emb, x, g):
        """Plain-autodiff gradients of an uncustomized re-encode."""
        from foundationpose_tpu.ops.hashgrid import _encode_fwd_impl

        def f(e, xx):
            return jnp.vdot(_encode_fwd_impl(e, xx, self.cfg), g)

        return jax.grad(f, argnums=(0, 1))(emb, x)

    def test_grad_embeddings_matches_autodiff(self):
        emb = init_hashgrid(jax.random.PRNGKey(0), self.cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-0.95, 0.95, (64, 3)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((64, self.cfg.out_dim)), jnp.float32)

        def f(e, xx):
            return jnp.vdot(hashgrid_encode(e, xx, self.cfg), g)

        de, dx = jax.grad(f, argnums=(0, 1))(emb, x)
        de_ref, dx_ref = self._autodiff_reference(emb, x, g)
        # atol covers true zeros; rtol covers f32 accumulation-order
        # differences between the Pallas segment-add and XLA's autodiff
        # sum on O(1) gradient values (observed rel diff up to ~6e-6).
        np.testing.assert_allclose(
            np.asarray(de), np.asarray(de_ref), atol=1e-5, rtol=2e-5
        )
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-3, rtol=1e-3)

    def test_grad_x_finite_difference(self):
        emb = init_hashgrid(jax.random.PRNGKey(1), self.cfg)
        x = jnp.asarray([[0.21, -0.33, 0.47]], jnp.float32)
        g = jnp.ones((1, self.cfg.out_dim), jnp.float32)

        def f(xx):
            return float(jnp.vdot(hashgrid_encode(emb, xx, self.cfg), g))

        dx = np.asarray(jax.grad(
            lambda xx: jnp.vdot(hashgrid_encode(emb, xx, self.cfg), g)
        )(x))[0]
        eps = 1e-3
        for d in range(3):
            xp = np.asarray(x).copy(); xp[0, d] += eps
            xm = np.asarray(x).copy(); xm[0, d] -= eps
            fd = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
            np.testing.assert_allclose(dx[d], fd, rtol=5e-2, atol=1e-3)

    def test_oob_gradients_zero(self):
        emb = init_hashgrid(jax.random.PRNGKey(2), self.cfg)
        x = jnp.asarray([[1.5, 0.0, 0.0]], jnp.float32)

        def f(e, xx):
            return jnp.sum(hashgrid_encode(e, xx, self.cfg))

        de, dx = jax.grad(f, argnums=(0, 1))(emb, x)
        assert float(jnp.abs(de).sum()) == 0.0
        assert float(jnp.abs(dx).sum()) == 0.0


def reference_encode_quad(embeddings, x, cfg):
    """Naive per-corner port of the QUAD layout's index formula
    (x + s*y + H(z), H = s^2 z dense / z*805459861 hashed) — checks the
    rolled-table machinery against direct corner addressing."""
    import dataclasses

    assert cfg.layout in ("quad", "oct")  # identical index formula
    # the quad table is a bf16 derived copy — pre-round the values
    embeddings = np.asarray(
        jnp.asarray(embeddings).astype(jnp.bfloat16).astype(jnp.float32)
    )
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
            s = resolution + 1
            dense = s**3 <= sizes_np[lv]
            hmul = s * s if dense else 805459861
            pos = x01[n] * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            acc = np.zeros(cfg.level_dim, np.float32)
            for c in range(8):
                w = 1.0
                cp = pg.copy()
                for d in range(3):
                    if (c >> d) & 1:
                        w *= frac[d]
                        cp[d] += 1
                    else:
                        w *= 1 - frac[d]
                lin = (cp[0] + cp[1] * s + cp[2] * np.uint64(hmul)) % (1 << 32)
                idx = int(lin % np.uint64(sizes_np[lv]))
                acc += w * embeddings[offsets_np[lv] + idx]
            out[n, lv * cfg.level_dim : (lv + 1) * cfg.level_dim] = acc
    return out


class TestQuadLayout:
    cfg = HashGridCfg(
        n_levels=4, level_dim=2, base_resolution=4, desired_resolution=32,
        log2_hashmap_size=10, layout="quad",
    )

    def test_matches_naive_quad_reference(self):
        emb = np.asarray(init_hashgrid(jax.random.PRNGKey(0), self.cfg))
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (48, 3)).astype(np.float32)
        got = np.asarray(
            hashgrid_encode(jnp.asarray(emb), jnp.asarray(x), self.cfg)
        )
        want = reference_encode_quad(emb, x, self.cfg)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_full_size_levels(self):
        """Mixed dense/hashed levels at a bigger config still match."""
        cfg = HashGridCfg(
            n_levels=6, level_dim=2, base_resolution=4,
            desired_resolution=64, log2_hashmap_size=12, layout="quad",
        )
        emb = np.asarray(init_hashgrid(jax.random.PRNGKey(1), cfg))
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
        got = np.asarray(hashgrid_encode(jnp.asarray(emb), jnp.asarray(x), cfg))
        want = reference_encode_quad(emb, x, cfg)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_continuity(self):
        emb = init_hashgrid(jax.random.PRNGKey(2), self.cfg)
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.9, 0.9, (16, 3)).astype(np.float32)
        a = np.asarray(hashgrid_encode(emb, jnp.asarray(x), self.cfg))
        b = np.asarray(hashgrid_encode(emb, jnp.asarray(x + 1e-5), self.cfg))
        assert np.abs(a - b).max() < 1e-3

    def test_oob_zero_and_grads_zero(self):
        emb = init_hashgrid(jax.random.PRNGKey(3), self.cfg)
        x = jnp.asarray([[1.5, 0.0, 0.0]], jnp.float32)
        assert float(jnp.abs(hashgrid_encode(emb, x, self.cfg)).sum()) == 0.0
        de, dx = jax.grad(
            lambda e, xx: jnp.sum(hashgrid_encode(e, xx, self.cfg)),
            argnums=(0, 1),
        )(emb, x)
        assert float(jnp.abs(de).sum()) == 0.0
        assert float(jnp.abs(dx).sum()) == 0.0

    def test_vjp_matches_autodiff(self):
        """Custom backward (segment-add + inverse rolls, analytic d_x)
        against plain autodiff of the uncustomized forward."""
        from foundationpose_tpu.ops.hashgrid import _qencode_fwd_impl

        emb = init_hashgrid(jax.random.PRNGKey(4), self.cfg)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-0.95, 0.95, (64, 3)), jnp.float32)
        g = jnp.asarray(
            rng.standard_normal((64, self.cfg.out_dim)), jnp.float32
        )

        de, dx = jax.grad(
            lambda e, xx: jnp.vdot(hashgrid_encode(e, xx, self.cfg), g),
            argnums=(0, 1),
        )(emb, x)
        de_ref, dx_ref = jax.grad(
            lambda e, xx: jnp.vdot(_qencode_fwd_impl(e, xx, self.cfg), g),
            argnums=(0, 1),
        )(emb, x)
        # plain autodiff rounds cotangents to bf16 through the quad
        # table's cast; the custom backward keeps them f32 — tolerances
        # reflect that (custom is the more accurate of the two)
        np.testing.assert_allclose(
            np.asarray(de), np.asarray(de_ref), atol=5e-2, rtol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(dx_ref), atol=5e-2, rtol=1e-2
        )


class TestPallasSegmentAdd:
    def test_matches_scatter(self):
        from foundationpose_tpu.ops.pallas_scatter import sorted_segment_add_pallas

        rng = np.random.default_rng(3)
        M, TBL, C = 4096, 1500, 2
        idx = rng.integers(0, TBL, M).astype(np.int32)
        idx[:1500] = 3  # heavy duplication
        upd = rng.normal(size=(M, C)).astype(np.float32)
        want = np.zeros((TBL, C), np.float32)
        np.add.at(want, idx, upd)
        got = np.asarray(
            sorted_segment_add_pallas(
                jnp.asarray(idx), jnp.asarray(upd), TBL, block=256, interpret=True
            )
        )
        # updates land via a hi/lo bf16 split: ~2^-16 relative each,
        # random-walk accumulation over the 1500-deep duplicate row
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-4)

    def test_sentinel_dropped(self):
        from foundationpose_tpu.ops.pallas_scatter import sorted_segment_add_pallas

        idx = np.array([0, 5, 2000, 5], np.int32)  # 2000 >= TBL dropped
        upd = np.ones((4, 2), np.float32)
        got = np.asarray(
            sorted_segment_add_pallas(
                jnp.asarray(idx), jnp.asarray(upd), 1000, block=256, interpret=True
            )
        )
        assert got[0, 0] == 1.0 and got[5, 0] == 2.0
        assert got.sum() == 6.0


class TestOctLayout:
    """The oct layout shares the quad index formula (one table row packs
    all 8 cell corners); reference_encode_quad is its reference too."""

    cfg = HashGridCfg(
        n_levels=4, level_dim=2, base_resolution=4, desired_resolution=32,
        log2_hashmap_size=10, layout="oct",
    )

    def test_matches_naive_reference(self):
        emb = np.asarray(init_hashgrid(jax.random.PRNGKey(0), self.cfg))
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (48, 3)).astype(np.float32)
        got = np.asarray(
            hashgrid_encode(jnp.asarray(emb), jnp.asarray(x), self.cfg)
        )
        want = reference_encode_quad(emb, x, self.cfg)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matches_quad_layout(self):
        """oct and quad are the same function at every config."""
        import dataclasses

        cfg_q = dataclasses.replace(self.cfg, layout="quad")
        emb = init_hashgrid(jax.random.PRNGKey(5), self.cfg)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
        a = np.asarray(hashgrid_encode(emb, x, self.cfg))
        b = np.asarray(hashgrid_encode(emb, x, cfg_q))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_full_size_levels(self):
        cfg = HashGridCfg(
            n_levels=6, level_dim=2, base_resolution=4,
            desired_resolution=64, log2_hashmap_size=12, layout="oct",
        )
        emb = np.asarray(init_hashgrid(jax.random.PRNGKey(1), cfg))
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
        got = np.asarray(hashgrid_encode(jnp.asarray(emb), jnp.asarray(x), cfg))
        want = reference_encode_quad(emb, x, cfg)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_oob_zero_and_grads_zero(self):
        emb = init_hashgrid(jax.random.PRNGKey(3), self.cfg)
        x = jnp.asarray([[1.5, 0.0, 0.0]], jnp.float32)
        assert float(jnp.abs(hashgrid_encode(emb, x, self.cfg)).sum()) == 0.0
        de, dx = jax.grad(
            lambda e, xx: jnp.sum(hashgrid_encode(e, xx, self.cfg)),
            argnums=(0, 1),
        )(emb, x)
        assert float(jnp.abs(de).sum()) == 0.0
        assert float(jnp.abs(dx).sum()) == 0.0

    def test_vjp_matches_autodiff(self):
        """Custom backward (leveled segment-add + inverse rolls,
        analytic d_x) against plain autodiff of the forward."""
        from foundationpose_tpu.ops.hashgrid import _ocencode_fwd_impl

        emb = init_hashgrid(jax.random.PRNGKey(4), self.cfg)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-0.95, 0.95, (64, 3)), jnp.float32)
        g = jnp.asarray(
            rng.standard_normal((64, self.cfg.out_dim)), jnp.float32
        )

        de, dx = jax.grad(
            lambda e, xx: jnp.vdot(hashgrid_encode(e, xx, self.cfg), g),
            argnums=(0, 1),
        )(emb, x)
        de_ref, dx_ref = jax.grad(
            lambda e, xx: jnp.vdot(_ocencode_fwd_impl(e, xx, self.cfg), g),
            argnums=(0, 1),
        )(emb, x)
        np.testing.assert_allclose(
            np.asarray(de), np.asarray(de_ref), atol=5e-2, rtol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(dx_ref), atol=5e-2, rtol=1e-2
        )


class TestLeveledSegmentAdd:
    def test_matches_scatter(self):
        """Batched per-level sort + shared block kernel == scatter-add
        when each row's indices stay in its level's segment."""
        from foundationpose_tpu.ops.pallas_scatter import (
            _segment_add_leveled,
        )

        rng = np.random.default_rng(4)
        L, N, C = 3, 700, 4
        # disjoint ascending segments: [0, 400), [400, 1000), [1000, 1800)
        starts = np.array([0, 400, 1000])
        sizes = np.array([400, 600, 800])
        TBL = 1800
        idx = np.stack(
            [starts[l] + rng.integers(0, sizes[l], N) for l in range(L)]
        ).astype(np.int32)
        upd = rng.normal(size=(C, L, N)).astype(np.float32)
        want = np.zeros((TBL, C), np.float32)
        np.add.at(want, idx.reshape(-1), upd.reshape(C, -1).T)
        got = np.asarray(
            _segment_add_leveled(
                jnp.asarray(idx), jnp.asarray(upd), TBL, block=256,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-4)


class TestFactoredSegmentAdd:
    def test_matches_expanded(self):
        """Factored (sort w+g, expand in kernel) == expanded scatter-add
        with bf16-rounded weights."""
        from foundationpose_tpu.ops.pallas_scatter import (
            _segment_add_factored,
        )

        rng = np.random.default_rng(5)
        L, N, NW, C = 3, 700, 8, 2
        starts = np.array([0, 400, 1000])
        sizes = np.array([400, 600, 800])
        TBL = 1800
        idx = np.stack(
            [starts[l] + rng.integers(0, sizes[l], N) for l in range(L)]
        ).astype(np.int32)
        w = rng.uniform(0, 1, size=(NW, L, N)).astype(np.float32)
        g = rng.normal(size=(C, L, N)).astype(np.float32)
        w16 = np.asarray(
            jnp.asarray(w).astype(jnp.bfloat16).astype(jnp.float32)
        )
        upd = (w16[:, None] * g[None]).reshape(NW * C, L * N)
        want = np.zeros((TBL, NW * C), np.float32)
        np.add.at(want, idx.reshape(-1), upd.T)
        got = np.asarray(
            _segment_add_factored(
                jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), TBL,
                block=256, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-4)
