import numpy as np
import jax.numpy as jnp

from foundationpose_tpu.ops import (
    erode_depth,
    bilateral_filter_depth,
    warp_perspective,
    warp_perspective_batch,
)


class TestErodeDepth:
    def test_uniform_depth_untouched(self):
        d = np.full((16, 16), 1.0, dtype=np.float32)
        out = np.asarray(erode_depth(jnp.asarray(d)))
        np.testing.assert_allclose(out, d)

    def test_isolated_pixel_removed(self):
        d = np.zeros((16, 16), dtype=np.float32)
        d[8, 8] = 1.0
        out = np.asarray(erode_depth(jnp.asarray(d)))
        assert out[8, 8] == 0.0

    def test_zero_depth_stays_zero(self):
        d = np.zeros((8, 8), dtype=np.float32)
        out = np.asarray(erode_depth(jnp.asarray(d)))
        np.testing.assert_allclose(out, 0.0)

    def test_boundary_of_discontinuity_eroded(self):
        # Two flat regions 1m apart: pixels at the border have >80% of
        # their 5x5 window on the other side only in a thin band; check
        # the interior is kept and the exact border column count behaves.
        d = np.full((20, 20), 1.0, dtype=np.float32)
        d[:, 10:] = 2.0
        out = np.asarray(erode_depth(jnp.asarray(d)))
        assert out[10, 0] == 1.0 and out[10, 19] == 2.0
        # Border pixels: bad count for column 9 = 10 of 25 -> ratio 0.4 < 0.8 kept
        assert out[10, 9] == 1.0

    def test_corner_inbounds_normalization(self):
        # At the corner only 9 neighbors exist; all equal -> kept.
        d = np.full((8, 8), 2.0, dtype=np.float32)
        out = np.asarray(erode_depth(jnp.asarray(d)))
        assert out[0, 0] == 2.0


class TestBilateral:
    def test_uniform_preserved(self):
        d = np.full((16, 16), 1.5, dtype=np.float32)
        out = np.asarray(bilateral_filter_depth(jnp.asarray(d)))
        np.testing.assert_allclose(out, 1.5, atol=1e-6)

    def test_outlier_rejected(self):
        d = np.full((16, 16), 1.0, dtype=np.float32)
        d[8, 8] = 5.0  # far from local mean -> excluded from averaging
        out = np.asarray(bilateral_filter_depth(jnp.asarray(d)))
        # the outlier pixel itself: local mean ~1.16, only the ~1.0
        # neighbors are within 0.01 of the mean? mean=(24*1+5)/25=1.16 ->
        # nothing within 0.01 -> output 0
        assert out[8, 8] == 0.0

    def test_hole_filled(self):
        d = np.full((16, 16), 1.0, dtype=np.float32)
        d[8, 8] = 0.0  # invalid center gets filled from neighbors
        out = np.asarray(bilateral_filter_depth(jnp.asarray(d)))
        np.testing.assert_allclose(out[8, 8], 1.0, atol=1e-5)

    def test_smooths_noise(self):
        rng = np.random.default_rng(0)
        d = 1.0 + rng.normal(0, 0.002, size=(32, 32)).astype(np.float32)
        out = np.asarray(bilateral_filter_depth(jnp.asarray(d)))
        assert out[8:-8, 8:-8].std() < d[8:-8, 8:-8].std()


class TestWarp:
    def test_identity(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (12, 12, 3)).astype(np.float32)
        M = np.eye(3, dtype=np.float32)[None]
        out = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(M), (12, 12)))
        np.testing.assert_allclose(out[0], img, atol=1e-5)

    def test_translation_nearest(self):
        img = np.zeros((8, 8, 1), dtype=np.float32)
        img[2, 3] = 7.0
        M = np.eye(3, dtype=np.float32)
        M[0, 2] = 2.0  # shift +2 in u
        M[1, 2] = 1.0  # shift +1 in v
        out = np.asarray(
            warp_perspective(jnp.asarray(img), jnp.asarray(M[None]), (8, 8), mode="nearest")
        )
        assert out[0, 3, 5, 0] == 7.0

    def test_scale_bilinear_center(self):
        # Upscale 2x: dst pixel (2i, 2j) should hit src (i, j) exactly.
        rng = np.random.default_rng(2)
        img = rng.uniform(0, 1, (6, 6, 2)).astype(np.float32)
        M = np.diag([2.0, 2.0, 1.0]).astype(np.float32)
        out = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(M[None]), (12, 12)))
        np.testing.assert_allclose(out[0, ::2, ::2], img, atol=1e-5)

    def test_out_of_bounds_zero(self):
        img = np.ones((4, 4, 1), dtype=np.float32)
        M = np.eye(3, dtype=np.float32)
        M[0, 2] = 100.0
        out = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(M[None]), (4, 4)))
        np.testing.assert_allclose(out, 0.0)

    def test_batch_variant_matches(self):
        rng = np.random.default_rng(3)
        imgs = rng.uniform(0, 1, (3, 10, 10, 3)).astype(np.float32)
        M = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
        M[:, 0, 2] = [0.0, 1.0, -1.0]
        out_b = np.asarray(warp_perspective_batch(jnp.asarray(imgs), jnp.asarray(M), (10, 10)))
        for i in range(3):
            out_s = np.asarray(
                warp_perspective(jnp.asarray(imgs[i]), jnp.asarray(M[i : i + 1]), (10, 10))
            )[0]
            # atol admits TPU f32 accumulation differences (~7.5e-6 seen
            # on-chip); both paths are valid f32 evaluations of the warp.
            np.testing.assert_allclose(out_b[i], out_s, atol=2e-5)


class TestWarpCrop:
    def test_matches_general_warp_bilinear(self):
        import jax.numpy as jnp
        from foundationpose_tpu.ops import warp_crop

        rng = np.random.default_rng(5)
        img = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
        M = np.array(
            [
                [[2.0, 0, -4.0], [0, 2.0, -6.0], [0, 0, 1]],
                [[0.5, 0, 3.0], [0, 0.75, 1.0], [0, 0, 1]],
            ],
            np.float32,
        )
        a = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(M), (16, 16)))
        b = np.asarray(warp_crop(jnp.asarray(img), jnp.asarray(M), (16, 16)))
        np.testing.assert_allclose(b, a, atol=2e-5)

    def test_matches_general_warp_nearest(self):
        import jax.numpy as jnp
        from foundationpose_tpu.ops import warp_crop

        rng = np.random.default_rng(6)
        img = rng.uniform(0, 1, (20, 20, 2)).astype(np.float32)
        M = np.array([[[1.7, 0, -2.0], [0, 1.3, 0.5], [0, 0, 1]]], np.float32)
        a = np.asarray(
            warp_perspective(jnp.asarray(img), jnp.asarray(M), (12, 12), mode="nearest")
        )
        b = np.asarray(
            warp_crop(jnp.asarray(img), jnp.asarray(M), (12, 12), mode="nearest")
        )
        np.testing.assert_allclose(b, a, atol=2e-5)

    def test_out_of_bounds_zero(self):
        import jax.numpy as jnp
        from foundationpose_tpu.ops import warp_crop

        img = np.ones((8, 8, 1), np.float32)
        M = np.eye(3, dtype=np.float32)
        M[0, 2] = 100.0
        out = np.asarray(warp_crop(jnp.asarray(img), jnp.asarray(M[None]), (8, 8)))
        np.testing.assert_allclose(out, 0.0)
