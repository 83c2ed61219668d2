"""Model-free subsystem tests: occupancy sampling, marching tetrahedra,
and a synthetic-scene end-to-end reconstruction smoke test."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.nerf.occupancy import (
    build_occupancy_grid,
    ray_box_intersection,
    occupancy_lookup,
    sample_occupied,
)
from foundationpose_tpu.ops.marching import marching_tetrahedra


class TestOccupancy:
    def test_build_grid_marks_points(self):
        pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
        occ = build_occupancy_grid(pts, 0.1, dilate=0)
        assert occ[10, 10, 10]  # point at origin -> voxel (1+0)/0.1 = 10
        assert occ[15, 15, 15]
        assert occ.sum() == 2

    def test_dilation_grows(self):
        pts = np.array([[0.0, 0.0, 0.0]])
        occ0 = build_occupancy_grid(pts, 0.1, dilate=0)
        occ1 = build_occupancy_grid(pts, 0.1, dilate=1)
        assert occ1.sum() == 27
        assert (occ1 | occ0).sum() == occ1.sum()

    def test_ray_box(self):
        o = jnp.array([[0.0, 0.0, -2.0], [5.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        tmin, tmax, hit = ray_box_intersection(o, d)
        assert bool(hit[0]) and not bool(hit[1])
        np.testing.assert_allclose(tmin[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(tmax[0], 3.0, atol=1e-5)

    def test_lookup(self):
        pts = np.array([[0.0, 0.0, 0.0]])
        occ = jnp.asarray(build_occupancy_grid(pts, 0.1, dilate=0))
        assert bool(occupancy_lookup(occ, jnp.array([0.05, 0.05, 0.05])))
        assert not bool(occupancy_lookup(occ, jnp.array([0.5, 0.5, 0.5])))
        assert not bool(occupancy_lookup(occ, jnp.array([2.0, 0.0, 0.0])))

    def test_sample_occupied_inside(self):
        # occupied slab around z in [-0.1, 0.1]; ray along +z from outside
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (5000, 3))
        pts[:, 2] = rng.uniform(-0.08, 0.08, 5000)
        occ = jnp.asarray(build_occupancy_grid(pts, 0.05, dilate=0))
        o = jnp.array([[0.0, 0.0, -1.5]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        z, valid = sample_occupied(occ, o, d, jax.random.PRNGKey(0), 32)
        z = np.asarray(z)[0]
        valid = np.asarray(valid)[0]
        assert valid.sum() > 16
        pz = -1.5 + z[valid]
        assert (np.abs(pz) < 0.15).all()  # samples inside the slab

    def test_sample_respects_depth_clip(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.9, 0.9, (5000, 3))
        occ = jnp.asarray(build_occupancy_grid(pts, 0.1, dilate=1))
        o = jnp.array([[0.0, 0.0, -1.5]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        depth = jnp.array([1.0])  # clip samples to t <= 1.0 + trunc
        z, valid = sample_occupied(
            occ, o, d, jax.random.PRNGKey(0), 32, depth=depth, trunc=0.05,
            far_clip=10.0,
        )
        assert np.asarray(z)[0][np.asarray(valid)[0]].max() <= 1.05 + 1e-5


class TestMarchingTetrahedra:
    def test_sphere(self):
        g = np.linspace(-1, 1, 48)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        sdf = np.sqrt(xx**2 + yy**2 + zz**2) - 0.5
        sp = g[1] - g[0]
        verts, faces = marching_tetrahedra(sdf, 0.0, (sp, sp, sp), (g[0], g[0], g[0]))
        assert len(verts) > 100 and len(faces) > 100
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)
        assert r.std() < 0.02

    def test_outward_orientation(self):
        g = np.linspace(-1, 1, 32)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        sdf = np.sqrt(xx**2 + yy**2 + zz**2) - 0.5
        sp = g[1] - g[0]
        verts, faces = marching_tetrahedra(sdf, 0.0, (sp, sp, sp), (g[0], g[0], g[0]))
        v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        n = np.cross(v1 - v0, v2 - v0)
        c = (v0 + v1 + v2) / 3
        frac_outward = (np.sum(n * c, axis=-1) > 0).mean()
        assert frac_outward > 0.95

    def test_empty(self):
        sdf = np.ones((8, 8, 8))
        verts, faces = marching_tetrahedra(sdf)
        assert len(verts) == 0 and len(faces) == 0


@pytest.mark.slow
class TestNeuralObjectField:
    def test_end_to_end_reconstruction(self):
        """Synthetic box scene -> train a few hundred steps -> mesh size
        in the right ballpark and texture baked."""
        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.ops import render_mesh
        from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
        from foundationpose_tpu.nerf import NerfCfg, run_neural_object_field

        box = make_box(np.array([0.2, 0.2, 0.2]))
        rng = np.random.default_rng(0)
        box.vertex_colors = rng.integers(50, 255, (8, 3)).astype(np.uint8)
        K = np.array([[120.0, 0, 64.0], [0, 120.0, 64.0], [0, 0, 1.0]], np.float32)
        H = W = 128

        views = sample_views_icosphere(n_views=4)  # 12 views
        cam_in_obs = views.copy()
        cam_in_obs[:, :3, 3] *= 0.6  # radius 0.6 m
        ob_in_cams = np.linalg.inv(cam_in_obs)
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(ob_in_cams.astype(np.float32)),
            jnp.asarray(K),
            out_hw=(H, W),
            vertex_color=jnp.asarray(box.vertex_colors.astype(np.float32) / 255),
            vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
            use_light=True,
            pose_block=12,
        )
        rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
        depths = np.asarray(out.depth).astype(np.float32)
        masks = np.asarray(out.mask).astype(np.uint8)

        cfg = NerfCfg(
            n_step=120,
            n_rand=512,
            n_samples=32,
            n_samples_around_depth=32,
            num_levels=8,
            finest_res=128,
            log2_hashmap_size=15,
            mesh_resolution=0.01,
            tex_res=256,
            amp=False,
        )
        mesh, runner = run_neural_object_field(
            cfg, K, rgbs, depths, masks, cam_in_obs
        )
        assert len(mesh.vertices) > 50
        # Real-world size ~ the 0.2 box (loose: SDF after 120 steps).
        ext = mesh.bounds()[1] - mesh.bounds()[0]
        assert (ext > 0.1).all() and (ext < 0.45).all()
        assert mesh.texture is not None and mesh.uv is not None
        assert mesh.texture.shape == (256, 256, 3)


class TestOccKeepFrac:
    """NerfCfg.occ_keep_frac: importance subsetting of the occupancy
    samples (keep the ones nearest the depth band) — the documented
    fewer-points lever for the train step's gather-bound wall."""

    def test_subset_near_band_semantics(self):
        from foundationpose_tpu.nerf.runner import subset_near_band

        z = jnp.asarray([[0.10, 0.44, 0.46, 0.54, 0.56, 0.90]])
        valid = jnp.ones_like(z, bool)
        depth = jnp.asarray([0.5])
        kz, kv = subset_near_band(
            z, valid, depth, trunc=0.05, neg_trunc_ratio=1.0, keep=4,
            key=jax.random.PRNGKey(0),
        )
        # the two in-band samples plus the two nearest out-of-band ones,
        # ascending
        np.testing.assert_allclose(
            np.asarray(kz[0]), [0.44, 0.46, 0.54, 0.56]
        )
        assert np.asarray(kv).all()

        # invalid in-band samples are never chosen over valid ones
        valid2 = valid.at[0, 2].set(False)  # 0.46 invalid
        kz2, kv2 = subset_near_band(
            z, valid2, depth, trunc=0.05, neg_trunc_ratio=1.0, keep=4,
            key=jax.random.PRNGKey(0),
        )
        assert 0.46 not in np.round(np.asarray(kz2[0]), 6)
        assert np.asarray(kv2).all()

        # a ray without usable depth keeps SOME valid subset (random)
        kz3, _ = subset_near_band(
            z, valid, jnp.asarray([0.0]), trunc=0.05, neg_trunc_ratio=1.0,
            keep=3, key=jax.random.PRNGKey(1), near=0.1, far=2.0,
        )
        assert kz3.shape == (1, 3)
        assert set(np.round(np.asarray(kz3[0]), 6)) <= set(
            np.round(np.asarray(z[0]), 6)
        )

    @pytest.mark.slow
    def test_quality_parity_with_subsetting(self):
        """A/B gate for the fewer-points preset: the same synthetic box
        scene as test_end_to_end_reconstruction, trained with
        occ_keep_frac=0.75, must clear the identical mesh-quality gates
        (extents band + texture bake) — dropping the farthest quarter of
        the occupancy samples thins far free-space supervision but must
        not cost reconstruction quality."""
        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.ops import render_mesh
        from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
        from foundationpose_tpu.nerf import NerfCfg, run_neural_object_field

        box = make_box(np.array([0.2, 0.2, 0.2]))
        rng = np.random.default_rng(0)
        box.vertex_colors = rng.integers(50, 255, (8, 3)).astype(np.uint8)
        K = np.array([[120.0, 0, 64.0], [0, 120.0, 64.0], [0, 0, 1.0]], np.float32)
        H = W = 128
        views = sample_views_icosphere(n_views=4)
        cam_in_obs = views.copy()
        cam_in_obs[:, :3, 3] *= 0.6
        ob_in_cams = np.linalg.inv(cam_in_obs)
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(ob_in_cams.astype(np.float32)),
            jnp.asarray(K),
            out_hw=(H, W),
            vertex_color=jnp.asarray(box.vertex_colors.astype(np.float32) / 255),
            vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
            use_light=True,
            pose_block=12,
        )
        rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
        depths = np.asarray(out.depth).astype(np.float32)
        masks = np.asarray(out.mask).astype(np.uint8)

        cfg = NerfCfg(
            n_step=120,
            n_rand=512,
            n_samples=32,
            n_samples_around_depth=32,
            num_levels=8,
            finest_res=128,
            log2_hashmap_size=15,
            mesh_resolution=0.01,
            tex_res=256,
            amp=False,
            occ_keep_frac=0.75,
        )
        mesh, runner = run_neural_object_field(
            cfg, K, rgbs, depths, masks, cam_in_obs
        )
        assert len(mesh.vertices) > 50
        ext = mesh.bounds()[1] - mesh.bounds()[0]
        assert (ext > 0.1).all() and (ext < 0.45).all()
        assert mesh.texture is not None and mesh.uv is not None


class TestOctreeCloudDenoise:
    def _scene(self):
        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.ops import render_mesh
        from foundationpose_tpu.geometry.icosphere import sample_views_icosphere

        box = make_box(np.array([0.2, 0.2, 0.2]))
        K = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]], np.float32)
        views = sample_views_icosphere(n_views=4)
        cam_in_obs = views.copy()
        cam_in_obs[:, :3, 3] *= 0.6
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(np.linalg.inv(cam_in_obs).astype(np.float32)),
            jnp.asarray(K), out_hw=(64, 64),
            vertex_color=jnp.full((8, 3), 0.7), use_light=False, pose_block=12,
        )
        rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
        depths = np.asarray(out.depth).astype(np.float32)
        masks = np.asarray(out.mask).astype(np.uint8)
        return K, rgbs, depths, masks, cam_in_obs

    def _runner(self, K, rgbs, depths, masks, cam_in_obs, cloud_depths=None,
                **cfg_kw):
        """cloud_depths: depths used for scene bounds + build cloud (the
        fused cloud the reference denoises against is outlier-filtered,
        so corrupt only the per-ray depths, not the cloud)."""
        import dataclasses

        from foundationpose_tpu.nerf import NerfCfg
        from foundationpose_tpu.nerf.runner import NerfRunner
        from foundationpose_tpu.nerf.scene import (
            compute_scene_bounds, preprocess_data,
        )

        cfg = NerfCfg(n_step=1, n_rand=64, n_samples=8,
                      n_samples_around_depth=8, num_levels=4, finest_res=64,
                      log2_hashmap_size=12, amp=False, **cfg_kw)
        cd = depths if cloud_depths is None else cloud_depths
        sc, tr, pts = compute_scene_bounds(K, rgbs, cd, masks, cam_in_obs)
        cfg = dataclasses.replace(
            cfg, sc_factor=sc, translation=tuple(np.asarray(tr).tolist())
        )
        rn, dn, pn = preprocess_data(rgbs, depths, masks, cam_in_obs, sc, tr)
        return NerfRunner(cfg, rn, dn, masks, pn, K, build_pcd=pts)

    def test_outlier_depth_rays_dropped(self):
        """Rays whose depth point is far from the build cloud are removed
        (nerf_runner.py:179-196); clean rays survive."""
        K, rgbs, depths, masks, cam_in_obs = self._scene()
        # corrupt a patch of depths INSIDE the mask with a +50 cm outlier
        # (well past the 20 cm box — +12 cm would land near its back face)
        bad = depths.copy()
        ys, xs = np.nonzero(masks[0])
        sel = (ys[:50], xs[:50])
        bad[0][sel] = depths[0][sel] + 0.5
        r_clean = self._runner(K, rgbs, depths, masks, cam_in_obs)
        r_bad = self._runner(K, rgbs, bad, masks, cam_in_obs,
                             cloud_depths=depths)
        assert r_clean._denoise_dropped <= 2
        assert r_bad._denoise_dropped >= 40
        assert r_bad.n_rays < r_clean.n_rays

    def test_flag_off_keeps_rays(self):
        K, rgbs, depths, masks, cam_in_obs = self._scene()
        bad = depths.copy()
        ys, xs = np.nonzero(masks[0])
        bad[0][ys[:50], xs[:50]] += 0.5
        r = self._runner(K, rgbs, bad, masks, cam_in_obs,
                         denoise_depth_use_octree_cloud=False)
        assert r._denoise_dropped == 0


@pytest.mark.slow
class TestOptionalNerfPaths:
    """Reference-carried options that ship OFF (config_ycbv.yml:20-21,
    66-71,75,84): hierarchical sampling, truncation annealing, depth /
    eikonal / free-space-rgb losses."""

    def _runner(self, **cfg_kw):
        helper = TestOctreeCloudDenoise()
        K, rgbs, depths, masks, cam_in_obs = helper._scene()
        return helper._runner(K, rgbs, depths, masks, cam_in_obs, **cfg_kw)

    def _step(self, runner):
        p, o, loss, aux = runner._train_step(
            runner.params, runner.opt_state, jax.random.PRNGKey(0)
        )
        return float(loss), {k: float(v) for k, v in aux.items()}

    def test_sample_pdf_draws_from_pdf(self):
        from foundationpose_tpu.nerf.runner import sample_pdf

        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9)[None], (4, 9))
        w = np.zeros((4, 8), np.float32)
        w[:, 6] = 1.0  # all mass in bin [0.75, 0.875]
        z = np.asarray(
            sample_pdf(bins, jnp.asarray(w), 16, jax.random.PRNGKey(0))
        )
        assert z.shape == (4, 16)
        assert (z >= 0.7).all() and (z <= 0.9).all()

    def test_sample_pdf_det_spread(self):
        from foundationpose_tpu.nerf.runner import sample_pdf

        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9)[None], (2, 9))
        w = jnp.ones((2, 8))
        z = np.asarray(
            sample_pdf(bins, w, 8, jax.random.PRNGKey(0), perturb=False)
        )
        assert z[0].min() < 0.1 and z[0].max() > 0.85  # spans the range

    def test_truncation_annealing(self):
        import dataclasses

        r = self._runner()
        cfg_lin = dataclasses.replace(
            r.cfg, trunc_decay_type="linear", trunc_start=0.05
        )
        r.cfg = cfg_lin
        t0 = float(r._truncation(jnp.float32(0)))
        tN = float(r._truncation(jnp.float32(cfg_lin.n_step)))
        assert t0 > tN
        np.testing.assert_allclose(t0, 0.05 * cfg_lin.sc_factor, rtol=1e-5)
        np.testing.assert_allclose(tN, 0.01 * cfg_lin.sc_factor, rtol=1e-5)
        r.cfg = dataclasses.replace(r.cfg, trunc_decay_type="exp")
        te = float(r._truncation(jnp.float32(cfg_lin.n_step * 10)))
        np.testing.assert_allclose(te, 0.01 * cfg_lin.sc_factor, rtol=1e-4)

    def test_importance_sampling_runs(self):
        r = self._runner(n_importance=8)
        loss, aux = self._step(r)
        assert np.isfinite(loss)
        out = r._render_rays(
            r.params,
            {k: v[:16] for k, v in r.rays.items()},
            jax.random.PRNGKey(1), r.occ, r.c2w,
        )
        assert out["sdf"].shape[-1] == 8 + 8 + 8  # uniform + depth + imp
        # merged z stays sorted
        z = np.asarray(out["z_vals"])
        assert (np.diff(z, axis=-1) >= -1e-6).all()

    def test_optional_losses_contribute(self):
        base_loss, base_aux = self._step(self._runner())
        for kw, key in (
            (dict(depth_weight=1.0), "depth_loss"),
            (dict(eikonal_weight=0.1), "eikonal_loss"),
            (dict(fs_rgb_weight=0.5), "fs_rgb_loss"),
        ):
            loss, aux = self._step(self._runner(**kw))
            assert key in aux, key
            assert np.isfinite(aux[key]), key
        assert "depth_loss" not in base_aux


class TestArtifactDumps:
    def test_periodic_image_and_mesh(self, tmp_path):
        """train(artifact_dir=...) writes eval imagery + mesh snapshots at
        the i_img/i_mesh cadence (reference nerf_runner.py:596-680)."""
        import dataclasses
        import os

        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.ops import render_mesh
        from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
        from foundationpose_tpu.nerf import NerfCfg
        from foundationpose_tpu.nerf.runner import NerfRunner
        from foundationpose_tpu.nerf.scene import compute_scene_bounds, preprocess_data

        box = make_box(np.array([0.2, 0.2, 0.2]))
        box.vertex_colors = np.full((8, 3), 180, np.uint8)
        K = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]], np.float32)
        views = sample_views_icosphere(n_views=4)
        cam_in_obs = views.copy()
        cam_in_obs[:, :3, 3] *= 0.6
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(np.linalg.inv(cam_in_obs).astype(np.float32)),
            jnp.asarray(K), out_hw=(64, 64),
            vertex_color=jnp.full((8, 3), 0.7), use_light=False, pose_block=12,
        )
        rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
        depths = np.asarray(out.depth).astype(np.float32)
        masks = np.asarray(out.mask).astype(np.uint8)

        cfg = NerfCfg(n_step=4, n_rand=128, n_samples=16, n_samples_around_depth=16,
                      num_levels=4, finest_res=64, log2_hashmap_size=12, amp=False,
                      mesh_resolution=0.02)
        sc, tr, pts = compute_scene_bounds(K, rgbs, depths, masks, cam_in_obs)
        cfg = dataclasses.replace(cfg, sc_factor=sc, translation=tuple(np.asarray(tr).tolist()))
        rn, dn, pn = preprocess_data(rgbs, depths, masks, cam_in_obs, sc, tr)
        runner = NerfRunner(cfg, rn, dn, masks, pn, K, build_pcd=pts)
        art = str(tmp_path / "artifacts")
        sunk = []
        runner.train(
            artifact_dir=art, i_img=2, i_mesh=4, i_pose=2,
            metric_sink=lambda step, scalars: sunk.append((step, scalars)),
        )
        imgs = os.listdir(f"{art}/image")
        assert "step_0000002.png" in imgs and "step_0000004.png" in imgs
        # mesh snapshot may be empty this early; dir exists only if non-empty
        if os.path.isdir(f"{art}/mesh"):
            assert any(f.endswith(".obj") for f in os.listdir(f"{art}/mesh"))
        # i_pose dumps: optimized per-frame poses in real-world units
        poses_f = sorted(os.listdir(f"{art}/pose"))
        assert "step_0000002.npy" in poses_f and "step_0000004.npy" in poses_f
        dumped = np.load(f"{art}/pose/step_0000002.npy")
        assert dumped.shape == (len(cam_in_obs), 4, 4)
        # metric sink (the reference's sacred log_scalar hook) got scalars
        assert sunk and all("loss" in s and "rgb_loss" in s for _, s in sunk)

    def test_first_frame_dilate(self):
        """Frame 0's assumed-perfect mask is dilated (reference: 100 px
        kernel, nerf_runner.py:276-286) and the ring's BAD_DEPTH rays
        supervise free space; later frames use dilate_mask_size."""
        from foundationpose_tpu.nerf.scene import BAD_DEPTH

        helper = TestOctreeCloudDenoise()
        K, rgbs, depths, masks, cam_in_obs = helper._scene()
        r_dil = helper._runner(K, rgbs, depths, masks, cam_in_obs,
                               first_frame_dilate=20)
        r_off = helper._runner(K, rgbs, depths, masks, cam_in_obs,
                               first_frame_dilate=0)
        fid_dil = np.asarray(r_dil.rays["frame_id"])
        fid_off = np.asarray(r_off.rays["frame_id"])
        # only frame 0 gained rays
        assert (fid_dil == 0).sum() > (fid_off == 0).sum()
        assert (fid_dil == 1).sum() == (fid_off == 1).sum()
        # the extra ring rays carry BAD_DEPTH (free-space supervision)
        d0 = np.asarray(r_dil.rays["depth"])[fid_dil == 0]
        sc = r_dil.cfg.sc_factor
        n_bad_dil = (d0 >= BAD_DEPTH * sc * 0.99).sum()
        d0_off = np.asarray(r_off.rays["depth"])[fid_off == 0]
        assert n_bad_dil > (d0_off >= BAD_DEPTH * sc * 0.99).sum()


class TestBakeTexture:
    """Texture bake view blending (reference nerf_runner.py:1163-1213:
    per-triangle top-4 views by incidence angle splat into the map)."""

    def _capture(self, n_sub=2, H=96, W=96, radius=0.5):
        from foundationpose_tpu.geometry.icosphere import (
            icosphere, sample_views_icosphere,
        )
        from foundationpose_tpu.meshio import TriMesh, compute_vertex_normals
        from foundationpose_tpu.ops import render_mesh

        verts, faces = icosphere(n_sub, radius=0.1)
        # smooth view-independent vertex colors (no lighting) so a
        # perfect bake reproduces the training views exactly
        vc = (
            np.stack(
                [
                    verts[:, 0] - verts[:, 0].min(),
                    verts[:, 1] - verts[:, 1].min(),
                    verts[:, 2] - verts[:, 2].min(),
                ],
                axis=-1,
            )
            / 0.2
            * 200
            + 30
        ).astype(np.uint8)
        mesh = TriMesh(vertices=verts, faces=faces, vertex_colors=vc)
        K = np.array(
            [[140.0, 0, W / 2], [0, 140.0, H / 2], [0, 0, 1.0]], np.float32
        )
        cam_in_obs = sample_views_icosphere(n_views=4)  # 12 views
        cam_in_obs[:, :3, 3] *= radius
        ob_in_cams = np.linalg.inv(cam_in_obs)
        out = render_mesh(
            jnp.asarray(verts.astype(np.float32)),
            jnp.asarray(faces.astype(np.int32)),
            jnp.asarray(ob_in_cams.astype(np.float32)),
            jnp.asarray(K),
            out_hw=(H, W),
            vertex_color=jnp.asarray(vc.astype(np.float32) / 255),
            use_light=False,
            pose_block=12,
        )
        rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
        depths = np.asarray(out.depth).astype(np.float32)
        return mesh, rgbs, depths, cam_in_obs, K, (H, W)

    def _psnr_of_bake(self, baked, rgbs, cam_in_obs, K, hw):
        from foundationpose_tpu.ops import render_mesh

        H, W = hw
        ob_in_cams = np.linalg.inv(cam_in_obs)
        uv_r = baked.uv.copy()
        uv_r[:, 1] = 1.0 - uv_r[:, 1]  # OBJ v-up -> raster v-down
        out = render_mesh(
            jnp.asarray(baked.vertices.astype(np.float32)),
            jnp.asarray(baked.faces.astype(np.int32)),
            jnp.asarray(ob_in_cams.astype(np.float32)),
            jnp.asarray(K),
            out_hw=(H, W),
            uv=jnp.asarray(uv_r),
            tex=jnp.asarray(baked.texture.astype(np.float32) / 255),
            use_light=False,
            pose_block=12,
        )
        rr = np.asarray(out.color) * 255
        m = np.asarray(out.mask) > 0
        err = ((rr - rgbs.astype(np.float32)) ** 2)[m].mean()
        return 10 * np.log10(255.0**2 / max(err, 1e-9))

    def test_top4_blend_matches_or_beats_single_view(self):
        from foundationpose_tpu.nerf.texture import bake_texture

        mesh, rgbs, depths, cam_in_obs, K, hw = self._capture()
        b1 = bake_texture(
            mesh, rgbs, depths, cam_in_obs, K, tex_res=256, top_views=1
        )
        b4 = bake_texture(
            mesh, rgbs, depths, cam_in_obs, K, tex_res=256, top_views=4
        )
        p1 = self._psnr_of_bake(b1, rgbs, cam_in_obs, K, hw)
        p4 = self._psnr_of_bake(b4, rgbs, cam_in_obs, K, hw)
        # blending must not regress re-render quality, and both bakes
        # must reproduce the capture decently
        assert p4 >= p1 - 0.25, (p1, p4)
        assert p4 > 20.0, p4

    def test_single_view_knob_still_available(self):
        from foundationpose_tpu.nerf.texture import bake_texture

        mesh, rgbs, depths, cam_in_obs, K, hw = self._capture(n_sub=1)
        b = bake_texture(
            mesh, rgbs, depths, cam_in_obs, K, tex_res=128, top_views=1
        )
        assert b.texture is not None and b.uv is not None
