"""End-to-end pipeline tests on a synthetic scene.

Self-consistency oracle (SURVEY.md §4): render a known object at a known
pose into a synthetic RGB-D frame, then run registration and check the
recovered pose. With a zeroed refiner head (identity refinement) and the
classical depth scorer, registration must pick the rotation-grid
hypothesis nearest the ground truth — this validates every stage's
plumbing and conventions without trained weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.meshio import make_box, TriMesh
from foundationpose_tpu.ops import render_mesh
from foundationpose_tpu.pipeline import (
    EstimatorCfg,
    RefinerCfg,
    ScorerCfg,
    FoundationPose,
    make_mesh_tensors,
    refine_poses,
)
from foundationpose_tpu.models.networks import (
    RefineNetCfg,
    ScoreNetCfg,
    init_refine_net,
)
from foundationpose_tpu.utils.metrics import adds_err, rotation_geodesic_deg

K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]], dtype=np.float32)
H, W = 240, 320


def colored_box(extents=(0.12, 0.16, 0.2)) -> TriMesh:
    box = make_box(np.array(extents))
    rng = np.random.default_rng(0)
    box.vertex_colors = rng.integers(40, 255, size=(8, 3)).astype(np.uint8)
    return box


def synth_frame(mesh: TriMesh, pose: np.ndarray):
    """Render a full-frame synthetic RGB-D observation."""
    out = render_mesh(
        jnp.asarray(mesh.vertices.astype(np.float32)),
        jnp.asarray(mesh.faces.astype(np.int32)),
        jnp.asarray(pose[None].astype(np.float32)),
        jnp.asarray(K),
        out_hw=(H, W),
        vertex_color=jnp.asarray(mesh.vertex_colors.astype(np.float32) / 255.0),
        vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
        use_light=True,
    )
    rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
    depth = np.asarray(out.depth[0]).astype(np.float32)
    mask = np.asarray(out.mask[0]).astype(np.uint8)
    return rgb, depth, mask


def zero_refiner_heads(params):
    for head in ("trans_head", "rot_head"):
        params[head]["1"]["kernel"] = jnp.zeros_like(params[head]["1"]["kernel"])
        params[head]["1"]["bias"] = jnp.zeros_like(params[head]["1"]["bias"])
    return params


def tiny_cfg():
    return EstimatorCfg(
        refiner=RefinerCfg(net=RefineNetCfg(base_width=4), compute_dtype="float32"),
        scorer=ScorerCfg(net=ScoreNetCfg(base_width=4), mode="depth"),
        min_n_views=4,  # 12-vertex icosphere
        inplane_step_deg=120.0,
    )


@pytest.fixture(scope="module")
def est():
    mesh = colored_box()
    cfg = tiny_cfg()
    refiner_params = zero_refiner_heads(
        init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    )
    return FoundationPose(mesh=mesh, cfg=cfg, refiner_params=refiner_params)


@pytest.mark.slow
class TestRegister:
    def test_register_recovers_pose(self, est):
        gt = np.eye(4)
        gt[:3, 3] = [0.02, -0.01, 0.9]
        mesh = colored_box()
        rgb, depth, mask = synth_frame(mesh, gt)
        pose = est.register(K, rgb, depth, mask, iteration=0)
        # x/y from the mask-bbox ray are centimeter-exact; z carries the
        # documented front-surface bias of the median-depth guess
        # (estimater.py:137-156): with identity refinement the estimate
        # sits ~half the object's depth extent in front of the center.
        assert np.linalg.norm(pose[:2, 3] - gt[:2, 3]) < 0.02
        z_bias = 0.1  # half of the 0.2 m z-extent
        assert abs(pose[2, 3] - (gt[2, 3] - z_bias)) < 0.03
        # With the bias compensated, the depth scorer must have picked a
        # box-symmetry-equivalent orientation: ADD-S small.
        pose_c = pose.copy()
        pose_c[2, 3] += z_bias
        # bound set by the coarse 36-rotation test grid, far below the
        # ~0.15 ADD-S of a random orientation at this size
        assert adds_err(pose_c, gt, mesh.vertices) < 0.07

    def test_register_rotated_object(self, est):
        from foundationpose_tpu.geometry import so3_exp_map

        Rz = np.asarray(so3_exp_map(jnp.array([[0.3, -0.4, 0.5]])))[0]
        gt = np.eye(4)
        gt[:3, :3] = Rz
        gt[:3, 3] = [-0.03, 0.02, 1.1]
        mesh = colored_box()
        rgb, depth, mask = synth_frame(mesh, gt)
        pose = est.register(K, rgb, depth, mask, iteration=0)
        assert np.linalg.norm(pose[:2, 3] - gt[:2, 3]) < 0.03
        # front-surface z bias depends on orientation; bound it loosely
        assert -0.16 < pose[2, 3] - gt[2, 3] < 0.0
        pose_c = pose.copy()
        pose_c[2, 3] = gt[2, 3]
        assert adds_err(pose_c, gt, mesh.vertices) < 0.09

    def test_register_empty_mask_fallback(self, est):
        rgb = np.zeros((H, W, 3), np.uint8)
        depth = np.zeros((H, W), np.float32)
        mask = np.zeros((H, W), np.uint8)
        pose = est.register(K, rgb, depth, mask, iteration=0)
        np.testing.assert_allclose(pose[:3, :3], np.eye(3))

    def test_scores_sorted(self, est):
        gt = np.eye(4)
        gt[:3, 3] = [0, 0, 0.8]
        mesh = colored_box()
        rgb, depth, mask = synth_frame(mesh, gt)
        est.register(K, rgb, depth, mask, iteration=0)
        s = np.asarray(est.scores)
        assert (np.diff(s[np.isfinite(s)]) <= 1e-6).all()

    def test_register_funneling_matches_full(self):
        """Hypothesis funneling (EstimatorCfg.prune_after_iter) must pick
        the same best pose as the full register here: the depth score
        that drives the prune is the same score that ranks hypotheses in
        this depth-scorer config, so the eventual winner is always a
        survivor."""
        import dataclasses

        mesh = colored_box()
        cfg = tiny_cfg()
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
        )
        gt = np.eye(4)
        gt[:3, 3] = [0.02, -0.01, 0.9]
        rgb, depth, mask = synth_frame(mesh, gt)
        est_f = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
        pose_f = est_f.register(K, rgb, depth, mask, iteration=2)
        cfg_p = dataclasses.replace(cfg, prune_after_iter=1, prune_keep=16)
        est_p = FoundationPose(mesh=mesh, cfg=cfg_p, refiner_params=params)
        pose_p = est_p.register(K, rgb, depth, mask, iteration=2)
        np.testing.assert_allclose(pose_p, pose_f, atol=1e-6)
        # every survivor outranks every pruned hypothesis (offset scores)
        s = np.asarray(est_p.scores)
        n_surv = int((s[np.isfinite(s)] > 1e4).sum())
        assert n_surv == 16
        assert (s[:n_surv] > 1e4).all()

    def test_debug_artifacts(self, tmp_path):
        """debug=3 register writes the scorer canvas, one refiner
        side-by-side per iteration, and the pose-transformed mesh
        (predict_pose_refine.py:241-293, run_demo.py:54-61)."""
        from foundationpose_tpu.meshio import load_mesh

        mesh = colored_box()
        cfg = tiny_cfg()
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
        )
        gt = np.eye(4)
        gt[:3, 3] = [0.02, -0.01, 0.9]
        rgb, depth, mask = synth_frame(mesh, gt)
        est_d = FoundationPose(
            mesh=mesh, cfg=cfg, refiner_params=params,
            debug=3, debug_dir=str(tmp_path),
        )
        pose = est_d.register(K, rgb, depth, mask, iteration=2)
        assert (tmp_path / "vis_score.png").exists()
        for i in range(2):
            assert (tmp_path / f"vis_refiner_iter{i}.png").exists()
        tf_mesh = load_mesh(str(tmp_path / "model_tf.obj"))
        # the exported mesh is the original model under the returned pose
        want = mesh.vertices @ pose[:3, :3].T + pose[:3, 3]
        got = np.asarray(tf_mesh.vertices)
        np.testing.assert_allclose(
            np.sort(got, axis=0), np.sort(want, axis=0), atol=1e-4
        )


@pytest.mark.slow
class TestTrack:
    def test_track_after_register(self, est):
        gt = np.eye(4)
        gt[:3, 3] = [0.0, 0.0, 0.85]
        mesh = colored_box()
        rgb, depth, mask = synth_frame(mesh, gt)
        est.register(K, rgb, depth, mask, iteration=0)
        pose = est.track_one(rgb, depth, K, iteration=1)
        assert pose.shape == (4, 4)
        # identity refinement -> pose unchanged up to centering transform
        # (z keeps the register-time front-surface bias)
        assert np.linalg.norm(pose[:2, 3] - gt[:2, 3]) < 0.03
        assert abs(pose[2, 3] - gt[2, 3]) < 0.13

    def test_track_without_register_raises(self):
        mesh = colored_box()
        cfg = tiny_cfg()
        est2 = FoundationPose(mesh=mesh, cfg=cfg)
        with pytest.raises(RuntimeError):
            est2.track_one(np.zeros((H, W, 3), np.uint8), np.zeros((H, W), np.float32), K)

    def test_track_roi_matches_full_frame(self, est):
        """ROI streaming is an exact reparameterization: slicing the frame
        around the object and shifting K's principal point must yield the
        same pose as the full-frame path."""
        import dataclasses

        gt = np.eye(4)
        gt[:3, 3] = [0.04, -0.03, 1.25]  # far enough that the ROI < frame
        mesh = colored_box()
        rgb, depth, mask = synth_frame(mesh, gt)
        cfg_full = dataclasses.replace(tiny_cfg(), track_roi=False)
        cfg_roi = dataclasses.replace(tiny_cfg(), track_roi=True)
        # zeroed heads: identity refinement keeps the pose (and thus the
        # ROI window) stable; random weights would walk the pose away
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(7), cfg_full.refiner.net)
        )
        poses = {}
        for name, cfg in (("full", cfg_full), ("roi", cfg_roi)):
            e = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
            e.register(K, rgb, depth, mask, iteration=1)
            p = None
            for _ in range(3):
                p = e.track_one(rgb, depth, K, iteration=1)
            poses[name] = p
            if name == "roi":
                # the ROI must actually have been used (frame big enough)
                assert e._track_roi_window(K, H, W) is not None
        np.testing.assert_allclose(poses["roi"], poses["full"], atol=1e-5)

    def test_track_roi_violation_recovers_full_frame(self, caplog):
        """If the pose hint that sized the ROI lags the true motion and
        the refined pose's crop window leaves the streamed window, the
        fetch must detect it and transparently re-run the frame
        full-frame (ADVICE r2: stale _pose_hint silently degraded
        poses)."""
        import logging

        mesh = colored_box()
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(5), tiny_cfg().refiner.net)
        )
        e = FoundationPose(mesh=mesh, cfg=tiny_cfg(), refiner_params=params)
        gt = np.eye(4)
        gt[:3, 3] = [0.04, -0.03, 1.25]  # far enough that the ROI < frame
        rgb, depth, mask = synth_frame(mesh, gt)
        e.register(K, rgb, depth, mask, iteration=1)
        p_ok = e.track_one(rgb, depth, K, iteration=1)
        assert not any("ROI violated" in r.message for r in caplog.records)

        # Forge a stale hint: the ROI window lands away from the object,
        # so the (identity-refined) output pose's crop window pokes out.
        stale = e._pose_hint.copy()
        stale[:3, 3] = [-0.25, 0.2, 1.25]
        e._pose_hint = stale
        assert e._track_roi_window(K, H, W) is not None
        with caplog.at_level(logging.WARNING):
            p = e.track_one(rgb, depth, K, iteration=1)
        assert any("ROI violated" in r.message for r in caplog.records)
        # the recovery re-ran full-frame from the same input pose
        np.testing.assert_allclose(p, p_ok, atol=1e-5)
        # and the hint was refreshed from the full-frame result
        assert np.linalg.norm(e._pose_hint[:3, 3] - stale[:3, 3]) > 0.1

    def test_track_roi_violation_cascades_through_pipeline(self, caplog):
        """With frames in flight when a violation is detected, the
        correction must cascade: each successor re-runs full-frame from
        the corrected chain on fetch, so pipelined poses still equal
        sequential full-frame tracking."""
        import dataclasses
        import logging

        mesh = colored_box()
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(5), tiny_cfg().refiner.net)
        )
        gt = np.eye(4)
        gt[:3, 3] = [0.04, -0.03, 1.25]
        rgb, depth, mask = synth_frame(mesh, gt)

        cfg_full = dataclasses.replace(tiny_cfg(), track_roi=False)
        e_full = FoundationPose(mesh=mesh, cfg=cfg_full, refiner_params=params)
        e_full.register(K, rgb, depth, mask, iteration=1)
        f1 = e_full.track_one(rgb, depth, K, iteration=1)
        f2 = e_full.track_one(rgb, depth, K, iteration=1)

        e = FoundationPose(mesh=mesh, cfg=tiny_cfg(), refiner_params=params)
        e.register(K, rgb, depth, mask, iteration=1)
        stale = e._pose_hint.copy()
        stale[:3, 3] = [-0.25, 0.2, 1.25]
        e._pose_hint = stale
        # dispatch BOTH frames before fetching either: frame B chains
        # from frame A's (stale-window) device pose
        futA = e.track_one_async(rgb, depth, K, iteration=1)
        futB = e.track_one_async(rgb, depth, K, iteration=1)
        with caplog.at_level(logging.WARNING):
            pA = futA.result()
            pB = futB.result()
        assert any("ROI violated" in r.message for r in caplog.records)
        np.testing.assert_allclose(pA, f1, atol=1e-5)
        np.testing.assert_allclose(pB, f2, atol=1e-5)
        assert e._chain_repair is None  # chain fully repaired
        # and the device chain continues from the corrected pose
        p3 = e.track_one(rgb, depth, K, iteration=1)
        f3 = e_full.track_one(rgb, depth, K, iteration=1)
        np.testing.assert_allclose(p3, f3, atol=1e-5)

    def test_track_async_pipelined_matches_sequential(self, est):
        """Dispatching k frames ahead before fetching (track_one_async)
        returns the same poses as blocking track_one calls."""
        from collections import deque

        gt = np.eye(4)
        gt[:3, 3] = [0.0, 0.01, 0.9]
        mesh = colored_box()
        frames = []
        for dx in (0.0, 0.002, 0.004, 0.006, 0.008):
            g = gt.copy()
            g[0, 3] += dx
            frames.append(synth_frame(mesh, g))
        # zeroed heads: deterministic identity refinement (random weights
        # would wander the pose and with it the lag-dependent ROI window)
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(9), tiny_cfg().refiner.net)
        )

        def fresh():
            e = FoundationPose(mesh=mesh, cfg=tiny_cfg(), refiner_params=params)
            e.register(K, frames[0][0], frames[0][1], frames[0][2], iteration=1)
            return e

        e1 = fresh()
        seq = [e1.track_one(r, d, K, iteration=1) for r, d, _ in frames]

        e2 = fresh()
        futs: deque = deque()
        got = []
        for r, d, _ in frames:
            futs.append(e2.track_one_async(r, d, K, iteration=1))
            if len(futs) > 2:
                got.append(futs.popleft().result())
        while futs:
            got.append(futs.popleft().result())
        assert len(got) == len(seq)
        for a, b in zip(got, seq):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_batched_fetch_matches_sequential(self, est):
        """fetch_track_results resolves k in-flight frames with ONE
        device transfer; the poses (and the per-frame containment
        checks) must match per-frame result() calls, and mixing — some
        frames already resolved, some prefilled — must be safe."""
        from foundationpose_tpu.pipeline import fetch_track_results

        gt = np.eye(4)
        gt[:3, 3] = [0.0, 0.01, 0.9]
        mesh = colored_box()
        frames = []
        for dx in (0.0, 0.002, 0.004, 0.006):
            g = gt.copy()
            g[0, 3] += dx
            frames.append(synth_frame(mesh, g))
        params = zero_refiner_heads(
            init_refine_net(jax.random.PRNGKey(9), tiny_cfg().refiner.net)
        )

        def fresh():
            e = FoundationPose(mesh=mesh, cfg=tiny_cfg(), refiner_params=params)
            e.register(K, frames[0][0], frames[0][1], frames[0][2], iteration=1)
            return e

        e1 = fresh()
        seq = [e1.track_one(r, d, K, iteration=1) for r, d, _ in frames]

        e2 = fresh()
        futs = [e2.track_one_async(r, d, K, iteration=1) for r, d, _ in frames]
        futs[0].result()  # one already-resolved result in the batch
        got = fetch_track_results(futs)
        assert len(got) == len(seq)
        for a, b in zip(got, seq):
            np.testing.assert_allclose(a, b, atol=1e-5)
        # idempotent: result() after the batch returns the cached pose
        np.testing.assert_allclose(futs[-1].result(), got[-1], atol=0)


class TestTrackPack:
    """Packed single-buffer tracking upload (graph.pack_track_frame /
    track_graph_packed): the on-device unpack must invert the host-side
    pack exactly (rgb, ROI offset) and within the 0.25 mm fixed-point
    quantum (depth)."""

    def test_pack_roundtrip(self):
        from foundationpose_tpu.pipeline.graph import (
            DEPTH_PACK_SCALE,
            TRACK_PACK_FOOTER,
            pack_track_frame,
        )

        rng = np.random.default_rng(11)
        h, w = 48, 64
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        depth = (rng.uniform(0.0, 3.0, size=(h, w))).astype(np.float32)
        depth[rng.uniform(size=(h, w)) < 0.3] = 0.0  # invalid pixels
        nan_px = rng.uniform(size=(h, w)) < 0.05  # sensor NaNs -> invalid
        depth[nan_px] = np.nan
        x0, y0 = 321, 77
        buf = pack_track_frame(rgb, depth, x0, y0)
        depth[nan_px] = 0.0  # packed as invalid; compare against that
        assert buf.dtype == np.uint8
        assert buf.size == h * w * 5 + TRACK_PACK_FOOTER
        img = buf[: h * w * 5].reshape(h, w, 5)
        np.testing.assert_array_equal(img[..., :3], rgb)
        lo = img[..., 3].astype(np.uint32)
        hi = img[..., 4].astype(np.uint32)
        dec = (lo + hi * 256).astype(np.float32) / DEPTH_PACK_SCALE
        # quantization bound: half a quantum
        assert np.abs(dec - depth).max() <= 0.5 / DEPTH_PACK_SCALE + 1e-7
        assert (dec[depth == 0] == 0).all()  # invalid stays exactly 0
        foot = buf[h * w * 5 :].astype(np.int64)
        assert foot[0] + foot[1] * 256 == x0
        assert foot[2] + foot[3] * 256 == y0

    def test_unpack_inverts_pack_on_device(self):
        """The device-side unpack must reproduce the host inputs exactly
        (rgb, ROI offset) / within half a quantum (depth) — asserted on
        the TENSORS, not through pose agreement, so a broken
        dequantization or a wrong footer decode cannot hide behind a
        refiner whose output ignores the inputs (ADVICE r4)."""
        from foundationpose_tpu.pipeline.graph import (
            DEPTH_PACK_SCALE,
            pack_track_frame,
            unpack_track_frame,
        )

        rng = np.random.default_rng(3)
        h, w = 40, 56
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        depth = rng.uniform(0.0, 4.0, size=(h, w)).astype(np.float32)
        depth[rng.uniform(size=(h, w)) < 0.25] = 0.0
        x0, y0 = 777, 301
        buf = jnp.asarray(pack_track_frame(rgb, depth, x0, y0))
        rgb_d, depth_d, x0_d, y0_d = jax.jit(
            lambda b: unpack_track_frame(b, (h, w))
        )(buf)
        # one f32 ulp: device lowers /255 to a reciprocal multiply
        np.testing.assert_allclose(
            np.asarray(rgb_d), rgb.astype(np.float32) / 255.0, atol=1e-6
        )
        assert np.abs(np.asarray(depth_d) - depth).max() <= (
            0.5 / DEPTH_PACK_SCALE + 1e-7
        )
        assert (np.asarray(depth_d)[depth == 0] == 0).all()
        assert float(x0_d) == x0 and float(y0_d) == y0

    @pytest.mark.slow
    def test_packed_matches_unpacked_tracking(self):
        """track_pack=True and =False must agree THROUGH A LIVE REFINER
        (random nonzero heads — zeroed heads made this trivially true,
        ADVICE r4): the packed path's on-device unpack + K principal-
        point shift is the same computation, differing only by
        sub-quantum (<=0.125 mm) depth rounding at the network input. A
        broken unpack produces centimeter-scale garbage."""
        import dataclasses

        mesh = colored_box()
        params = init_refine_net(jax.random.PRNGKey(2), tiny_cfg().refiner.net)
        gt = np.eye(4)
        gt[:3, 3] = [0.04, -0.03, 1.25]  # far enough that the ROI < frame
        rgb, depth, mask = synth_frame(mesh, gt)
        poses = {}
        for pack in (True, False):
            cfg = dataclasses.replace(tiny_cfg(), track_pack=pack)
            e = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
            e.register(K, rgb, depth, mask, iteration=1)
            assert e._track_roi_window(K, H, W) is not None
            before = e._pose_hint.copy()
            for _ in range(2):
                p = e.track_one(rgb, depth, K, iteration=1)
            poses[pack] = p
            # the refiner must have MOVED the pose (live heads — a
            # zero-delta refiner would make this comparison vacuous)
            assert np.abs(e._pose_hint - before).max() > 1e-6
        np.testing.assert_allclose(poses[True], poses[False], atol=1e-3)

    def test_register_unpack_inverts_pack_on_device(self):
        """pack_register_frame's device-side inverse must reproduce the
        host inputs: rgb within 1 f32 ulp, depth within half a quantum,
        mask BIT-EXACT (it rides a packbits bit plane)."""
        from foundationpose_tpu.pipeline.graph import (
            DEPTH_PACK_SCALE,
            pack_register_frame,
            unpack_register_frame,
        )

        rng = np.random.default_rng(5)
        h, w = 40, 56
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        depth = rng.uniform(0.0, 4.0, size=(h, w)).astype(np.float32)
        depth[rng.uniform(size=(h, w)) < 0.25] = 0.0
        depth[rng.uniform(size=(h, w)) < 0.05] = np.nan  # -> invalid
        mask = (rng.uniform(size=(h, w)) < 0.4).astype(np.uint8) * 7  # any
        buf = jnp.asarray(pack_register_frame(rgb, depth, mask, 48, 321))
        rgb_d, depth_d, mask_d, x0_d, y0_d = jax.jit(
            lambda b: unpack_register_frame(b, (h, w))
        )(buf)
        assert (float(x0_d), float(y0_d)) == (48.0, 321.0)
        np.testing.assert_allclose(
            np.asarray(rgb_d), rgb.astype(np.float32) / 255.0, atol=1e-6
        )
        fin = np.isfinite(depth)
        # half a quantum + f32 decode rounding (~2.4e-7 m at 4 m range)
        assert np.abs(np.asarray(depth_d)[fin] - depth[fin]).max() <= (
            0.5 / DEPTH_PACK_SCALE + 1e-6
        )
        assert (np.asarray(depth_d)[~fin] == 0).all()  # NaN -> invalid
        np.testing.assert_array_equal(np.asarray(mask_d), (mask > 0))

    @pytest.mark.slow
    def test_packed_matches_unpacked_register(self):
        """The three register upload modes — ROI-windowed packed, full-
        frame packed, unpacked — must pick the same hypothesis and land
        within sub-millimeter agreement: the packed graphs run the
        identical _register_body after the on-device unpack, and the
        window + K principal-point shift is an exact viewport
        reparameterization."""
        import dataclasses

        mesh = colored_box()
        params = init_refine_net(jax.random.PRNGKey(6), tiny_cfg().refiner.net)
        gt = np.eye(4)
        # far enough that the ROI window (crop extent x margin, 64-px
        # buckets) is strictly smaller than the frame
        gt[:3, 3] = [0.02, -0.01, 1.3]
        rgb, depth, mask = synth_frame(mesh, gt)
        out = {}
        for variant in ("roi", "pack", "plain"):
            cfg = dataclasses.replace(
                tiny_cfg(),
                register_pack=variant != "plain",
                register_roi=variant == "roi",
            )
            e = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
            if variant == "roi":
                roi = e._register_roi_window(K, depth, mask)
                assert roi is not None and roi[2] < min(depth.shape), roi
            pose = e.register(K, rgb, depth, mask, iteration=2)
            assert e.register_roi_recoveries == 0
            out[variant] = (pose, e.best_id, np.asarray(e.scores))
        assert out["roi"][1] == out["pack"][1] == out["plain"][1]
        np.testing.assert_allclose(out["roi"][0], out["pack"][0], atol=1e-3)
        np.testing.assert_allclose(out["pack"][0], out["plain"][0], atol=1e-3)

    def test_register_roi_recovery_reruns_full_frame(self):
        """If the refined winner's crop escapes the shipped register
        window, register() must transparently re-run full-frame (the
        recovery contract the config documents). Forced here by a
        refiner whose translation head pushes every pose far sideways."""
        import dataclasses

        mesh = colored_box()
        cfg = tiny_cfg()
        params = init_refine_net(jax.random.PRNGKey(6), cfg.refiner.net)
        # constant large +x shift per iteration: the winner's crop ends
        # far outside any detection-sized window
        params = jax.tree.map(lambda x: x, params)
        params["trans_head"]["1"]["kernel"] = jnp.zeros_like(
            params["trans_head"]["1"]["kernel"]
        )
        params["trans_head"]["1"]["bias"] = (
            jnp.zeros_like(params["trans_head"]["1"]["bias"]).at[0].set(5.0)
        )
        params["rot_head"]["1"]["kernel"] = jnp.zeros_like(
            params["rot_head"]["1"]["kernel"]
        )
        params["rot_head"]["1"]["bias"] = jnp.zeros_like(
            params["rot_head"]["1"]["bias"]
        )
        gt = np.eye(4)
        gt[:3, 3] = [0.02, -0.01, 1.3]
        rgb, depth, mask = synth_frame(mesh, gt)
        e = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
        assert e._register_roi_window(K, depth, mask) is not None
        pose_roi = e.register(K, rgb, depth, mask, iteration=1)
        assert e.register_roi_recoveries == 1
        # the recovered result equals a full-frame-from-the-start run
        e2 = FoundationPose(
            mesh=mesh,
            cfg=dataclasses.replace(cfg, register_roi=False),
            refiner_params=params,
        )
        pose_full = e2.register(K, rgb, depth, mask, iteration=1)
        np.testing.assert_allclose(pose_roi, pose_full, atol=1e-3)

    @pytest.mark.slow
    def test_chain_graph_matches_per_frame_packed(self):
        """track_chain_graph (k steps chained on device via lax.scan)
        must reproduce k sequential track_graph_packed calls — it is the
        load-robust bench metric, so it has to measure the same
        computation. Live refiner weights; full-frame packing (x0=y0=0)
        so every step sees identical inputs in both paths."""
        from foundationpose_tpu.pipeline.graph import (
            pack_track_frame,
            track_chain_graph,
            track_graph_packed,
        )

        mesh = colored_box()
        cfg = tiny_cfg()
        params = init_refine_net(jax.random.PRNGKey(4), cfg.refiner.net)
        gt = np.eye(4)
        gt[:3, 3] = [0.01, -0.02, 0.95]
        frames = []
        for i, dx in enumerate((0.0, 0.003, 0.006, 0.009)):
            g = gt.copy()
            g[0, 3] += dx
            r, d, _ = synth_frame(mesh, g)
            frames.append(pack_track_frame(r, d, 0, 0))
        bufs = jnp.asarray(np.stack(frames))

        e = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
        mt, diam = e.mesh_tensors, jnp.float32(e.diameter)
        Kj = jnp.asarray(K, jnp.float32)
        pose0 = jnp.asarray(gt, jnp.float32)

        seq, p = [], pose0
        for i in range(len(frames)):
            p = track_graph_packed(
                params, cfg, mt, p, Kj, bufs[i], diam, hw=(H, W),
                iterations=2,
            )
            seq.append(np.asarray(p))
        chain = np.asarray(track_chain_graph(
            params, cfg, mt, pose0, Kj, bufs, diam, hw=(H, W), iterations=2
        ))
        np.testing.assert_allclose(chain, np.stack(seq), atol=1e-5)
        # the chain actually tracked the moving object (poses differ)
        assert np.abs(chain[-1] - chain[0]).max() > 1e-4


class TestRefinerStep:
    def test_refine_moves_toward_target_with_oracle_delta(self, est):
        """apply_pose_delta semantics: a synthetic network output that
        encodes the true delta must exactly reproduce the target pose."""
        from foundationpose_tpu.pipeline.refiner import apply_pose_delta
        from foundationpose_tpu.geometry import (
            pose_to_egocentric_delta_pose,
            so3_log_map,
        )

        cfg = RefinerCfg(normalize_xyz=True)
        rng = np.random.default_rng(3)
        A = np.eye(4, dtype=np.float32)
        A[:3, 3] = [0, 0, 1.0]
        B = np.eye(4, dtype=np.float32)
        B[:3, :3] = np.asarray(
            jax.vmap(lambda w: jnp.eye(3))(jnp.zeros((1, 3)))
        )[0]
        # small random target delta
        from foundationpose_tpu.geometry import so3_exp_map as exp

        w = jnp.array([[0.05, -0.03, 0.08]])
        B[:3, :3] = np.asarray(exp(w))[0]
        B[:3, 3] = A[:3, 3] + np.array([0.01, -0.02, 0.03])

        diameter = 0.3
        dt, dR = pose_to_egocentric_delta_pose(
            jnp.asarray(A[None]), jnp.asarray(B[None])
        )
        # invert the parameterization: trans = dt/(d/2); rot = atanh(log(dR^T)/rot_norm)
        trans_out = dt / (diameter / 2.0)
        rot_out = jnp.arctanh(so3_log_map(jnp.swapaxes(dR, -1, -2)) / cfg.rot_normalizer)
        out = apply_pose_delta(
            jnp.asarray(A[None]), trans_out, rot_out, cfg, jnp.float32(diameter)
        )
        np.testing.assert_allclose(np.asarray(out)[0], B, atol=1e-5)

    def test_refine_poses_runs_tiny_net(self, est):
        """Full refine_poses with a tiny random net: shapes + finiteness."""
        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        cfg = RefinerCfg(net=RefineNetCfg(base_width=4), compute_dtype="float32")
        params = init_refine_net(jax.random.PRNGKey(1), cfg.net)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, 3] = [0, 0, 0.9]
        rgb, depth, mask = synth_frame(mesh, gt)
        xyz = np.zeros((H, W, 3), np.float32)
        xyz[..., 2] = depth
        poses = jnp.asarray(np.tile(gt[None], (2, 1, 1)))
        out = refine_poses(
            params,
            cfg,
            mt,
            poses,
            jnp.asarray(K),
            jnp.asarray(rgb, jnp.float32) / 255.0,
            jnp.asarray(xyz),
            jnp.float32(0.3),
            iterations=1,
        )
        out = np.asarray(out)
        assert out.shape == (2, 4, 4)
        assert np.isfinite(out).all()
        # rotation block stays orthonormal
        RtR = np.einsum("nij,nik->njk", out[:, :3, :3], out[:, :3, :3])
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)


class TestUseNormalChannels:
    def test_crops_have_9_channels_and_refine_runs(self):
        """use_normal appends raw camera-space normals as channels 7-9
        (predict_score.py:190-193) on BOTH the render and observation
        sides; a c_in=9 refiner consumes them."""
        from foundationpose_tpu.geometry.projection import depth_to_xyz_map
        from foundationpose_tpu.pipeline.crops import make_crop_inputs

        mesh = colored_box()
        gt = np.eye(4, dtype=np.float32)
        gt[:3, 3] = [0.0, 0.0, 0.6]
        rgb, depth, _ = synth_frame(mesh, gt)
        mt = make_mesh_tensors(mesh)
        xyz = depth_to_xyz_map(jnp.asarray(depth), jnp.asarray(K))
        poses = jnp.asarray(np.tile(gt[None], (4, 1, 1)))

        a, b, _tf = make_crop_inputs(
            mt, poses, jnp.asarray(K),
            jnp.asarray(rgb.astype(np.float32) / 255), xyz,
            jnp.float32(0.2), input_res=64, crop_ratio=1.2,
            normalize_xyz=True, invalid_z=0.001, use_normal=True,
        )
        assert a.shape[-1] == 9 and b.shape[-1] == 9
        # rendered normals are unit-ish inside the mask, zero outside
        na = np.asarray(a[..., 6:9])
        norms = np.linalg.norm(na, axis=-1)
        assert norms.max() < 1.01
        assert (norms > 0.9).sum() > 100
        # observation normals face the camera on a front-facing box
        nb = np.asarray(b[..., 6:9])
        inside = np.linalg.norm(nb, axis=-1) > 0.5
        assert inside.sum() > 100
        assert (nb[..., 2][inside] < 0).mean() > 0.9

        cfg = RefinerCfg(
            net=RefineNetCfg(base_width=4, c_in=9), input_res=64,
            use_normal=True,
        )
        params = init_refine_net(jax.random.PRNGKey(0), cfg.net)
        refined = refine_poses(
            params, cfg, mt, poses, jnp.asarray(K),
            jnp.asarray(rgb.astype(np.float32) / 255), xyz,
            jnp.float32(0.2), iterations=1,
        )
        assert np.isfinite(np.asarray(refined)).all()
