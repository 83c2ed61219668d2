"""MultiTracker: batched multi-object tracking parity.

Contract under test (pipeline/multi.py): tracking M objects through the
fused multi-object graph returns the SAME poses as running M independent
single-object `track_one` calls on the same frame — the batching is an
execution-layout change (shared frame prep, one network forward), not a
semantic one.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.geometry.icosphere import icosphere
from foundationpose_tpu.meshio import TriMesh, make_box
from foundationpose_tpu.models.networks import RefineNetCfg, ScoreNetCfg, init_refine_net
from foundationpose_tpu.ops import render_mesh
from foundationpose_tpu.pipeline import (
    EstimatorCfg,
    FoundationPose,
    MultiTracker,
    RefinerCfg,
    ScorerCfg,
)

K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]], dtype=np.float32)
H, W = 240, 320


def _meshes():
    rng = np.random.default_rng(3)
    box = make_box(np.array([0.12, 0.16, 0.2]))
    box.vertex_colors = rng.integers(40, 255, size=(8, 3)).astype(np.uint8)
    v, f = icosphere(2, radius=0.07)
    ball = TriMesh(
        vertices=v.astype(np.float64),
        faces=f.astype(np.int64),
        vertex_colors=rng.integers(40, 255, size=(len(v), 3)).astype(np.uint8),
    )
    return [box, ball]


def _poses():
    p0 = np.eye(4)
    p0[:3, 3] = [-0.08, 0.01, 0.9]
    p1 = np.eye(4)
    p1[:3, 3] = [0.10, -0.02, 0.8]
    return [p0, p1]


def _frame(meshes, poses):
    """Composite synthetic RGB-D of all objects (z-merged)."""
    rgb = np.zeros((H, W, 3), np.uint8)
    depth = np.full((H, W), np.inf, np.float32)
    for mesh, pose in zip(meshes, poses):
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
        d = np.asarray(out.depth[0]).astype(np.float32)
        d = np.where(d > 0, d, np.inf)
        c = (np.asarray(out.color[0]) * 255).astype(np.uint8)
        closer = d < depth
        depth = np.where(closer, d, depth)
        rgb = np.where(closer[..., None], c, rgb)
    depth = np.where(np.isinf(depth), 0.0, depth)
    return rgb, depth


def _cfg():
    return EstimatorCfg(
        refiner=RefinerCfg(net=RefineNetCfg(base_width=4), compute_dtype="float32"),
        scorer=ScorerCfg(net=ScoreNetCfg(base_width=4), mode="depth"),
        min_n_views=4,
        inplane_step_deg=120.0,
        track_roi=False,
    )


@pytest.fixture(scope="module")
def setup():
    meshes = _meshes()
    poses = _poses()
    cfg = _cfg()
    # Random (non-zero) refiner: exercises the full delta path; the
    # deltas are garbage but identical between single and multi runs.
    params = init_refine_net(jax.random.PRNGKey(7), cfg.refiner.net)
    ests = []
    for mesh, pose in zip(meshes, poses):
        est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
        raw = pose @ np.linalg.inv(est.get_tf_to_centered_mesh())
        est.pose_last = jnp.asarray(raw, jnp.float32)
        ests.append(est)
    rgb, depth = _frame(meshes, poses)
    return meshes, poses, cfg, params, ests, rgb, depth


class TestMultiTracker:
    def test_matches_single_object_tracking(self, setup):
        meshes, poses, cfg, params, ests, rgb, depth = setup
        singles = np.stack(
            [est.track_one(rgb, depth, K, iteration=2) for est in ests]
        )
        tracker = MultiTracker.from_estimators(ests2 := [
            # fresh estimators: the singles above advanced pose_last
            _reseed(est, pose) for est, pose in zip(ests, poses)
        ])
        multi = tracker.track(rgb, depth, K, iteration=2)
        assert multi.shape == (2, 4, 4)
        np.testing.assert_allclose(multi, singles, atol=1e-4)

    def test_zero_iterations_passthrough(self, setup):
        meshes, poses, cfg, params, ests, rgb, depth = setup
        tracker = MultiTracker(meshes=meshes, cfg=cfg)  # no weights
        assert not tracker.has_refiner
        tracker.set_poses(np.stack(poses))
        out = tracker.track(rgb, depth, K, iteration=2)
        np.testing.assert_allclose(out, np.stack(poses), atol=1e-5)

    def test_async_pipelined_matches_sequential(self, setup):
        meshes, poses, cfg, params, ests, rgb, depth = setup
        a = MultiTracker(meshes=meshes, cfg=cfg, refiner_params=params)
        a.set_poses(np.stack(poses))
        b = MultiTracker(meshes=meshes, cfg=cfg, refiner_params=params)
        b.set_poses(np.stack(poses))
        frames = [(rgb, depth), (rgb, depth)]
        seq = [a.track(r, d, K, iteration=1) for r, d in frames]
        futs = [b.track_async(r, d, K, iteration=1) for r, d in frames]
        pip = [f.result() for f in futs]
        for s, p in zip(seq, pip):
            np.testing.assert_allclose(p, s, atol=1e-5)

    def test_set_poses_shape_check(self, setup):
        meshes, poses, cfg, params, ests, rgb, depth = setup
        tracker = MultiTracker(meshes=meshes, cfg=cfg, refiner_params=params)
        with pytest.raises(ValueError):
            tracker.set_poses(np.eye(4)[None])
        with pytest.raises(RuntimeError):
            MultiTracker(meshes=meshes, cfg=cfg).track_async(rgb, depth, K)

    def test_from_estimators_requires_registered(self, setup):
        meshes, poses, cfg, params, ests, rgb, depth = setup
        fresh = FoundationPose(mesh=meshes[0], cfg=cfg, refiner_params=params)
        with pytest.raises(RuntimeError):
            MultiTracker.from_estimators([fresh])


def _reseed(est, pose):
    raw = pose @ np.linalg.inv(est.get_tf_to_centered_mesh())
    est.pose_last = jnp.asarray(raw, jnp.float32)
    return est


class TestMultiTrackerROI:
    """ROI streaming: per-object windows are an exact reparameterization;
    violations recover full-frame (pipeline/multi.py::multi_track_roi_graph)."""

    def _roi_cfg(self):
        import dataclasses
        # margin 1.2 keeps the box's window (192 px) inside the 240-px
        # test frame; the default 1.8 would disengage ROI here
        return dataclasses.replace(_cfg(), track_roi=True, track_roi_margin=1.2)

    def test_roi_matches_full_frame(self, setup):
        meshes, poses, cfg, params, ests, rgb, depth = setup
        full = MultiTracker(meshes=meshes, cfg=_cfg(), refiner_params=params)
        full.set_poses(np.stack(poses))
        out_full = full.track(rgb, depth, K, iteration=2)

        roi = MultiTracker(meshes=meshes, cfg=self._roi_cfg(), refiner_params=params)
        roi.set_poses(np.stack(poses))
        assert roi._roi_windows(K, H, W) is not None  # windows engage
        out_roi = roi.track(rgb, depth, K, iteration=2)
        np.testing.assert_allclose(out_roi, out_full, atol=1e-5)

    def test_roi_violation_recovers_full_frame(self, setup, caplog):
        import logging

        meshes, poses, cfg, params, ests, rgb, depth = setup
        full = MultiTracker(meshes=meshes, cfg=_cfg(), refiner_params=params)
        full.set_poses(np.stack(poses))
        out_full = full.track(rgb, depth, K, iteration=2)

        roi = MultiTracker(meshes=meshes, cfg=self._roi_cfg(), refiner_params=params)
        roi.set_poses(np.stack(poses))
        # Corrupt object 1's hint so its window misses the object: the
        # fetch must detect the violation and transparently re-run the
        # frame full-frame.
        bad = roi._pose_hints.copy()
        bad[1, 0, 3] -= 0.35  # ~120 px left at z=0.8: window misses object
        roi._pose_hints = bad
        with caplog.at_level(logging.WARNING, logger="foundationpose_tpu.pipeline.multi"):
            out_roi = roi.track(rgb, depth, K, iteration=2)
        assert any("ROI violated" in r.message for r in caplog.records)
        np.testing.assert_allclose(out_roi, out_full, atol=1e-5)
        # Device chain repaired: next frame continues from corrected poses
        out2_roi = roi.track(rgb, depth, K, iteration=1)
        out2_full = full.track(rgb, depth, K, iteration=1)
        np.testing.assert_allclose(out2_roi, out2_full, atol=1e-5)

    def test_roi_violation_cascades_through_pipeline(self, setup):
        """Frames in flight when a violation is detected re-run from the
        corrected chain on fetch (cascade), keeping pipelined multi
        tracking at full-frame parity."""
        meshes, poses, cfg, params, ests, rgb, depth = setup
        full = MultiTracker(meshes=meshes, cfg=_cfg(), refiner_params=params)
        full.set_poses(np.stack(poses))
        f1 = full.track(rgb, depth, K, iteration=1)
        f2 = full.track(rgb, depth, K, iteration=1)

        roi = MultiTracker(meshes=meshes, cfg=self._roi_cfg(), refiner_params=params)
        roi.set_poses(np.stack(poses))
        bad = roi._pose_hints.copy()
        bad[1, 0, 3] -= 0.35
        roi._pose_hints = bad
        futA = roi.track_async(rgb, depth, K, iteration=1)
        futB = roi.track_async(rgb, depth, K, iteration=1)
        pA = futA.result()
        pB = futB.result()
        np.testing.assert_allclose(pA, f1, atol=1e-5)
        np.testing.assert_allclose(pB, f2, atol=1e-5)
        assert roi._chain_repair is None  # chain fully repaired
