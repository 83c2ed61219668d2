"""Trainability: synthetic pair generation round-trips through the delta
parameterization, and a few refiner train steps reduce the loss."""
import numpy as np
import jax
import jax.numpy as jnp

from foundationpose_tpu.datasets.synthetic import (
    sample_pose_pairs,
    delta_targets,
    make_refiner_batch,
)
from foundationpose_tpu.pipeline.config import RefinerCfg
from foundationpose_tpu.pipeline.refiner import apply_pose_delta
from foundationpose_tpu.pipeline import make_mesh_tensors
from foundationpose_tpu.models.networks import RefineNetCfg, init_refine_net
from foundationpose_tpu.models.training import (
    TrainCfg,
    make_optimizer,
    refine_train_step,
)
from tests.test_pipeline import colored_box, K


class TestDeltaTargets:
    def test_targets_invert_apply(self):
        """apply_pose_delta(poseA, targets) must reproduce poseB exactly —
        the generator and the inference delta are inverse maps."""
        cfg = RefinerCfg(compute_dtype="float32")
        poseA, poseB = sample_pose_pairs(jax.random.PRNGKey(0), 8)
        d = jnp.float32(0.3)
        trans_t, rot_t = delta_targets(poseA, poseB, cfg, d)
        # network applies tanh to rot output; targets are pre-tanh
        rec = apply_pose_delta(poseA, trans_t, rot_t, cfg, d)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(poseB), atol=1e-4)

    def test_pose_pairs_valid(self):
        poseA, poseB = sample_pose_pairs(jax.random.PRNGKey(1), 16)
        for P in (np.asarray(poseA), np.asarray(poseB)):
            RtR = np.einsum("nij,nik->njk", P[:, :3, :3], P[:, :3, :3])
            np.testing.assert_allclose(RtR, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
            assert (P[:, 2, 3] > 0.3).all()  # in front of the camera


class TestRefinerTraining:
    def test_loss_decreases_on_synthetic_batch(self):
        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        cfg = RefinerCfg(net=RefineNetCfg(base_width=4), compute_dtype="float32")
        batch = make_refiner_batch(
            jax.random.PRNGKey(0), mt, jnp.asarray(K), cfg, jnp.float32(0.3),
            n=4, frame_hw=(120, 160),
        )
        assert np.isfinite(np.asarray(batch["A"])).all()
        assert np.isfinite(np.asarray(batch["trans_target"])).all()
        # hypothesis and observation crops overlap but differ
        assert np.abs(np.asarray(batch["A"]) - np.asarray(batch["B"])).mean() > 1e-4

        params = init_refine_net(jax.random.PRNGKey(1), cfg.net)
        tcfg = TrainCfg(lr=1e-3, compute_dtype="float32")
        opt_state = make_optimizer(tcfg).init(params)
        train_batch = {k: batch[k] for k in ("A", "B", "trans_target", "rot_target")}
        losses = []
        for _ in range(8):
            params, opt_state, loss = refine_train_step(
                params, opt_state, cfg.net, tcfg, train_batch
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestRefinerLearnsToRefine:
    def test_trained_refiner_reduces_pose_error(self):
        """End-to-end trainability proof: a small refiner trained on
        synthetic pairs must reduce pose error when applied through the
        full refine_poses pipeline on held-out perturbations. (The
        reference never shipped its trainer; this validates ours.)"""
        import dataclasses
        from foundationpose_tpu.pipeline import RasterCfg
        from foundationpose_tpu.pipeline.refiner import refine_poses
        from foundationpose_tpu.pipeline import make_mesh_tensors
        from foundationpose_tpu.utils.metrics import add_err
        from foundationpose_tpu.ops.rasterizer import render_mesh
        from foundationpose_tpu.geometry.projection import depth_to_xyz_map
        from foundationpose_tpu.datasets.synthetic import sample_pose_pairs

        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        Kj = jnp.asarray(K)
        cfg = RefinerCfg(
            net=RefineNetCfg(base_width=8), compute_dtype="float32",
            input_res=64,
        )
        diameter = jnp.float32(0.28)

        params = init_refine_net(jax.random.PRNGKey(7), cfg.net)
        tcfg = TrainCfg(lr=1e-3, compute_dtype="float32")
        opt_state = make_optimizer(tcfg).init(params)
        for step in range(150):
            batch = make_refiner_batch(
                jax.random.PRNGKey(100 + step), mt, Kj, cfg, diameter,
                n=16, frame_hw=(120, 160),
            )
            train_batch = {
                k: batch[k] for k in ("A", "B", "trans_target", "rot_target")
            }
            params, opt_state, loss = refine_train_step(
                params, opt_state, cfg.net, tcfg, train_batch
            )
        assert np.isfinite(float(loss))

        # Held-out evaluation through the real pipeline: render an
        # observation at gt, refine perturbed poses once.
        poseA, poseB = sample_pose_pairs(jax.random.PRNGKey(999), 8)
        errs_before, errs_after = [], []
        pts = mesh.vertices
        for i in range(8):
            gt = np.asarray(poseB[i])
            out = render_mesh(
                mt.pos, mt.faces, jnp.asarray(gt[None], jnp.float32), Kj,
                out_hw=(120, 160), vertex_color=mt.vertex_color,
                vnormals=mt.vnormals, use_light=True,
            )
            rgb = out.color[0]
            xyz = out.xyz[0]
            refined = refine_poses(
                params, cfg, mt, jnp.asarray(np.asarray(poseA[i])[None], jnp.float32),
                Kj, rgb, xyz, diameter, iterations=1,
            )
            errs_before.append(add_err(np.asarray(poseA[i]), gt, pts))
            errs_after.append(add_err(np.asarray(refined[0]), gt, pts))
        # Trained refinement must help on average.
        assert np.mean(errs_after) < np.mean(errs_before)
