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
