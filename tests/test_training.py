"""Trainability: synthetic pair generation round-trips through the delta
parameterization, and a few refiner train steps reduce the loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


class TestOcclusionAugmentation:
    def test_refiner_batch_occlusion(self):
        """occlude_prob corrupts ONLY the observation branch: a flat-
        color rectangle whose geometry channels are zeroed (invalid),
        with targets and the hypothesis branch untouched."""
        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        cfg = RefinerCfg(
            net=RefineNetCfg(base_width=4), compute_dtype="float32",
            input_res=32,
        )
        kw = dict(n=8, frame_hw=(120, 160))
        b0 = make_refiner_batch(
            jax.random.PRNGKey(0), mt, jnp.asarray(K), cfg, jnp.float32(0.28),
            **kw,
        )
        b1 = make_refiner_batch(
            jax.random.PRNGKey(0), mt, jnp.asarray(K), cfg, jnp.float32(0.28),
            occlude_prob=0.9, **kw,
        )
        assert float(jnp.abs(b0["A"] - b1["A"]).max()) == 0.0
        assert float(jnp.abs(b0["B"] - b1["B"]).max()) > 0.0
        np.testing.assert_array_equal(
            np.asarray(b0["trans_target"]), np.asarray(b1["trans_target"])
        )
        # occluded pixels (color changed) carry invalid (zero) xyz
        diff = np.asarray(
            jnp.abs(b0["B"][..., :3] - b1["B"][..., :3]).sum(-1) > 1e-6
        )
        assert diff.any()
        assert (np.asarray(b1["B"][..., 3:])[diff] == 0).all()

    def test_scorer_batch_occlusion_shared_and_label_free(self):
        """The scorer's occluder lives in FRAME space (one rectangle for
        the whole hypothesis group) and never touches the ADD targets —
        occlusion changes what the net sees, not what is true."""
        from foundationpose_tpu.datasets.synthetic import make_scorer_batch
        from foundationpose_tpu.models.networks import ScoreNetCfg
        from foundationpose_tpu.pipeline import ScorerCfg

        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        scfg = ScorerCfg(
            net=ScoreNetCfg(base_width=4), input_res=32, mode="network",
            compute_dtype="float32",
        )
        kw = dict(n=8, frame_hw=(120, 160))
        s0 = make_scorer_batch(
            jax.random.PRNGKey(1), mt, jnp.asarray(K), scfg, jnp.float32(0.28),
            **kw,
        )
        s1 = make_scorer_batch(
            jax.random.PRNGKey(1), mt, jnp.asarray(K), scfg, jnp.float32(0.28),
            occlude_prob=1.0, **kw,
        )
        assert float(jnp.abs(s0["B"] - s1["B"]).max()) > 0.0
        np.testing.assert_array_equal(
            np.asarray(s0["target"]), np.asarray(s1["target"])
        )
        np.testing.assert_array_equal(
            np.asarray(s0["poses"]), np.asarray(s1["poses"])
        )


@pytest.mark.slow
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


@pytest.mark.slow
class TestTrainedNetworkRegistration:
    def test_network_scored_registration_beats_depth(self):
        """VERDICT #4: train a tiny refiner AND scorer on synthetic data,
        then prove full register() in mode='network' (a) ranks correctly
        on held-out hypothesis groups, (b) picks a top refined hypothesis,
        and (c) beats the classical depth scorer end-to-end on the same
        frame (reference oracle: SURVEY.md §4 self-consistency).

        Calibration (measured on this synthetic box): the raw 252-pose
        grid's best hypothesis is ~9 cm ADD (translation starts at the
        median-depth guess with its front-surface z bias); the tiny
        8-width/64px refiner plateaus at ~4 cm — so the pass bars are
        6 cm absolute and <= depth-scorer, not the full-size nets' cm
        regime. The refiner trains with rot_sigma ~half the grid spacing
        and trans_sigma at guess-error scale so registration hypotheses
        are in-distribution."""
        import dataclasses

        from foundationpose_tpu.datasets.synthetic import (
            make_refiner_batch, make_scorer_batch,
        )
        from foundationpose_tpu.models.networks import (
            ScoreNetCfg, apply_score_net, init_score_net,
        )
        from foundationpose_tpu.models.training import score_train_step
        from foundationpose_tpu.pipeline import (
            EstimatorCfg, ScorerCfg, FoundationPose,
        )
        from foundationpose_tpu.utils.metrics import adds_err
        from tests.test_pipeline import synth_frame

        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        Kj = jnp.asarray(K)
        diameter = jnp.float32(0.28)

        rcfg = RefinerCfg(
            net=RefineNetCfg(base_width=8), compute_dtype="float32",
            input_res=64,
        )
        rparams = init_refine_net(jax.random.PRNGKey(7), rcfg.net)
        tcfg = TrainCfg(lr=1e-3, compute_dtype="float32")
        opt_state = make_optimizer(tcfg).init(rparams)
        for step in range(250):
            batch = make_refiner_batch(
                jax.random.PRNGKey(100 + step), mt, Kj, rcfg, diameter,
                n=16, frame_hw=(120, 160), rot_sigma=0.25, trans_sigma=0.05,
            )
            tb = {k: batch[k] for k in ("A", "B", "trans_target", "rot_target")}
            rparams, opt_state, rloss = refine_train_step(
                rparams, opt_state, rcfg.net, tcfg, tb
            )
        assert np.isfinite(float(rloss))

        # Fixed-scene scorer training: the gt pose is pinned, each step
        # draws fresh graded perturbations (up to grid-scale rotations).
        scene_key = jax.random.PRNGKey(42)
        scfg = ScorerCfg(
            net=ScoreNetCfg(base_width=8), input_res=64, mode="network",
            compute_dtype="float32",
        )
        sparams = init_score_net(jax.random.PRNGKey(8), scfg.net)
        stcfg = TrainCfg(lr=3e-4, compute_dtype="float32")
        sopt = make_optimizer(stcfg).init(sparams)
        slosses = []
        for step in range(250):
            sb = make_scorer_batch(
                jax.random.PRNGKey(5000 + step), mt, Kj, scfg, diameter,
                n=16, frame_hw=(240, 320), scene_key=scene_key,
            )
            sparams, sopt, sloss = score_train_step(
                sparams, sopt, scfg.net, stcfg,
                {k: sb[k] for k in ("A", "B", "target")},
            )
            slosses.append(float(sloss))
        assert np.mean(slosses[-20:]) < np.mean(slosses[:20]) - 0.15

        # (a) held-out ranking: the scorer's top pick has the lowest ADD
        # in a fresh hypothesis group and correlates with -ADD.
        sb = make_scorer_batch(
            jax.random.PRNGKey(777), mt, Kj, scfg, diameter,
            n=16, frame_hw=(240, 320), scene_key=scene_key,
        )
        logits = np.asarray(
            apply_score_net(sparams, scfg.net, sb["A"], sb["B"],
                            dtype=jnp.float32)
        )
        adds = np.asarray(sb["add"])
        assert adds[np.argmax(logits)] <= np.partition(adds, 2)[2]
        assert np.corrcoef(logits, -adds)[0, 1] > 0.5

        # (b)+(c) full registration, network vs depth scorer.
        sb2 = make_scorer_batch(
            jax.random.PRNGKey(77), mt, Kj, scfg, diameter,
            n=16, frame_hw=(240, 320), scene_key=scene_key,
        )
        gt = np.asarray(sb2["gt"], np.float32)
        rgb, depth, mask = synth_frame(mesh, gt)

        def run(mode, sp):
            cfg = EstimatorCfg(
                refiner=rcfg, scorer=dataclasses.replace(scfg, mode=mode)
            )
            est = FoundationPose(
                mesh=mesh, cfg=cfg, refiner_params=rparams, scorer_params=sp
            )
            est.gt_pose = gt
            pose = est.register(K, rgb, depth, mask, iteration=5)
            errs = est.compute_add_err_to_gt_pose(np.asarray(est.poses))
            best_rank = int(np.where(np.argsort(errs) == 0)[0][0])
            return adds_err(pose, gt, mesh.vertices), best_rank

        err_net, rank_net = run("network", sparams)
        err_depth, _ = run("depth", None)
        assert err_net < 0.06, f"network-scored ADD-S {err_net}"
        assert err_net <= err_depth + 0.005, (err_net, err_depth)
        # the network put a near-best refined hypothesis on top
        assert rank_net <= 3, rank_net

        # Decision-level funneling check with the TRAINED nets, through
        # the documented fast_register() preset (prune@2, keep 64): the
        # funneled register's ADD-S must stay within 2 mm of the full
        # register — the CI gate behind the README's preset row.
        cfg_p = EstimatorCfg(
            refiner=rcfg, scorer=dataclasses.replace(scfg, mode="network"),
        ).fast_register()
        assert cfg_p.prune_after_iter == 2 and cfg_p.prune_keep == 64
        est_p = FoundationPose(
            mesh=mesh, cfg=cfg_p, refiner_params=rparams,
            scorer_params=sparams,
        )
        pose_p = est_p.register(K, rgb, depth, mask, iteration=5)
        err_p = adds_err(pose_p, gt, mesh.vertices)
        assert err_p < 0.06, f"funneled ADD-S {err_p}"
        assert err_p <= err_net + 0.002, (err_p, err_net)


def _train_estimator_nets(mesh, diameter, Kj, scene_key, *, r_steps=250,
                          s_steps=250, base_width=8, input_res=64,
                          occlude_prob=0.0):
    """The standard mid-width synthetic training recipe (see
    TestTrainedNetworkRegistration) packaged for reuse by the funneled-
    register breadth gates: returns (rcfg, rparams, scfg, sparams).
    occlude_prob > 0 trains both nets with the synthetic generator's
    foreground-occluder augmentation (datasets/synthetic.py) — required
    for scenes whose observation crops are contaminated by clutter or
    truncated by an occluder."""
    from foundationpose_tpu.datasets.synthetic import (
        make_refiner_batch, make_scorer_batch,
    )
    from foundationpose_tpu.models.networks import (
        ScoreNetCfg, init_score_net,
    )
    from foundationpose_tpu.models.training import score_train_step
    from foundationpose_tpu.pipeline import ScorerCfg, make_mesh_tensors

    mt = make_mesh_tensors(mesh)
    rcfg = RefinerCfg(
        net=RefineNetCfg(base_width=base_width), compute_dtype="float32",
        input_res=input_res,
    )
    rparams = init_refine_net(jax.random.PRNGKey(7), rcfg.net)
    tcfg = TrainCfg(lr=1e-3, compute_dtype="float32")
    opt = make_optimizer(tcfg).init(rparams)
    for step in range(r_steps):
        batch = make_refiner_batch(
            jax.random.PRNGKey(100 + step), mt, Kj, rcfg, diameter,
            n=16, frame_hw=(120, 160), rot_sigma=0.25, trans_sigma=0.05,
            occlude_prob=occlude_prob,
        )
        tb = {k: batch[k] for k in ("A", "B", "trans_target", "rot_target")}
        rparams, opt, rloss = refine_train_step(
            rparams, opt, rcfg.net, tcfg, tb
        )
    assert np.isfinite(float(rloss))

    scfg = ScorerCfg(
        net=ScoreNetCfg(base_width=base_width), input_res=input_res,
        mode="network", compute_dtype="float32",
    )
    sparams = init_score_net(jax.random.PRNGKey(8), scfg.net)
    stcfg = TrainCfg(lr=3e-4, compute_dtype="float32")
    sopt = make_optimizer(stcfg).init(sparams)
    for step in range(s_steps):
        sb = make_scorer_batch(
            jax.random.PRNGKey(5000 + step), mt, Kj, scfg, diameter,
            n=16, frame_hw=(240, 320), scene_key=scene_key,
            occlude_prob=occlude_prob,
        )
        sparams, sopt, _ = score_train_step(
            sparams, sopt, scfg.net, stcfg,
            {k: sb[k] for k in ("A", "B", "target")},
        )
    return rcfg, rparams, scfg, sparams


@pytest.mark.slow
class TestFunneledRegisterBreadth:
    """VERDICT r4 #6: the fast_register() 2 mm decision gate must rest
    on more than one easy scene. Two additions to the gated suite:

    (a) a textured bumpy icosphere — the bench workload's geometry
        family (bench.py builds the same shape at icosphere(4); here
        icosphere(3)'s 1280 faces keep the CPU-mesh suite tractable
        while exercising the SAME uv-texture sampling + dense-mesh
        raster path the box scene never touches);
    (b) the box under clutter and ~25% occlusion — distractor geometry
        in frame, a foreground occluder truncating the mask, so the
        prune's depth ranking sees contaminated crops.

    Gate, both scenes: |ADD-S(funneled) - ADD-S(full)| <= 2 mm, plus
    the absolute plateau bound. Reference target: the README preset row
    cites this suite as its accuracy evidence."""

    def _gate(self, mesh, frame, gt, diameter, nets, pts):
        import dataclasses

        from foundationpose_tpu.pipeline import EstimatorCfg, FoundationPose
        from foundationpose_tpu.utils.metrics import adds_err

        rgb, depth, mask = frame
        rcfg, rparams, scfg, sparams = nets
        cfg = EstimatorCfg(refiner=rcfg, scorer=scfg)
        est = FoundationPose(
            mesh=mesh, cfg=cfg, refiner_params=rparams, scorer_params=sparams
        )
        pose = est.register(K, rgb, depth, mask, iteration=5)
        err_full = adds_err(pose, gt, pts)

        est_p = FoundationPose(
            mesh=mesh, cfg=cfg.fast_register(), refiner_params=rparams,
            scorer_params=sparams,
        )
        pose_p = est_p.register(K, rgb, depth, mask, iteration=5)
        err_p = adds_err(pose_p, gt, pts)
        return err_full, err_p

    def test_textured_icosphere_scene(self):
        from foundationpose_tpu.datasets.synthetic import make_scorer_batch
        from foundationpose_tpu.geometry.icosphere import icosphere
        from foundationpose_tpu.meshio import TriMesh
        from foundationpose_tpu.ops.rasterizer import render_mesh
        from foundationpose_tpu.pipeline import make_mesh_tensors

        verts, faces = icosphere(3, radius=0.1)
        rng = np.random.default_rng(3)
        verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
        nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
        uv = np.stack(
            [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
             nrm[:, 2] * 0.5 + 0.5], axis=-1,
        ).astype(np.float32)
        tex = rng.integers(30, 255, size=(128, 128, 3)).astype(np.uint8)
        mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)
        diameter = jnp.float32(
            np.linalg.norm(verts.max(0) - verts.min(0))
        )
        Kj = jnp.asarray(K)
        scene_key = jax.random.PRNGKey(21)
        nets = _train_estimator_nets(mesh, diameter, Kj, scene_key)
        rcfg, rparams, scfg, sparams = nets

        mt = make_mesh_tensors(mesh)
        sb = make_scorer_batch(
            jax.random.PRNGKey(777), mt, Kj, scfg, diameter,
            n=4, frame_hw=(240, 320), scene_key=scene_key,
        )
        gt = np.asarray(sb["gt"], np.float32)
        out = render_mesh(
            mt.pos, mt.faces, jnp.asarray(gt[None]), Kj, out_hw=(240, 320),
            uv=mt.uv, tex=mt.tex, vnormals=mt.vnormals, use_light=True,
        )
        rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
        depth = np.asarray(out.depth[0]).astype(np.float32)
        mask = np.asarray(out.mask[0]).astype(np.uint8)

        err_full, err_p = self._gate(
            mesh, (rgb, depth, mask), gt, diameter, nets, verts
        )
        assert err_full < 0.06, err_full
        assert abs(err_p - err_full) <= 0.002, (err_p, err_full)

    def test_cluttered_occluded_scene(self):
        from foundationpose_tpu.datasets.synthetic import make_scorer_batch
        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.ops.rasterizer import render_mesh
        from foundationpose_tpu.pipeline import make_mesh_tensors

        mesh = colored_box()
        diameter = jnp.float32(0.28)
        Kj = jnp.asarray(K)
        scene_key = jax.random.PRNGKey(42)
        # occluder/clutter robustness comes from the generator's
        # occlusion augmentation — without it the clean-trained nets
        # plateau ~0.14 ADD-S on this scene (measured r5)
        nets = _train_estimator_nets(
            mesh, diameter, Kj, scene_key, occlude_prob=0.5
        )
        rcfg, rparams, scfg, sparams = nets

        mt = make_mesh_tensors(mesh)
        sb = make_scorer_batch(
            jax.random.PRNGKey(77), mt, Kj, scfg, diameter,
            n=4, frame_hw=(240, 320), scene_key=scene_key,
        )
        gt = np.asarray(sb["gt"], np.float32)

        # Compose the frame by depth: target box + two clutter boxes to
        # the sides + a thin occluder slab in FRONT of the target
        # covering part of its silhouette.
        H_, W_ = 240, 320
        rgb = np.zeros((H_, W_, 3), np.uint8)
        depth = np.full((H_, W_), np.inf, np.float32)
        vis_owner = np.zeros((H_, W_), np.int32)  # 0=bg, 1=target, 2+=other

        def paste(m, pose, owner):
            mtl = make_mesh_tensors(m)
            o = render_mesh(
                mtl.pos, mtl.faces, jnp.asarray(pose[None], jnp.float32),
                Kj, out_hw=(H_, W_), vertex_color=mtl.vertex_color,
                vnormals=mtl.vnormals, use_light=True,
            )
            d = np.asarray(o.depth[0])
            c = (np.asarray(o.color[0]) * 255).astype(np.uint8)
            m_ = np.asarray(o.mask[0]).astype(bool) & (
                np.where(np.asarray(o.mask[0]), d, np.inf) < depth
            )
            rgb[m_] = c[m_]
            depth[m_] = d[m_]
            vis_owner[m_] = owner

        paste(mesh, gt, 1)
        full_target_px = int((vis_owner == 1).sum())
        rng = np.random.default_rng(11)
        for j, dx in enumerate((-0.16, 0.17)):
            clutter = make_box(np.array([0.08, 0.1, 0.07]))
            clutter.vertex_colors = rng.integers(
                40, 255, size=(8, 3)
            ).astype(np.uint8)
            pc = np.asarray(gt).copy()
            pc[0, 3] += dx
            pc[1, 3] += 0.02 * (-1) ** j
            paste(clutter, pc, 2 + j)
        # Occluder slab in front, clipping one side of the target.
        occ = make_box(np.array([0.05, 0.3, 0.01]))
        occ.vertex_colors = np.full((8, 3), 200, np.uint8)
        po = np.eye(4, dtype=np.float32)
        po[:3, 3] = [gt[0, 3] - 0.065, gt[1, 3], gt[2, 3] - 0.25]
        paste(occ, po, 4)

        depth[np.isinf(depth)] = 0.0
        mask = (vis_owner == 1).astype(np.uint8)
        # the occluder must truncate a real fraction of the silhouette,
        # but leave enough for a feasible registration
        assert 0.5 * full_target_px < mask.sum() < 0.92 * full_target_px, (
            mask.sum(), full_target_px,
        )

        err_full, err_p = self._gate(
            mesh, (rgb, depth, mask), gt, diameter, nets, mesh.vertices
        )
        assert err_full < 0.06, err_full
        assert abs(err_p - err_full) <= 0.002, (err_p, err_full)
