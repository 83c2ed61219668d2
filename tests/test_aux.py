"""Auxiliary subsystems: checkpointing, deepim delta, tournament scorer,
metrics, profiling."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.utils.checkpoint import (
    save_params,
    load_params,
    save_train_state,
    load_train_state,
    latest_step,
)
from foundationpose_tpu.utils.metrics import add_err, adds_err, compute_auc
from foundationpose_tpu.utils.profiling import stage_timer, timing_report


class TestParamsNpz:
    def test_roundtrip_nested(self, tmp_path):
        params = {
            "a": {"kernel": np.random.rand(3, 4).astype(np.float32)},
            "list": [np.zeros(2), {"x": np.ones(3)}],
        }
        p = str(tmp_path / "w.npz")
        save_params(p, params)
        out = load_params(p)
        np.testing.assert_allclose(out["a"]["kernel"], params["a"]["kernel"])
        assert isinstance(out["list"], list)
        np.testing.assert_allclose(out["list"][1]["x"], 1.0)

    def test_refine_net_roundtrip(self, tmp_path):
        from foundationpose_tpu.models.networks import RefineNetCfg, init_refine_net

        cfg = RefineNetCfg(base_width=4)
        params = init_refine_net(jax.random.PRNGKey(0), cfg)
        p = str(tmp_path / "refiner.npz")
        save_params(p, params)
        out = load_params(p)
        flat1 = jax.tree.leaves(params)
        flat2 = jax.tree.leaves(out)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestOrbax:
    def test_train_state_roundtrip(self, tmp_path):
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "opt": {"mu": jnp.ones((2, 3))},
        }
        d = str(tmp_path / "ckpt")
        save_train_state(d, 42, state)
        assert latest_step(d) == 42
        step, restored = load_train_state(d, template=state)
        assert step == 42
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.asarray(state["params"]["w"]))


class TestNerfResume:
    def test_runner_save_resume(self, tmp_path):
        from tests.test_nerf import TestNeuralObjectField  # reuse scene helpers
        from foundationpose_tpu.nerf import NerfCfg
        from foundationpose_tpu.nerf.runner import NerfRunner
        from foundationpose_tpu.nerf.scene import preprocess_data, compute_scene_bounds
        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.ops import render_mesh
        from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
        import dataclasses

        box = make_box(np.array([0.2, 0.2, 0.2]))
        box.vertex_colors = np.full((8, 3), 200, np.uint8)
        K = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1.0]], np.float32)
        views = sample_views_icosphere(n_views=4)
        cam_in_obs = views.copy()
        cam_in_obs[:, :3, 3] *= 0.6
        ob_in_cams = np.linalg.inv(cam_in_obs)
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(ob_in_cams.astype(np.float32)),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.full((8, 3), 0.7),
            use_light=False,
            pose_block=12,
        )
        rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
        depths = np.asarray(out.depth).astype(np.float32)
        masks = np.asarray(out.mask).astype(np.uint8)

        cfg = NerfCfg(n_step=6, n_rand=128, n_samples=16, n_samples_around_depth=16,
                      num_levels=4, finest_res=64, log2_hashmap_size=12, amp=False)
        sc, tr, pts = compute_scene_bounds(K, rgbs, depths, masks, cam_in_obs)
        cfg = dataclasses.replace(cfg, sc_factor=sc, translation=tuple(tr.tolist()))
        rn, dn, pn = preprocess_data(rgbs, depths, masks, cam_in_obs, sc, tr)
        runner = NerfRunner(cfg, rn, dn, masks, pn, K, build_pcd=pts)
        runner.train(ckpt_dir=str(tmp_path / "nerf_ckpt"), i_weights=3)
        params_after = jax.tree.map(np.asarray, runner.params)

        runner2 = NerfRunner(cfg, rn, dn, masks, pn, K, build_pcd=pts)
        runner2.resume(str(tmp_path / "nerf_ckpt"))
        assert runner2.global_step == runner.global_step
        for a, b in zip(jax.tree.leaves(params_after), jax.tree.leaves(runner2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDeepim:
    def test_deepim_zero_output_keeps_xy(self):
        """deepim with zero uv shift and z-scale 1 must keep the pose."""
        from foundationpose_tpu.pipeline.refiner import apply_pose_delta
        from foundationpose_tpu.pipeline.config import RefinerCfg
        from foundationpose_tpu.geometry.projection import compute_crop_window_tf

        cfg = RefinerCfg(trans_rep="deepim", rot_rep="axis_angle")
        K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.05, -0.02, 1.0]
        poses = jnp.asarray(pose[None])
        tf = compute_crop_window_tf(poses, K, 1.2, 160, 0.2)
        trans = jnp.array([[0.0, 0.0, 1.0]])  # z_pred = 1 * z -> unchanged
        rot = jnp.zeros((1, 3))
        out = np.asarray(
            apply_pose_delta(poses, trans, rot, cfg, jnp.float32(0.2), K=K, tf_to_crops=tf)
        )
        np.testing.assert_allclose(out[0], pose, atol=1e-4)

    def test_deepim_z_scale(self):
        from foundationpose_tpu.pipeline.refiner import apply_pose_delta
        from foundationpose_tpu.pipeline.config import RefinerCfg
        from foundationpose_tpu.geometry.projection import compute_crop_window_tf

        cfg = RefinerCfg(trans_rep="deepim")
        K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.0, 0.0, 1.0]
        poses = jnp.asarray(pose[None])
        tf = compute_crop_window_tf(poses, K, 1.2, 160, 0.2)
        trans = jnp.array([[0.0, 0.0, 1.2]])
        out = np.asarray(
            apply_pose_delta(poses, trans, jnp.zeros((1, 3)), cfg, jnp.float32(0.2),
                             K=K, tf_to_crops=tf)
        )
        np.testing.assert_allclose(out[0, 2, 3], 1.2, atol=1e-5)


class TestTournament:
    def test_matches_single_group_for_small_n(self):
        from tests.test_pipeline import colored_box, synth_frame, K as K_np, H, W
        from foundationpose_tpu.pipeline import ScorerCfg, make_mesh_tensors
        from foundationpose_tpu.pipeline.scorer import score_poses, score_poses_tournament
        from foundationpose_tpu.models.networks import ScoreNetCfg

        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, 3] = [0, 0, 0.9]
        rgb, depth, mask = synth_frame(mesh, gt)
        xyz = np.zeros((H, W, 3), np.float32)
        xyz[..., 2] = depth
        cfg = ScorerCfg(net=ScoreNetCfg(base_width=4), mode="depth")
        rng = np.random.default_rng(0)
        poses = np.tile(gt[None], (12, 1, 1)).astype(np.float32)
        poses[:, :3, 3] += rng.normal(0, 0.02, (12, 3))
        common = (jnp.asarray(K_np), jnp.asarray(rgb, jnp.float32) / 255,
                  jnp.asarray(xyz), jnp.float32(0.3))
        s1 = np.asarray(score_poses(None, cfg, mt, jnp.asarray(poses), *common))
        s2 = np.asarray(
            score_poses_tournament(None, cfg, mt, jnp.asarray(poses), *common,
                                   group_size=64)
        )
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    def test_tournament_picks_global_best(self):
        from tests.test_pipeline import colored_box, synth_frame, K as K_np, H, W
        from foundationpose_tpu.pipeline import ScorerCfg, make_mesh_tensors
        from foundationpose_tpu.pipeline.scorer import score_poses, score_poses_tournament
        from foundationpose_tpu.models.networks import ScoreNetCfg

        mesh = colored_box()
        mt = make_mesh_tensors(mesh)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, 3] = [0, 0, 0.9]
        rgb, depth, mask = synth_frame(mesh, gt)
        from foundationpose_tpu.geometry.projection import depth_to_xyz_map

        xyz = np.asarray(depth_to_xyz_map(jnp.asarray(depth), jnp.asarray(K_np)))
        cfg = ScorerCfg(net=ScoreNetCfg(base_width=4), mode="depth")
        rng = np.random.default_rng(1)
        poses = np.tile(gt[None], (10, 1, 1)).astype(np.float32)
        poses[:, :3, 3] += rng.normal(0, 0.05, (10, 3))
        poses[7] = gt  # exact pose hidden in chunk 2
        common = (jnp.asarray(K_np), jnp.asarray(rgb, jnp.float32) / 255,
                  jnp.asarray(xyz), jnp.float32(0.3))
        s = np.asarray(
            score_poses_tournament(None, cfg, mt, jnp.asarray(poses), *common,
                                   group_size=4)
        )
        assert np.argmax(s) == 7


class TestMetrics:
    def test_add_zero_for_same_pose(self):
        pts = np.random.default_rng(0).uniform(-0.1, 0.1, (100, 3))
        pose = np.eye(4)
        assert add_err(pose, pose, pts) == 0
        assert adds_err(pose, pose, pts) < 1e-12

    def test_auc_monotone(self):
        good = compute_auc([0.001] * 10)
        bad = compute_auc([0.09] * 10)
        assert good > 0.9 > bad

    def test_add_translation(self):
        pts = np.zeros((10, 3))
        a = np.eye(4)
        b = np.eye(4)
        b[:3, 3] = [0.01, 0, 0]
        np.testing.assert_allclose(add_err(a, b, pts), 0.01, atol=1e-12)


class TestProfiling:
    def test_stage_timer(self):
        with stage_timer("unit", sync=False):
            pass
        rep = timing_report(reset=True)
        assert "unit" in rep and rep["unit"]["count"] == 1


class TestVertexColorBake:
    def test_texture_to_vertex_colors(self):
        from foundationpose_tpu.meshio import make_box, texture_to_vertex_colors

        mesh = make_box(np.array([0.1, 0.1, 0.1]))
        # constant-red texture with per-vertex UVs spread over it
        n = len(mesh.vertices)
        mesh.uv = np.stack(
            [np.linspace(0.1, 0.9, n), np.linspace(0.2, 0.8, n)], axis=1
        ).astype(np.float32)
        mesh.texture = np.full((16, 16, 3), [200, 10, 10], np.uint8)
        baked = texture_to_vertex_colors(mesh)
        assert baked.texture is None and baked.uv is None
        np.testing.assert_array_equal(baked.vertex_colors, [[200, 10, 10]] * n)
        # mesh without texture passes through unchanged
        plain = make_box(np.array([0.1, 0.1, 0.1]))
        assert texture_to_vertex_colors(plain) is plain


class TestNerfPresets:
    def test_tpu_fast_overrides_apply(self):
        import dataclasses

        from foundationpose_tpu.nerf import NerfCfg, TPU_FAST_OVERRIDES

        cfg = dataclasses.replace(NerfCfg(), **TPU_FAST_OVERRIDES)
        assert cfg.n_rand < NerfCfg().n_rand
        assert cfg.n_samples < NerfCfg().n_samples
        # grid capacity is untouched: the preset trades sample count only
        assert cfg.log2_hashmap_size == NerfCfg().log2_hashmap_size


class TestConvertWeightsCli:
    def test_roundtrip(self, tmp_path):
        import torch

        import tests.test_networks as tn
        from foundationpose_tpu.cli.convert_weights import main as convert_main
        from foundationpose_tpu.models.convert import (
            convert_refine_net,
            load_torch_state_dict,
        )
        from foundationpose_tpu.utils.checkpoint import load_params

        torch.manual_seed(0)
        tnet = tn.TorchRefineNet(use_bn=True)
        ckpt = str(tmp_path / "refine.pth")
        torch.save({"model": tnet.state_dict()}, ckpt)

        out_dir = str(tmp_path / "npz")
        convert_main(["--refiner_ckpt", ckpt, "--out_dir", out_dir])

        loaded = load_params(f"{out_dir}/refiner.npz")
        direct = convert_refine_net(load_torch_state_dict(ckpt), use_bn=True)

        import jax

        leaves_a = jax.tree_util.tree_leaves(loaded)
        leaves_b = jax.tree_util.tree_leaves(direct)
        assert len(leaves_a) == len(leaves_b)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLoadedParamsApply:
    def test_npz_loaded_refiner_params_run(self, tmp_path):
        """Regression: digit-string param sub-block names ("0","1",...)
        must survive the npz roundtrip as dicts — an earlier unflatten
        turned them into lists, crashing apply at the first indexing."""
        import jax.numpy as jnp

        from foundationpose_tpu.models.networks import (
            RefineNetCfg,
            apply_refine_net,
            init_refine_net,
        )
        from foundationpose_tpu.utils.checkpoint import load_params, save_params

        cfg = RefineNetCfg(base_width=4)
        params = init_refine_net(jax.random.PRNGKey(0), cfg)
        p = str(tmp_path / "r.npz")
        save_params(p, params)
        loaded = load_params(p)
        A = jnp.zeros((2, 160, 160, 6), jnp.float32)
        out1 = apply_refine_net(params, cfg, A, A)
        out2 = apply_refine_net(loaded, cfg, A, A)
        for k in ("trans", "rot"):
            np.testing.assert_allclose(
                np.asarray(out1[k]), np.asarray(out2[k]), atol=1e-6
            )


class TestBuildEstimatorNpz:
    def test_npz_ckpt_paths(self, tmp_path):
        """build_estimator accepts converted-npz checkpoints and detects
        the BN variant from the param tree."""
        import argparse

        import jax

        from foundationpose_tpu.cli.run_demo import build_estimator
        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.models.networks import (
            RefineNetCfg,
            ScoreNetCfg,
            init_refine_net,
            init_score_net,
        )
        from foundationpose_tpu.utils.checkpoint import save_params

        r = init_refine_net(jax.random.PRNGKey(0), RefineNetCfg(use_bn=True))
        s = init_score_net(jax.random.PRNGKey(1), ScoreNetCfg(use_bn=False))
        rp = str(tmp_path / "refiner.npz")
        sp = str(tmp_path / "scorer.npz")
        save_params(rp, r)
        save_params(sp, s)
        args = argparse.Namespace(
            refiner_ckpt=rp, scorer_ckpt=sp, debug=0, debug_dir=str(tmp_path)
        )
        est = build_estimator(make_box(np.array([0.1, 0.1, 0.1])), args)
        assert est.cfg.refiner.net.use_bn is True
        assert est.cfg.scorer.net.use_bn is False
        assert est.cfg.scorer.mode == "network"
        assert est.has_refiner
