"""Dataset reader + benchmark-driver integration on a synthetic BOP scene."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from foundationpose_tpu.meshio import make_box, export_ply, load_mesh
from foundationpose_tpu.ops import render_mesh
from foundationpose_tpu.geometry import so3_exp_map


K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
H, W = 240, 320


@pytest.fixture(scope="module")
def bop_scene(tmp_path_factory):
    """Minimal tudl-layout scene: test/000001 + tudl_models/models."""
    import cv2

    root = tmp_path_factory.mktemp("bop") / "tudl"
    base = root / "tudl_test_bop19" / "test" / "000001"
    models = root / "tudl_models" / "models"
    for d in ("rgb", "depth", "mask_visib"):
        os.makedirs(base / d)
    os.makedirs(models)

    box = make_box(np.array([0.08, 0.1, 0.12]))
    rng = np.random.default_rng(0)
    box.vertex_colors = rng.integers(60, 255, (8, 3)).astype(np.uint8)
    mm = box.copy()
    mm.vertices = mm.vertices * 1000.0  # BOP models are in mm
    export_ply(mm, str(models / "obj_000001.ply"))
    with open(models / "models_info.json", "w") as f:
        diam = float(np.linalg.norm([80, 100, 120]))
        json.dump({str(i): {"diameter": diam} for i in (1, 2, 3)}, f)

    scene_camera = {}
    scene_gt = {}
    gt_poses = []
    for i in range(2):
        w = np.array([0.2 * i, -0.1 * i, 0.3 * i], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.asarray(so3_exp_map(jnp.asarray(w[None])))[0]
        pose[:3, 3] = [0.01, -0.02, 0.7 + 0.05 * i]
        gt_poses.append(pose)
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(pose[None]),
            jnp.asarray(K.astype(np.float32)),
            out_hw=(H, W),
            vertex_color=jnp.asarray(box.vertex_colors.astype(np.float32) / 255),
            vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
            use_light=True,
        )
        rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
        depth_mm = (np.asarray(out.depth[0]) * 1000).astype(np.uint16)
        mask = (np.asarray(out.mask[0]) * 255).astype(np.uint8)
        import imageio.v2 as imageio

        imageio.imwrite(str(base / "rgb" / f"{i:06d}.png"), rgb)
        cv2.imwrite(str(base / "depth" / f"{i:06d}.png"), depth_mm)
        cv2.imwrite(str(base / "mask_visib" / f"{i:06d}_000000.png"), mask)
        scene_camera[str(i)] = {
            "cam_K": K.flatten().tolist(), "depth_scale": 1.0,
        }
        scene_gt[str(i)] = [{
            "obj_id": 1,
            "cam_R_m2c": pose[:3, :3].flatten().tolist(),
            "cam_t_m2c": (pose[:3, 3] * 1000).tolist(),
        }]
    with open(base / "scene_camera.json", "w") as f:
        json.dump(scene_camera, f)
    with open(base / "scene_gt.json", "w") as f:
        json.dump(scene_gt, f)
    return str(base), box, gt_poses


class TestTudlReader:
    def test_reader_roundtrip(self, bop_scene):
        from foundationpose_tpu.datasets import TudlReader

        base, box, gt_poses = bop_scene
        r = TudlReader(base)
        assert len(r) == 2
        np.testing.assert_allclose(r.get_K(0), K)
        color = r.get_color(0)
        assert color.shape == (H, W, 3)
        depth = r.get_depth(0)
        assert abs(depth[depth > 0].mean() - 0.65) < 0.15
        mask = r.get_mask(0, 1)
        assert mask.sum() > 100
        assert (r.get_instance_ids_in_image(0) == [1]).all()
        gt = r.get_gt_pose(0, 1, mask=mask)
        np.testing.assert_allclose(gt, gt_poses[0], atol=1e-5)
        mesh = r.get_gt_mesh(1)  # mm -> m
        np.testing.assert_allclose(
            mesh.bounds()[1] - mesh.bounds()[0], [0.08, 0.1, 0.12], atol=1e-5
        )
        assert r.symmetry_tfs[1].shape[0] >= 1
        assert abs(r.get_model_diameter(1) - np.linalg.norm([0.08, 0.1, 0.12])) < 1e-6

    def test_ply_loader_colors(self, bop_scene):
        base, box, _ = bop_scene
        mesh = load_mesh(
            os.path.abspath(f"{base}/../../../tudl_models/models/obj_000001.ply")
        )
        assert mesh.vertex_colors is not None
        assert mesh.vertex_colors.shape == (8, 3)

    def test_driver_style_register_and_score(self, bop_scene):
        """Miniature of cli/run_bop.py: register each frame with the
        weights-free estimator and score ADD-S against GT."""
        from foundationpose_tpu.datasets import TudlReader
        from foundationpose_tpu.pipeline import FoundationPose
        from foundationpose_tpu.utils.metrics import adds_err
        from tests.test_pipeline import tiny_cfg

        base, box, gt_poses = bop_scene
        r = TudlReader(base)
        mesh = r.get_gt_mesh(1)
        est = FoundationPose(mesh=mesh, cfg=tiny_cfg(),
                             symmetry_tfs=r.symmetry_tfs[1])
        errs = []
        for i in range(2):
            mask = r.get_mask(i, 1)
            pose = est.register(
                K=r.get_K(i), rgb=r.get_color(i), depth=r.get_depth(i),
                ob_mask=mask, iteration=0,
            )
            gt = r.get_gt_pose(i, 1, mask=mask)
            pose_c = pose.copy()
            pose_c[2, 3] = gt[2, 3]  # front-surface z bias (no refiner)
            errs.append(adds_err(pose_c, gt, mesh.vertices))
        assert max(errs) < 0.06


class TestH5Datasets:
    def _make_h5(self, path):
        import h5py

        rng = np.random.default_rng(0)
        with h5py.File(path, "w") as hf:
            for key in ("ob_a", "ob_b"):
                g = hf.create_group(key)
                for i in range(3):
                    p = g.create_group(f"i_perturb_{i}")
                    p["rgbA"] = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                    p["rgbB"] = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                    p["depthA"] = rng.integers(400, 900, (32, 32)).astype(np.uint16)
                    p["depthB"] = rng.integers(400, 900, (32, 32)).astype(np.uint16)
                    p["poseA"] = np.eye(4, dtype=np.float32)
                    p["poseB"] = np.eye(4, dtype=np.float32)
                    p["K"] = np.eye(3, dtype=np.float32)
                    p["crop_ratio"] = 1.4
                    p["trans_normalizer"] = np.array([0.01, 0.01, 0.02])
                    p["rot_normalizer"] = 30.0
                    p["mesh_diameter"] = 0.2
        return path

    def test_pair_and_variants(self, tmp_path):
        from foundationpose_tpu.datasets.h5_pairs import (
            PairH5Dataset,
            PoseRefinePairH5Dataset,
            ScoreMultiPairH5Dataset,
            TripletH5Dataset,
        )

        f = self._make_h5(str(tmp_path / "pairs.h5"))
        ds = PairH5Dataset(f)
        assert len(ds) == 2 and len(ds.perturb_keys) == 3
        assert ds.crop_ratio == 1.4
        np.testing.assert_allclose(ds.rot_normalizer, np.deg2rad(30.0))
        pair = ds.load_pair(0, 1)
        assert pair["rgbA"].shape == (32, 32, 3)
        assert pair["depthB"].dtype == np.float32  # mm -> m
        assert pair["depthB"].max() < 1.0

        assert PoseRefinePairH5Dataset(f).xyz_invalid_z == 0.001
        tri = TripletH5Dataset(f)
        assert tri.xyz_invalid_z == 0.1
        pos, neg = tri.load_triplet(0, 0, 2)
        assert pos["rgbA"].shape == neg["rgbA"].shape
        group = ScoreMultiPairH5Dataset(f).load_group(1, max_pairs=2)
        assert len(group) == 2
