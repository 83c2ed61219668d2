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

    @pytest.mark.slow
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


@pytest.fixture(scope="module")
def linemod_scene(tmp_path_factory):
    """Minimal lm layout: lm_test_all/test/000001 + lm_models/models +
    a Linemod_preprocessed split dir."""
    root = tmp_path_factory.mktemp("lm_root")
    base = root / "lm_test_all" / "test" / "000001"
    models = root / "lm_models" / "models"
    os.makedirs(base / "rgb")
    os.makedirs(models)

    box = make_box(np.array([0.08, 0.1, 0.12]))
    mm = box.copy()
    mm.vertices = mm.vertices * 1000.0
    ob_ids = np.setdiff1d(np.arange(1, 16), [7, 3]).tolist()
    for ob in ob_ids:
        export_ply(mm, str(models / f"obj_{ob:06d}.ply"))
    with open(models / "models_info.json", "w") as f:
        json.dump({str(i): {"diameter": 100.0} for i in range(1, 16)}, f)

    import imageio.v2 as imageio

    scene_camera = {}
    for i in range(4):
        imageio.imwrite(
            str(base / "rgb" / f"{i:06d}.png"),
            np.zeros((H, W, 3), np.uint8),
        )
        scene_camera[str(i)] = {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}
    with open(base / "scene_camera.json", "w") as f:
        json.dump(scene_camera, f)

    pre = root / "Linemod_preprocessed"
    os.makedirs(pre / "data" / "01")
    with open(pre / "data" / "01" / "train.txt", "w") as f:
        f.write("0\n2\n")
    return str(base), str(pre)


class TestLinemodReader:
    def test_no_split_uses_all_frames(self, linemod_scene):
        from foundationpose_tpu.datasets import LinemodReader

        base, _ = linemod_scene
        r = LinemodReader(base)
        assert len(r) == 4
        assert 3 not in r.ob_ids and 7 not in r.ob_ids

    def test_preprocessed_split_filters_frames(self, linemod_scene, monkeypatch):
        """split='train' keeps only the frames listed in the
        Linemod_preprocessed split file (datareader.py:400-410)."""
        import foundationpose_tpu.datasets.readers  # noqa: F401
        from foundationpose_tpu.datasets import LinemodReader

        base, pre = linemod_scene
        monkeypatch.setenv("LINEMOD_PREPROCESSED_DIR", pre)
        r = LinemodReader(base, split="train")
        assert len(r) == 2
        assert r.id_strs == ["000000", "000002"]


class TestPosecnnMesh:
    def test_get_posecnn_version(self, tmp_path, monkeypatch):
        """YcbVideoReader.get_gt_mesh(get_posecnn_version=True) loads the
        original YCB-Video obj in meters (datareader.py:489-505)."""
        import imageio.v2 as imageio

        import foundationpose_tpu.datasets.readers as readers_mod
        from foundationpose_tpu.meshio import export_obj

        # PoseCNN-era models dir
        ycb_dir = tmp_path / "ycb"
        os.makedirs(ycb_dir / "models" / "002_master_chef_can")
        box_pc = make_box(np.array([0.05, 0.05, 0.14]))
        export_obj(
            box_pc,
            str(ycb_dir / "models" / "002_master_chef_can" /
                "textured_simple.obj"),
        )
        monkeypatch.setattr(readers_mod, "YCB_VIDEO_DIR", str(ycb_dir))

        # minimal ycbv-layout scene: <scene>/{rgb,scene_camera.json} with
        # ycbv_models two levels up
        base = tmp_path / "ycbv" / "test" / "000001"
        models = tmp_path / "ycbv" / "ycbv_models" / "models"
        os.makedirs(base / "rgb")
        os.makedirs(models)
        imageio.imwrite(
            str(base / "rgb" / "000000.png"), np.zeros((H, W, 3), np.uint8)
        )
        with open(base / "scene_camera.json", "w") as f:
            json.dump(
                {"0": {"cam_K": K.flatten().tolist(), "depth_scale": 1.0}}, f
            )
        box_bop = make_box(np.array([0.08, 0.1, 0.12]))
        mm = box_bop.copy()
        mm.vertices = mm.vertices * 1000.0
        for ob in range(1, 22):
            export_ply(mm, str(models / f"obj_{ob:06d}.ply"))
        with open(models / "models_info.json", "w") as f:
            json.dump({str(i): {"diameter": 100.0} for i in range(1, 22)}, f)

        r = readers_mod.YcbVideoReader(str(base))
        r.ob_id_to_names = {1: "002_master_chef_can"}
        mesh = r.get_gt_mesh(1, get_posecnn_version=True)
        np.testing.assert_allclose(
            mesh.bounds()[1] - mesh.bounds()[0], [0.05, 0.05, 0.14], atol=1e-5
        )
        # default path still returns the BOP (mm -> m) model
        mesh_bop = r.get_gt_mesh(1)
        np.testing.assert_allclose(
            mesh_bop.bounds()[1] - mesh_bop.bounds()[0],
            [0.08, 0.1, 0.12], atol=1e-5,
        )


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
