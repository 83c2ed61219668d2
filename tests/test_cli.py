"""CLI argument-layer smoke tests plus the demo driver's full loop
(other drivers' heavy paths are covered by pipeline/nerf/reader
integration tests)."""
import numpy as np
import pytest


@pytest.mark.slow
def test_run_demo_end_to_end(tmp_path):
    """The demo driver end to end on a fabricated YCBInEOAT-format
    scene (reference run_demo.py:15-78): register on frame 0 from a
    --refiner_ckpt .npz, pipelined tracking with batched pose fetches
    for the rest, one ob_in_cam/<id>.txt per frame. The poses must
    MATCH a sequential blocking register + track_one run with the same
    checkpoint — the pipelined batch-fetch loop is an overlap of
    latency, never a change of values. Live (random-init) refiner
    heads so an out-of-order fetch or broken cascade would change
    poses rather than hide behind identity deltas."""
    import dataclasses
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.meshio import export_ply, make_box
    from foundationpose_tpu.models.networks import RefineNetCfg, init_refine_net
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, FoundationPose, RefinerCfg,
    )

    H, W = 240, 320
    K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]])
    box = make_box(np.array([0.12, 0.16, 0.2]))
    rng = np.random.default_rng(0)
    box.vertex_colors = rng.integers(40, 255, size=(8, 3)).astype(np.uint8)

    scene = tmp_path / "scene"
    for sub in ("rgb", "depth", "masks"):
        (scene / sub).mkdir(parents=True)
    np.savetxt(scene / "cam_K.txt", K)
    n_frames = 8
    gts = []
    for i in range(n_frames):
        gt = np.eye(4, dtype=np.float32)
        gt[:3, 3] = [0.02 + 0.002 * i, -0.01, 1.25]
        gts.append(gt)
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(gt[None]),
            jnp.asarray(K.astype(np.float32)),
            out_hw=(H, W),
            vertex_color=jnp.asarray(box.vertex_colors.astype(np.float32) / 255),
            vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
            use_light=True,
        )
        imageio.imwrite(
            scene / "rgb" / f"{i:05d}.png",
            (np.asarray(out.color[0]) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            scene / "depth" / f"{i:05d}.png",
            np.round(np.asarray(out.depth[0]) * 1000).astype(np.uint16),
        )
        imageio.imwrite(
            scene / "masks" / f"{i:05d}.png",
            (np.asarray(out.mask[0]) * 255).astype(np.uint8),
        )
    mesh_file = str(tmp_path / "box.ply")
    export_ply(box, mesh_file)

    rcfg = RefinerCfg(
        net=RefineNetCfg(base_width=8), compute_dtype="float32", input_res=64
    )
    rparams = init_refine_net(jax.random.PRNGKey(3), rcfg.net)
    ckpt = str(tmp_path / "refiner.npz")
    FoundationPose(
        mesh=box, cfg=EstimatorCfg(refiner=rcfg), refiner_params=rparams
    ).save_weights(refiner_path=ckpt)

    from foundationpose_tpu.cli.run_demo import main

    debug_dir = tmp_path / "debug"
    main([
        "--mesh_file", mesh_file,
        "--test_scene_dir", str(scene),
        "--refiner_ckpt", ckpt,
        "--est_refine_iter", "1",
        "--track_refine_iter", "1",
        "--debug", "0",
        "--debug_dir", str(debug_dir),
    ])

    # Reference: the same frames through blocking sequential calls with
    # an identically-configured estimator (build path of run_demo).
    from foundationpose_tpu.meshio import load_mesh
    from foundationpose_tpu.models.loading import load_estimator_checkpoint

    cfg = EstimatorCfg()
    params, rcfg2, _ = load_estimator_checkpoint(ckpt, "refiner", base=cfg.refiner)
    est = FoundationPose(
        mesh=load_mesh(mesh_file),
        cfg=dataclasses.replace(cfg, refiner=rcfg2),
        refiner_params=params,
    )
    depth0 = imageio.imread(scene / "depth" / "00000.png") / 1e3
    rgb0 = imageio.imread(scene / "rgb" / "00000.png")[..., :3]
    mask0 = imageio.imread(scene / "masks" / "00000.png") > 0
    want = [est.register(K, rgb0, depth0, mask0, iteration=1)]
    for i in range(1, n_frames):
        d = imageio.imread(scene / "depth" / f"{i:05d}.png") / 1e3
        d[(d < 0.001)] = 0
        r = imageio.imread(scene / "rgb" / f"{i:05d}.png")[..., :3]
        want.append(est.track_one(r, d, K, iteration=1))

    for i in range(n_frames):
        got = np.loadtxt(debug_dir / "ob_in_cam" / f"{i:05d}.txt")
        assert got.shape == (4, 4) and np.isfinite(got).all()
        np.testing.assert_allclose(got, want[i], atol=1e-3), i
    # sanity vs the scene itself, register frame only: its z is anchored
    # by the mask/median-depth guess, so a unit or convention break
    # lands far outside this band. Later frames drift — a random-init
    # refiner applies a consistent delta every track iteration, which
    # compounds linearly over the sequence; their correctness claim is
    # the sequential-parity assert above, not scene accuracy.
    tz0 = np.loadtxt(debug_dir / "ob_in_cam" / "00000.txt")[2, 3]
    assert abs(tz0 - 1.25) < 0.5, tz0


class TestArgParsing:
    def test_convert_weights_requires_a_ckpt(self, tmp_path):
        from foundationpose_tpu.cli.convert_weights import main

        with pytest.raises(SystemExit):
            main(["--out_dir", str(tmp_path)])

    def test_run_nerf_rejects_bad_preset(self):
        from foundationpose_tpu.cli.run_nerf import main

        with pytest.raises(SystemExit):
            main(["--ref_view_dir", "x", "--preset", "bogus"])

    def test_run_bop_rejects_bad_dataset(self):
        from foundationpose_tpu.cli.run_bop import main

        with pytest.raises(SystemExit):
            main(["--dataset", "not-a-dataset"])

    def test_all_cli_modules_import(self):
        import foundationpose_tpu.cli.convert_weights
        import foundationpose_tpu.cli.run_bop
        import foundationpose_tpu.cli.run_demo
        import foundationpose_tpu.cli.run_linemod
        import foundationpose_tpu.cli.run_multi_demo
        import foundationpose_tpu.cli.run_nerf
        import foundationpose_tpu.cli.run_ycb_video

    def test_run_multi_demo_rejects_mismatched_lists(self):
        from foundationpose_tpu.cli.run_multi_demo import main

        with pytest.raises(SystemExit):
            main([
                "--mesh_files", "a.obj,b.obj",
                "--mask_files", "a.png",
                "--test_scene_dir", "x",
            ])
