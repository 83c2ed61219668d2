"""Multi-device tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from foundationpose_tpu.parallel import (
    make_device_mesh,
    shard_hypotheses,
    replicate_tree,
    batch_sharding,
)
from foundationpose_tpu.models.networks import (
    RefineNetCfg,
    ScoreNetCfg,
    init_refine_net,
    init_score_net,
)
from foundationpose_tpu.models.training import (
    TrainCfg,
    make_optimizer,
    refine_train_step,
    score_train_step,
)
from foundationpose_tpu.pipeline import (
    RefinerCfg,
    ScorerCfg,
    make_mesh_tensors,
    refine_poses,
    score_poses,
)
from tests.test_pipeline import colored_box, synth_frame, K, H, W


def test_device_count():
    assert jax.device_count() == 8


def frame_setup():
    mesh = colored_box()
    mt = make_mesh_tensors(mesh)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0, 0, 0.9]
    rgb, depth, mask = synth_frame(mesh, gt)
    xyz = np.zeros((H, W, 3), np.float32)
    xyz[..., 2] = depth
    return mt, gt, rgb, xyz


@pytest.mark.slow
def test_sharded_scoring_matches_single_device():
    mesh_dev = make_device_mesh()
    mt, gt, rgb, xyz = frame_setup()
    cfg = ScorerCfg(net=ScoreNetCfg(base_width=4), mode="depth")
    rng = np.random.default_rng(0)
    poses = np.tile(gt[None], (16, 1, 1)).astype(np.float32)
    poses[:, :3, 3] += rng.normal(0, 0.02, size=(16, 3))

    args = dict(
        K=jnp.asarray(K),
        rgb=jnp.asarray(rgb, jnp.float32) / 255.0,
        xyz_map=jnp.asarray(xyz),
        mesh_diameter=jnp.float32(0.3),
    )
    # single device
    s1 = np.asarray(
        score_poses(None, cfg, mt, jnp.asarray(poses), args["K"], args["rgb"],
                    args["xyz_map"], args["mesh_diameter"])
    )
    # sharded over 8 devices
    poses_sh, valid = shard_hypotheses(jnp.asarray(poses), mesh_dev)
    mt_r = replicate_tree(mt, mesh_dev)
    s8 = np.asarray(
        score_poses(None, cfg, mt_r, poses_sh, args["K"], args["rgb"],
                    args["xyz_map"], args["mesh_diameter"], valid=valid)
    )
    np.testing.assert_allclose(s8[:16], s1, atol=1e-4)


@pytest.mark.slow
def test_sharded_refine_matches_single_device():
    mesh_dev = make_device_mesh()
    mt, gt, rgb, xyz = frame_setup()
    cfg = RefinerCfg(net=RefineNetCfg(base_width=4), compute_dtype="float32")
    params = init_refine_net(jax.random.PRNGKey(0), cfg.net)
    rng = np.random.default_rng(1)
    poses = np.tile(gt[None], (8, 1, 1)).astype(np.float32)
    poses[:, :3, 3] += rng.normal(0, 0.02, size=(8, 3))

    common = (jnp.asarray(K), jnp.asarray(rgb, jnp.float32) / 255.0,
              jnp.asarray(xyz), jnp.float32(0.3))
    r1 = np.asarray(refine_poses(params, cfg, mt, jnp.asarray(poses), *common, iterations=1))
    poses_sh, _ = shard_hypotheses(jnp.asarray(poses), mesh_dev)
    params_r = replicate_tree(params, mesh_dev)
    mt_r = replicate_tree(mt, mesh_dev)
    r8 = np.asarray(refine_poses(params_r, cfg, mt_r, poses_sh, *common, iterations=1))
    np.testing.assert_allclose(r8, r1, atol=1e-4)


def test_dp_refiner_train_step():
    """Data-parallel training step: batch sharded over 8 devices."""
    mesh_dev = make_device_mesh(axis="data")
    net_cfg = RefineNetCfg(base_width=4)
    train_cfg = TrainCfg(compute_dtype="float32")
    params = init_refine_net(jax.random.PRNGKey(0), net_cfg)
    opt_state = make_optimizer(train_cfg).init(params)

    rng = np.random.default_rng(0)
    batch = {
        "A": jnp.asarray(rng.standard_normal((8, 160, 160, 6)), jnp.float32),
        "B": jnp.asarray(rng.standard_normal((8, 160, 160, 6)), jnp.float32),
        "trans_target": jnp.asarray(rng.standard_normal((8, 3)), jnp.float32),
        "rot_target": jnp.asarray(rng.standard_normal((8, 3)), jnp.float32),
    }
    sh = batch_sharding(mesh_dev)
    batch_sh = {k: jax.device_put(v, sh) for k, v in batch.items()}
    params_r = replicate_tree(params, mesh_dev)
    opt_r = replicate_tree(opt_state, mesh_dev)

    p2, o2, loss = refine_train_step(params_r, opt_r, net_cfg, train_cfg, batch_sh)
    assert np.isfinite(float(loss))
    # params actually moved
    delta = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, p2, params),
        0.0,
    )
    assert delta > 0


def test_dp_scorer_train_step():
    mesh_dev = make_device_mesh(axis="data")
    net_cfg = ScoreNetCfg(base_width=4)
    train_cfg = TrainCfg(compute_dtype="float32")
    params = init_score_net(jax.random.PRNGKey(0), net_cfg)
    opt_state = make_optimizer(train_cfg).init(params)
    rng = np.random.default_rng(1)
    batch = {
        "A": jnp.asarray(rng.standard_normal((8, 160, 160, 6)), jnp.float32),
        "B": jnp.asarray(rng.standard_normal((8, 160, 160, 6)), jnp.float32),
        "target": jnp.asarray(rng.standard_normal((8,)), jnp.float32),
    }
    sh = batch_sharding(mesh_dev)
    batch_sh = {k: jax.device_put(v, sh) for k, v in batch.items()}
    p2, o2, loss = score_train_step(
        replicate_tree(params, mesh_dev),
        replicate_tree(opt_state, mesh_dev),
        net_cfg,
        train_cfg,
        batch_sh,
    )
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_full_register_sharded_matches_single():
    """FoundationPose(n_devices=8): end-to-end register equals the
    single-device result (hypothesis batch sharded, GSPMD collectives)."""
    from foundationpose_tpu.pipeline import FoundationPose
    from tests.test_pipeline import colored_box, synth_frame, tiny_cfg, K

    mesh = colored_box()
    gt = np.eye(4)
    gt[:3, 3] = [0.01, -0.02, 0.85]
    rgb, depth, mask = synth_frame(mesh, gt)

    est1 = FoundationPose(mesh=mesh, cfg=tiny_cfg())
    p1 = est1.register(K, rgb, depth, mask, iteration=0)
    est8 = FoundationPose(mesh=mesh, cfg=tiny_cfg(), n_devices=8)
    p8 = est8.register(K, rgb, depth, mask, iteration=0)
    np.testing.assert_allclose(p8, p1, atol=1e-4)


@pytest.mark.slow
def test_register_funneling_sharded_matches_single():
    """Hypothesis funneling under the sharded register: top_k + gather
    across the sharded hypothesis axis must still equal single-device
    (GSPMD inserts the resharding collectives)."""
    import dataclasses

    from foundationpose_tpu.pipeline import FoundationPose
    from tests.test_pipeline import (
        colored_box, synth_frame, tiny_cfg, zero_refiner_heads, K,
    )
    from foundationpose_tpu.models.networks import init_refine_net

    mesh = colored_box()
    gt = np.eye(4)
    gt[:3, 3] = [0.01, -0.02, 0.85]
    rgb, depth, mask = synth_frame(mesh, gt)
    cfg = dataclasses.replace(tiny_cfg(), prune_after_iter=1, prune_keep=16)
    params = zero_refiner_heads(
        init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    )
    est1 = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
    p1 = est1.register(K, rgb, depth, mask, iteration=2)
    est8 = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params, n_devices=8)
    p8 = est8.register(K, rgb, depth, mask, iteration=2)
    np.testing.assert_allclose(p8, p1, atol=1e-4)


@pytest.mark.slow
def test_multitracker_from_sharded_estimator():
    """A hypothesis-sharded register hand-off: MultiTracker.from_estimators
    unshards the replicated mesh/pose/params onto the default device and
    tracks identically to the single-device flow."""
    from foundationpose_tpu.pipeline import FoundationPose
    from foundationpose_tpu.pipeline.multi import MultiTracker
    from tests.test_pipeline import (
        colored_box, synth_frame, tiny_cfg, zero_refiner_heads, K,
    )
    from foundationpose_tpu.models.networks import init_refine_net

    mesh = colored_box()
    gt = np.eye(4)
    gt[:3, 3] = [0.01, -0.02, 0.85]
    rgb, depth, mask = synth_frame(mesh, gt)
    cfg = tiny_cfg()
    params = zero_refiner_heads(
        init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    )
    est1 = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params)
    est1.register(K, rgb, depth, mask, iteration=1)
    est8 = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=params, n_devices=8)
    est8.register(K, rgb, depth, mask, iteration=1)

    t1 = MultiTracker.from_estimators([est1])
    t8 = MultiTracker.from_estimators([est8])
    p1 = t1.track(rgb, depth, K, iteration=1)
    p8 = t8.track(rgb, depth, K, iteration=1)
    np.testing.assert_allclose(p8, p1, atol=1e-4)
