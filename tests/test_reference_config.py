"""Checkpoint-config ingestion tests (VERDICT r1 item 3).

The reference derives pipeline/network config from each checkpoint's
shipped config.yml with backward-compat defaults
(predict_pose_refine.py:102-131, predict_score.py:126-143). These tests
prove a torch checkpoint written with a NON-default config (6d rotation,
BatchNorm, custom normalizers, deepim, string zfar) round-trips through
cli.convert_weights + load_estimator_checkpoint to the right typed
config and to numerically identical network outputs — including
DataParallel 'module.' key prefixes and the {'model': ...} envelope.
"""
import math
import os

import numpy as np
import pytest

from foundationpose_tpu.models.reference_config import (
    apply_reference_defaults,
    refiner_cfg_from_reference,
    scorer_cfg_from_reference,
    zfar_from_reference,
)


class TestDefaulting:
    def test_refiner_defaults_match_reference(self):
        # empty YAML -> exactly predict_pose_refine.py:107-131
        cfg = apply_reference_defaults({}, "refiner")
        assert cfg["use_normal"] is False
        assert cfg["use_mask"] is False
        assert cfg["use_BN"] is False
        assert cfg["c_in"] == 4
        assert cfg["crop_ratio"] == 1.2
        assert cfg["n_view"] == 1
        assert cfg["trans_rep"] == "tracknet"
        assert cfg["rot_rep"] == "axis_angle"
        assert cfg["zfar"] == 3
        assert cfg["normalize_xyz"] is False
        assert cfg["normal_uint8"] is False

    def test_scorer_defaults_match_reference(self):
        cfg = apply_reference_defaults({}, "scorer")
        assert cfg["use_BN"] is False
        assert cfg["c_in"] == 4
        assert cfg["zfar"] == math.inf
        assert cfg["normalize_xyz"] is False
        assert cfg["crop_ratio"] == 1.2

    def test_crop_ratio_none_defaulted(self):
        # predict_pose_refine.py:116: None counts as absent
        assert apply_reference_defaults({"crop_ratio": None}, "refiner")["crop_ratio"] == 1.2

    def test_zfar_inf_string(self):
        # predict_pose_refine.py:128-129
        for s in ("Infinity", ".inf", "INF"):
            assert apply_reference_defaults({"zfar": s}, "refiner")["zfar"] == math.inf
        assert zfar_from_reference({"zfar": 2.5}, "refiner") == 2.5

    def test_existing_keys_not_overridden(self):
        cfg = apply_reference_defaults({"rot_rep": "6d", "c_in": 6}, "refiner")
        assert cfg["rot_rep"] == "6d"
        assert cfg["c_in"] == 6


class TestTypedMapping:
    def test_full_nondefault_refiner(self):
        raw = {
            "c_in": 6, "use_BN": True, "rot_rep": "6d", "trans_rep": "deepim",
            "normalize_xyz": True, "crop_ratio": 1.5,
            "trans_normalizer": [0.01, 0.02, 0.03], "rot_normalizer": 0.5,
            "zfar": "Infinity", "input_resize": [160, 160],
        }
        cfg = refiner_cfg_from_reference(raw)
        assert cfg.net.use_bn is True and cfg.net.c_in == 6
        assert cfg.net.rot_rep == "6d" and cfg.rot_rep == "6d"
        assert cfg.trans_rep == "deepim"
        assert cfg.normalize_xyz is True
        assert cfg.crop_ratio == 1.5
        assert cfg.trans_normalizer == (0.01, 0.02, 0.03)
        assert cfg.rot_normalizer == 0.5
        assert zfar_from_reference(raw, "refiner") == math.inf

    def test_scalar_trans_normalizer(self):
        cfg = refiner_cfg_from_reference({"c_in": 6, "trans_normalizer": 0.03})
        assert cfg.trans_normalizer == (0.03, 0.03, 0.03)

    def test_scorer_mapping_sets_network_mode(self):
        cfg = scorer_cfg_from_reference({"c_in": 6, "use_BN": False})
        assert cfg.mode == "network"
        assert cfg.net.use_bn is False

    def test_unsupported_c_in_rejected(self):
        # the reference's c_in=4 legacy default would crash its own
        # predict too (6-channel inputs); must fail loudly, not silently
        with pytest.raises(ValueError, match="c_in"):
            refiner_cfg_from_reference({})  # defaults -> c_in=4
        with pytest.raises(ValueError, match="c_in"):
            scorer_cfg_from_reference({"c_in": 9})

    def test_use_normal_maps_to_9_channels(self):
        cfg = refiner_cfg_from_reference({"c_in": 9, "use_normal": True})
        assert cfg.use_normal and cfg.net.c_in == 9
        # inconsistent c_in/use_normal pairs still rejected
        with pytest.raises(ValueError, match="c_in"):
            refiner_cfg_from_reference({"c_in": 6, "use_normal": True})


# ---------------- torch round-trip (skipped without torch) ----------------

torch = pytest.importorskip("torch")


def _write_checkpoint(tmp_path, net, cfg_yaml: dict, wrap_module: bool):
    """Write model_best.pth (+ config.yml) the way reference runs ship."""
    import yaml

    sd = net.state_dict()
    if wrap_module:
        sd = {f"module.{k}": v for k, v in sd.items()}
    run_dir = tmp_path
    torch.save({"model": sd}, os.path.join(run_dir, "model_best.pth"))
    with open(os.path.join(run_dir, "config.yml"), "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    return os.path.join(run_dir, "model_best.pth")


@pytest.mark.parametrize("use_bn", [True, False])
def test_refiner_checkpoint_roundtrip(tmp_path, use_bn):
    """Non-default config (6d rot, BN per param) through the REAL flow:
    .pth + config.yml -> cli.convert_weights -> npz with embedded config
    -> load_estimator_checkpoint -> identical outputs and right cfg."""
    import jax.numpy as jnp

    from test_networks import TorchRefineNet, randomize_bn_stats
    from foundationpose_tpu.cli.convert_weights import main as convert_main
    from foundationpose_tpu.models.loading import load_estimator_checkpoint
    from foundationpose_tpu.models.networks import apply_refine_net

    torch.manual_seed(3)
    tnet = TorchRefineNet(c_in=6, use_bn=use_bn, rot_dim=6).eval()
    if use_bn:
        randomize_bn_stats(tnet, seed=3)
    cfg_yaml = {
        "c_in": 6, "use_BN": use_bn, "rot_rep": "6d", "trans_rep": "tracknet",
        "normalize_xyz": True, "crop_ratio": 1.4,
        "trans_normalizer": [0.019999, 0.019999, 0.05],
        "rot_normalizer": 0.3490658503988659, "zfar": "Infinity",
        "input_resize": [160, 160],
    }
    src = os.path.join(tmp_path, "run")
    os.makedirs(src)
    ckpt = _write_checkpoint(src, tnet, cfg_yaml, wrap_module=True)
    out_dir = os.path.join(tmp_path, "npz")
    convert_main(["--refiner_ckpt", ckpt, "--out_dir", out_dir])

    params, cfg, zfar = load_estimator_checkpoint(
        os.path.join(out_dir, "refiner.npz"), "refiner"
    )
    assert cfg.net.rot_rep == "6d" and cfg.rot_rep == "6d"
    assert cfg.net.use_bn is use_bn
    assert cfg.crop_ratio == 1.4
    assert cfg.normalize_xyz is True
    assert cfg.trans_normalizer == (0.019999, 0.019999, 0.05)
    assert zfar == math.inf

    rng = np.random.default_rng(5)
    A = rng.standard_normal((2, 160, 160, 6)).astype(np.float32)
    B = rng.standard_normal((2, 160, 160, 6)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(A.transpose(0, 3, 1, 2)),
            torch.from_numpy(B.transpose(0, 3, 1, 2)),
        )
    j_out = apply_refine_net(params, cfg.net, jnp.asarray(A), jnp.asarray(B), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(j_out["rot"]), t_out["rot"].numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_out["trans"]), t_out["trans"].numpy(), atol=2e-3, rtol=1e-3)


def test_scorer_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from test_networks import TorchScoreNet
    from foundationpose_tpu.cli.convert_weights import main as convert_main
    from foundationpose_tpu.models.loading import load_estimator_checkpoint
    from foundationpose_tpu.models.networks import apply_score_net

    torch.manual_seed(4)
    tnet = TorchScoreNet(c_in=6, use_bn=False).eval()
    cfg_yaml = {"c_in": 6, "use_BN": False, "normalize_xyz": False,
                "crop_ratio": 1.1, "input_resize": [160, 160]}
    src = os.path.join(tmp_path, "run")
    os.makedirs(src)
    ckpt = _write_checkpoint(src, tnet, cfg_yaml, wrap_module=True)
    out_dir = os.path.join(tmp_path, "npz")
    convert_main(["--scorer_ckpt", ckpt, "--out_dir", out_dir])

    params, cfg, _ = load_estimator_checkpoint(os.path.join(out_dir, "scorer.npz"), "scorer")
    assert cfg.mode == "network"
    assert cfg.net.use_bn is False
    assert cfg.crop_ratio == 1.1

    rng = np.random.default_rng(6)
    A = rng.standard_normal((3, 160, 160, 6)).astype(np.float32)
    B = rng.standard_normal((3, 160, 160, 6)).astype(np.float32)
    with torch.no_grad():
        t_logits = tnet(
            torch.from_numpy(A.transpose(0, 3, 1, 2)),
            torch.from_numpy(B.transpose(0, 3, 1, 2)),
        ).numpy()
    j_logits = np.asarray(apply_score_net(params, cfg.net, jnp.asarray(A), jnp.asarray(B), dtype=jnp.float32))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


def test_bn_mismatch_rejected(tmp_path):
    """config use_BN=True but BN-less weights -> conversion must abort."""
    from test_networks import TorchRefineNet
    from foundationpose_tpu.cli.convert_weights import main as convert_main

    tnet = TorchRefineNet(c_in=6, use_bn=False).eval()
    src = os.path.join(tmp_path, "run")
    os.makedirs(src)
    ckpt = _write_checkpoint(
        src, tnet, {"c_in": 6, "use_BN": True}, wrap_module=False
    )
    with pytest.raises(SystemExit, match="BatchNorm"):
        convert_main(["--refiner_ckpt", ckpt, "--out_dir", os.path.join(tmp_path, "npz")])


def test_pth_direct_load_with_sidecar(tmp_path):
    """load_weights on a raw .pth discovers the sidecar config.yml."""
    from test_networks import TorchRefineNet
    from foundationpose_tpu.models.loading import load_estimator_checkpoint

    tnet = TorchRefineNet(c_in=6, use_bn=False, rot_dim=6).eval()
    src = os.path.join(tmp_path, "run")
    os.makedirs(src)
    ckpt = _write_checkpoint(
        src, tnet, {"c_in": 6, "use_BN": False, "rot_rep": "6d"}, wrap_module=False
    )
    params, cfg, zfar = load_estimator_checkpoint(ckpt, "refiner")
    assert cfg.rot_rep == "6d"
    assert zfar == 3.0  # reference refiner default (predict_pose_refine.py:124-125)
    assert "encodeA" in params
