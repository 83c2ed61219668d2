"""Accuracy A/B of the fast-render defaults (round-2 VERDICT item 2).

The estimator's default hypothesis rendering bakes textures to
per-vertex colors (`EstimatorCfg.vertex_color_render=True`) and
decimates very dense meshes (`max_render_faces=8192`); the reference
samples the texture per pixel in every hypothesis render
(/root/reference/Utils.py:186-189 inside predict_pose_refine.py:47-53).
These tests quantify that workload transformation on synthetic textured
scenes and PIN the defaults:

1. crop fidelity: PSNR between exact-per-pixel-texture crops and
   vertex-baked crops at hypothesis-render resolution;
2. decision level: tiny nets trained on EXACT-textured crops (the
   analogue of the released weights, which were trained on nvdiffrast
   per-pixel-textured renders) drive full register() under each render
   mode on the same frames; the resulting ADD-S must agree within the
   gate (~2 mm) for the defaults to stay fast.

tools/ab_render_defaults.py runs the same A/B on the TPU bench workload
with full-width nets (activation level) and records numbers for README.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.geometry.icosphere import icosphere
from foundationpose_tpu.meshio import TriMesh, texture_to_vertex_colors
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
from foundationpose_tpu.ops.rasterizer import render_mesh
from foundationpose_tpu.pipeline import (
    EstimatorCfg,
    FoundationPose,
    RefinerCfg,
    ScorerCfg,
    make_mesh_tensors,
)
from foundationpose_tpu.utils.metrics import adds_err

K = np.array(
    [[420.0, 0, 160.0], [0, 420.0, 120.0], [0, 0, 1.0]], np.float32
)
HW = (240, 320)


def textured_sphere(n_sub=3, radius=0.1, tex_size=128, freq=4.0):
    """Bumpy icosphere with a mid-frequency procedural texture —
    representative of real object textures (smooth fields + structure),
    not white noise (which no bake could preserve and no real object
    exhibits)."""
    verts, faces = icosphere(n_sub, radius=radius)
    verts = verts * (1.0 + 0.12 * np.sin(7 * verts[:, 2:3] / radius))
    n = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [
            np.arctan2(n[:, 1], n[:, 0]) / (2 * np.pi) + 0.5,
            n[:, 2] * 0.5 + 0.5,
        ],
        axis=-1,
    ).astype(np.float32)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, tex_size), np.linspace(0, 1, tex_size),
        indexing="ij",
    )
    r = 0.55 + 0.35 * np.sin(2 * np.pi * freq * xx) * np.cos(
        2 * np.pi * freq * yy
    )
    g = 0.5 + 0.4 * np.cos(2 * np.pi * freq * 0.7 * (xx + yy))
    b = 0.45 + 0.35 * np.sin(2 * np.pi * freq * 1.3 * yy + 2.0)
    tex = (np.clip(np.stack([r, g, b], axis=-1), 0, 1) * 255).astype(
        np.uint8
    )
    return TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)


def synth_frame_textured(mesh, pose):
    """Full-frame observation rendered with EXACT per-pixel texture."""
    mt = make_mesh_tensors(mesh)
    out = render_mesh(
        mt.pos, mt.faces,
        jnp.asarray(pose[None].astype(np.float32)), jnp.asarray(K),
        out_hw=HW, uv=mt.uv, tex=mt.tex, vnormals=mt.vnormals,
        use_light=True,
    )
    rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
    depth = np.asarray(out.depth[0]).astype(np.float32)
    mask = np.asarray(out.mask[0]).astype(np.uint8)
    return rgb, depth, mask


def _crop_renders(mesh, poses, res=160):
    """Render hypothesis crops exact-textured vs vertex-baked."""
    from foundationpose_tpu.geometry.projection import (
        compute_crop_window_tf,
    )
    from foundationpose_tpu.meshio import compute_mesh_diameter

    diam = jnp.float32(compute_mesh_diameter(mesh.vertices))
    tf = compute_crop_window_tf(
        jnp.asarray(poses), jnp.asarray(K), 1.2, res, diam
    )
    outs = {}
    for name, m in (
        ("exact", make_mesh_tensors(mesh)),
        ("baked", make_mesh_tensors(texture_to_vertex_colors(mesh))),
    ):
        outs[name] = render_mesh(
            m.pos, m.faces, jnp.asarray(poses), jnp.asarray(K),
            out_hw=(res, res), crop_tf=tf, uv=m.uv, tex=m.tex,
            vertex_color=m.vertex_color, vnormals=m.vnormals,
            use_light=True,
        )
    return outs


class TestCropFidelity:
    def test_bake_psnr_at_crop_scale(self):
        """Vertex-baked crops must stay close to exact-texture crops at
        the render-budget vertex density (~1 vertex / 1-2 crop px)."""
        mesh = textured_sphere(n_sub=4)  # 2562 verts: bench density
        rng = np.random.default_rng(3)
        poses = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
        poses[:, :3, 3] = [0.0, 0.0, 0.55]
        for i in range(8):
            w = rng.normal(size=3) * 1.2
            th = np.linalg.norm(w)
            k_ = w / max(th, 1e-9)
            Kx = np.array(
                [[0, -k_[2], k_[1]], [k_[2], 0, -k_[0]], [-k_[1], k_[0], 0]]
            )
            poses[i, :3, :3] = (
                np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
            ).astype(np.float32)
        outs = _crop_renders(mesh, poses)
        m = np.asarray(outs["exact"].mask) & np.asarray(outs["baked"].mask)
        a = np.asarray(outs["exact"].color)
        b = np.asarray(outs["baked"].color)
        mse = float((((a - b) ** 2) * m[..., None]).sum() / (m.sum() * 3))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # masks nearly identical (same geometry)
        mask_diff = float(
            (np.asarray(outs["exact"].mask) != np.asarray(outs["baked"].mask)).mean()
        )
        assert mask_diff < 1e-3
        # measured ~31 dB on this mid-frequency texture; gate with margin
        assert psnr > 26.0, f"bake PSNR {psnr:.1f} dB"


def _train_tiny_nets(mesh):
    """Train tiny refiner+scorer on EXACT-textured crops (mirrors the
    released weights' training on per-pixel-textured nvdiffrast
    renders)."""
    from foundationpose_tpu.datasets.synthetic import (
        make_refiner_batch,
        make_scorer_batch,
    )
    from foundationpose_tpu.meshio import compute_mesh_diameter

    mt = make_mesh_tensors(mesh)  # keeps uv/tex -> exact-textured crops
    Kj = jnp.asarray(K)
    diameter = jnp.float32(compute_mesh_diameter(mesh.vertices))

    rcfg = RefinerCfg(
        net=RefineNetCfg(base_width=8), compute_dtype="float32",
        input_res=64,
    )
    rparams = init_refine_net(jax.random.PRNGKey(7), rcfg.net)
    tcfg = TrainCfg(lr=1e-3, compute_dtype="float32")
    opt = make_optimizer(tcfg).init(rparams)
    for step in range(220):
        b = make_refiner_batch(
            jax.random.PRNGKey(900 + step), mt, Kj, rcfg, diameter,
            n=16, frame_hw=(120, 160), rot_sigma=0.25, trans_sigma=0.05,
        )
        rparams, opt, _ = refine_train_step(
            rparams, opt, rcfg.net, tcfg,
            {k: b[k] for k in ("A", "B", "trans_target", "rot_target")},
        )

    scene_key = jax.random.PRNGKey(42)
    scfg = ScorerCfg(
        net=ScoreNetCfg(base_width=8), input_res=64, mode="network",
        compute_dtype="float32",
    )
    sparams = init_score_net(jax.random.PRNGKey(8), scfg.net)
    stcfg = TrainCfg(lr=3e-4, compute_dtype="float32")
    sopt = make_optimizer(stcfg).init(sparams)
    for step in range(220):
        sb = make_scorer_batch(
            jax.random.PRNGKey(7000 + step), mt, Kj, scfg, diameter,
            n=16, frame_hw=HW, scene_key=scene_key,
        )
        sparams, sopt, _ = score_train_step(
            sparams, sopt, scfg.net, stcfg,
            {k: sb[k] for k in ("A", "B", "target")},
        )
    return rcfg, rparams, scfg, sparams, scene_key


@pytest.mark.slow
class TestDecisionLevelAB:
    def test_fast_defaults_match_exact_add(self):
        """Full register() with the fast defaults (vertex bake) vs exact
        per-pixel texture, same trained-on-exact weights, same frames:
        the ADD-S of the returned poses must agree within the ~2 mm
        gate — evidence the fast defaults are accuracy-neutral on this
        suite (they pass crops through nets trained on EXACT textures,
        exactly the released-weights situation)."""
        from foundationpose_tpu.datasets.synthetic import make_scorer_batch
        from foundationpose_tpu.meshio import compute_mesh_diameter

        mesh = textured_sphere(n_sub=3)
        rcfg, rparams, scfg, sparams, scene_key = _train_tiny_nets(mesh)
        mt = make_mesh_tensors(mesh)
        diameter = jnp.float32(compute_mesh_diameter(mesh.vertices))

        def run_register(vertex_bake: bool, gt):
            cfg = EstimatorCfg(
                refiner=rcfg, scorer=scfg,
                vertex_color_render=vertex_bake,
            )
            est = FoundationPose(
                mesh=mesh, cfg=cfg,
                refiner_params=rparams, scorer_params=sparams,
            )
            rgb, depth, mask = synth_frame_textured(mesh, gt)
            pose = est.register(K, rgb, depth, mask, iteration=5)
            return adds_err(pose, gt, mesh.vertices)

        deltas, errs_fast, errs_exact = [], [], []
        for seed in (77, 78):
            sb = make_scorer_batch(
                jax.random.PRNGKey(seed), mt, jnp.asarray(K), scfg,
                diameter, n=4, frame_hw=HW, scene_key=scene_key,
            )
            gt = np.asarray(sb["gt"], np.float32)
            e_fast = run_register(True, gt)
            e_exact = run_register(False, gt)
            errs_fast.append(e_fast)
            errs_exact.append(e_exact)
            deltas.append(abs(e_fast - e_exact))
        # both modes must land in the tiny-net accuracy regime at all
        assert np.mean(errs_fast) < 0.06 and np.mean(errs_exact) < 0.06, (
            errs_fast, errs_exact,
        )
        # the A/B gate: fast defaults shift ADD-S by < 2 mm on average
        assert np.mean(deltas) < 0.002, (
            f"fast-render ADD-S shift {np.mean(deltas) * 1e3:.2f} mm "
            f"(fast {errs_fast}, exact {errs_exact})"
        )
