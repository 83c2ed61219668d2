"""Activation-level A/B of the fast-render defaults on the bench workload.

Complements tests/test_render_defaults.py (decision-level, trained tiny
nets): here the FULL-WIDTH networks (random init — activation-level
comparison needs no training) consume hypothesis crops rendered
(i) exact per-pixel texture, (ii) the default vertex-color bake, and
(iii) for a dense mesh, the decimated render mesh — and we measure how
much the network outputs move relative to their natural scale across
poses. Run on TPU:

    python tools/ab_render_defaults.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def psnr_masked(a, b, m):
    mse = float((((a - b) ** 2) * m[..., None]).sum() / max(m.sum() * 3, 1))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.meshio import (
        TriMesh,
        compute_mesh_diameter,
        decimate_vertex_clustering,
        texture_to_vertex_colors,
    )
    from foundationpose_tpu.models.networks import (
        RefineNetCfg,
        ScoreNetCfg,
        apply_refine_net,
        apply_score_net,
        init_refine_net,
        init_score_net,
    )
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import make_mesh_tensors

    # bench.py's textured workload mesh
    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    n = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(n[:, 1], n[:, 0]) / (2 * np.pi) + 0.5,
         n[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]],
                 np.float32)
    diam = jnp.float32(compute_mesh_diameter(mesh.vertices))

    # 64 hypothesis poses around the bench viewpoint
    from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
    views = sample_views_icosphere(n_views=40)[:64]
    poses = np.linalg.inv(views).astype(np.float32)
    poses[:, :3, 3] = [0.02, -0.01, 0.9]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    res = 160
    tf = compute_crop_window_tf(posesj, Kj, 1.2, res, diam)

    def crops(m):
        out = render_mesh(
            m.pos, m.faces, posesj, Kj, out_hw=(res, res), crop_tf=tf,
            uv=m.uv, tex=m.tex, vertex_color=m.vertex_color,
            vnormals=m.vnormals, use_light=True, method="pallas",
            tile=32, max_faces_per_tile=256, cull_backfaces=True,
        )
        return jax.block_until_ready(out)

    mt_exact = make_mesh_tensors(mesh)
    mt_baked = make_mesh_tensors(texture_to_vertex_colors(mesh))
    o_exact = crops(mt_exact)
    o_baked = crops(mt_baked)
    m = np.asarray(o_exact.mask) & np.asarray(o_baked.mask)
    p = psnr_masked(np.asarray(o_exact.color), np.asarray(o_baked.color), m)
    mask_diff = float(
        (np.asarray(o_exact.mask) != np.asarray(o_baked.mask)).mean()
    )
    print(f"[bake] crop PSNR (random 256^2 texture, worst case): "
          f"{p:.1f} dB   mask diff {mask_diff * 100:.3f}%")

    # network-input crops: rgb + xyz centered (xyz identical between
    # modes — geometry unchanged), so feed (rgb, xyz) as the pipeline
    # does and compare outputs.
    def net_inputs(o):
        t = posesj[:, :3, 3][:, None, None, :]
        xyz = (o.xyz - t) / (diam / 2.0)
        xyz = jnp.where(jnp.abs(xyz) >= 2, 0.0, xyz)
        return jnp.concatenate([o.color, xyz], axis=-1)

    A_exact = net_inputs(o_exact)
    A_baked = net_inputs(o_baked)
    B = A_exact  # observation branch held fixed (exact render)

    rcfg = RefineNetCfg()
    rp = init_refine_net(jax.random.PRNGKey(0), rcfg)
    f = jax.jit(lambda a: apply_refine_net(rp, rcfg, a, B,
                                           dtype=jnp.bfloat16))
    r_exact = jax.block_until_ready(f(A_exact))
    r_baked = jax.block_until_ready(f(A_baked))
    for k in ("trans", "rot"):
        d = np.abs(np.asarray(r_exact[k]) - np.asarray(r_baked[k]))
        scale = np.std(np.asarray(r_exact[k]))
        print(f"[refine {k}] max |d| {d.max():.4f}  mean {d.mean():.4f}  "
              f"across-pose output std {scale:.4f}  "
              f"(shift/scale = {d.mean() / max(scale, 1e-9):.3f})")

    scfg = ScoreNetCfg()
    sp = init_score_net(jax.random.PRNGKey(1), scfg)
    g = jax.jit(lambda a: apply_score_net(sp, scfg, a, B,
                                          dtype=jnp.bfloat16))
    s_exact = np.asarray(jax.block_until_ready(g(A_exact)))
    s_baked = np.asarray(jax.block_until_ready(g(A_baked)))
    corr = np.corrcoef(s_exact, s_baked)[0, 1]
    rank_corr = np.corrcoef(
        np.argsort(np.argsort(s_exact)), np.argsort(np.argsort(s_baked))
    )[0, 1]
    top_agree = int(np.argmax(s_exact) == np.argmax(s_baked))
    print(f"[score] logit corr {corr:.4f}  rank corr {rank_corr:.4f}  "
          f"top-1 agree {bool(top_agree)}")

    # decimation A/B on a dense mesh (the 8192-face default budget)
    verts5, faces5 = icosphere(5, radius=0.1)
    verts5 = verts5 * (1.0 + 0.15 * np.sin(8 * verts5[:, 2:3]))
    n5 = verts5 / np.linalg.norm(verts5, axis=-1, keepdims=True)
    uv5 = np.stack(
        [np.arctan2(n5[:, 1], n5[:, 0]) / (2 * np.pi) + 0.5,
         n5[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    dense = TriMesh(vertices=verts5, faces=faces5, uv=uv5, texture=tex)
    dense_baked = texture_to_vertex_colors(dense)
    vox = float(diam) / 160.0
    deci = decimate_vertex_clustering(dense, vox)
    while len(deci.faces) > 8192:
        vox *= 1.4
        deci = decimate_vertex_clustering(dense, vox)
    o_dense = crops(make_mesh_tensors(dense_baked))
    o_deci = crops(make_mesh_tensors(deci))
    md = np.asarray(o_dense.mask) & np.asarray(o_deci.mask)
    iou = md.sum() / max(
        (np.asarray(o_dense.mask) | np.asarray(o_deci.mask)).sum(), 1
    )
    pd = psnr_masked(np.asarray(o_dense.color), np.asarray(o_deci.color), md)
    zd = np.abs(
        (np.asarray(o_dense.depth) - np.asarray(o_deci.depth)) * md
    )
    print(f"[decimate {len(dense.faces)}->{len(deci.faces)} faces] "
          f"crop PSNR {pd:.1f} dB  mask IoU {iou:.4f}  "
          f"depth max |d| {zd.max() * 1e3:.2f} mm  "
          f"p99 {np.percentile(zd[md], 99) * 1e3:.2f} mm")


if __name__ == "__main__":
    main()
