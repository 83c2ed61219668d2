"""Amortized device-time breakdown of the pallas-path crop render at the
register shape (252 poses x 160^2): XLA record prep vs kernel vs
post-processing (untile + xyz + texture + light).

Uses the fori_loop-amortized timing pattern (see
profile_refine_segments.py) — single-shot block_until_ready timings are
unreliable over the axon tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit_loop(fn, *args, K=8, n=6, perturb=0):
    @jax.jit
    def run(*a):
        def body(i, c):
            aa = list(a)
            aa[perturb] = (aa[perturb] + c * 1e-30).astype(a[perturb].dtype)
            out = fn(*aa)
            return jax.tree_util.tree_reduce(
                lambda s, x: s + x.astype(jnp.float32).sum(), out,
                jnp.float32(0.0),
            )
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    triv = jax.jit(lambda: jnp.float32(1.0))
    np.asarray(triv())
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(triv())
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    np.asarray(run(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - rtt) * 1e3 / K


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.models.networks import init_refine_net, init_score_net
    from foundationpose_tpu.geometry.projection import (
        compute_crop_window_tf, depth_to_xyz_map,
    )

    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
         nrm[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)

    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.9]

    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster),
    )
    rp = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), cfg.scorer.net)
    est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=rp, scorer_params=sp)
    mt = est.mesh_tensors

    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = gt[:3, 3]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    diam = jnp.float32(est.diameter)
    tf = jax.jit(lambda p: compute_crop_window_tf(p, Kj, 1.2, 160, diam))(posesj)
    tf = jax.block_until_ready(tf)

    # --- full render
    def rend(p, tf_):
        return render_mesh(
            mt.pos, mt.faces, p, Kj, out_hw=(160, 160), crop_tf=tf_,
            vertex_color=mt.vertex_color, uv=mt.uv, tex=mt.tex,
            vnormals=mt.vnormals, use_light=True, method=raster.method,
            tile=raster.tile, max_faces_per_tile=raster.max_faces_per_tile,
            cull_backfaces=raster.cull_backfaces,
            pose_block=raster.pose_block, raster_rounds=raster.rounds)

    t = timeit_loop(lambda p, tf_: rend(p, tf_).color, posesj, tf)
    print(f"full render 252x160^2:     {t:7.2f} ms")

    # --- prep only (records + active chunks)
    from foundationpose_tpu.ops import rasterizer as R
    from foundationpose_tpu.ops.pallas_raster2 import (
        active_chunks, pack_records, raster_pose_pallas,
    )

    H = W = 160
    tile = raster.tile
    nty, ntx = H // tile, W // tile
    pos_f = mt.pos[mt.faces]
    vn_f = mt.vnormals[mt.faces]
    # estimator renders use vertex colors (vertex_color_render converts
    # the texture at reset), so Da = 3 color + 1 light
    col_f = mt.vertex_color[mt.faces]
    light_dir = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    def per_pose_rec(R_1, t_1, ctf_1):
        pts_f = pos_f @ R_1.T + t_1
        z_f = jnp.maximum(pts_f[..., 2], 1e-8)
        u = pts_f[..., 0] * Kj[0, 0] / z_f + Kj[0, 2]
        v = pts_f[..., 1] * Kj[1, 1] / z_f + Kj[1, 2]
        u = ctf_1[0, 0] * u + ctf_1[0, 2]
        v = ctf_1[1, 1] * v + ctf_1[1, 2]
        xy_f = jnp.stack([u, v], axis=-1)
        valid_f = jnp.all(pts_f[..., 2] > 1e-4, axis=-1)
        p0 = pts_f[:, 0]
        fn = jnp.cross(pts_f[:, 1] - p0, pts_f[:, 2] - p0)
        valid_f = valid_f & (jnp.sum(fn * p0, axis=-1) < 0)
        vn_cam = vn_f @ R_1.T
        vn_n = vn_cam / jnp.maximum(
            jnp.linalg.norm(vn_cam, axis=-1, keepdims=True), 1e-12)
        diff = jnp.clip(jnp.sum(vn_n * (-light_dir), axis=-1), 0.0, 1.0)[..., None]
        tri_attr = jnp.concatenate([col_f, diff], axis=-1)
        coeffs, zinv = R._face_coeffs(xy_f, pts_f[..., 2], valid_f)
        rec = pack_records(xy_f, pts_f[..., 2], valid_f, tri_attr, coeffs, zinv)
        act, acnt = active_chunks(rec, H, W, tile)
        return rec, act, acnt

    # Pad to a pose_block multiple, exactly as render_mesh does
    # (rasterizer.py:445-448).
    N = posesj.shape[0]
    pad_n = (-N) % raster.pose_block
    posesp = jnp.concatenate([posesj, jnp.tile(posesj[:1], (pad_n, 1, 1))], 0)
    tfp = jnp.concatenate([tf, jnp.tile(tf[:1], (pad_n, 1, 1))], 0)
    Np = N + pad_n
    R_all = posesp[:, :3, :3]
    t_all = posesp[:, :3, 3][:, None, :]

    def prep(Rb, tb, cb):
        nb = Np // raster.pose_block
        return jax.lax.map(
            lambda a: jax.vmap(per_pose_rec)(*a),
            (Rb.reshape(nb, raster.pose_block, 3, 3),
             tb.reshape(nb, raster.pose_block, 1, 3),
             cb.reshape(nb, raster.pose_block, 3, 3)),
        )

    t_prep = timeit_loop(prep, R_all, t_all, tfp)
    print(f"record prep (252 poses):   {t_prep:7.2f} ms")

    rec_all, act_all, acnt_all = jax.jit(prep)(R_all, t_all, tfp)
    rec_all = jnp.reshape(rec_all, (Np, rec_all.shape[-2], rec_all.shape[-1]))
    act_all = jnp.reshape(act_all, (Np, nty * ntx, -1))
    acnt_all = jnp.reshape(acnt_all, (Np, nty * ntx))
    rec_all = jax.block_until_ready(rec_all)
    Kp = ((raster.max_faces_per_tile + 127) // 128) * 128

    t_kern = timeit_loop(
        lambda r, a, c: raster_pose_pallas(
            r, a, c, tile, ntx, nty, K=Kp, rounds=raster.rounds)[0],
        rec_all, act_all, acnt_all)
    print(f"pallas kernel:             {t_kern:7.2f} ms")

    print(f"post (full - prep - kern): {t - t_prep - t_kern:7.2f} ms")


if __name__ == "__main__":
    main()
