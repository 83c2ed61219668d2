"""Fill-vs-eval split of the pallas raster kernel via ablated variants.

Builds the exact register-shape record/chunk inputs, then times:
  * full kernel (fill + tiered eval + rounds)
  * fill-only (eval replaced by a zero write)
  * eval-only-ish (full minus fill-only is the eval estimate)

    python tools/profile_kernel_ablate.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foundationpose_tpu.ops import pallas_raster2 as PR


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def make_variant(mode):
    """mode in {'full', 'fill_only', 'no_tiers'}."""
    orig = PR._raster_kernel

    def kern(act_ref, acnt_ref, rec_ref, out_ref, ovf_ref, acc_ref, *,
             tile, ntx, nty, K, Da, rounds):
        if mode == "full":
            return orig(act_ref, acnt_ref, rec_ref, out_ref, ovf_ref,
                        acc_ref, tile=tile, ntx=ntx, nty=nty, K=K, Da=Da,
                        rounds=rounds)
        D2 = 17 + 3 * Da
        P = tile * tile
        CW = 8
        r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        U = (r128 <= c128).astype(jnp.float32)
        L = (jax.lax.broadcasted_iota(jnp.int32, (CW, CW), 0)
             > jax.lax.broadcasted_iota(jnp.int32, (CW, CW), 1)
             ).astype(jnp.float32)
        rowid_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0).astype(
            jnp.float32)

        def do_tile(t, _):
            ty = t // ntx
            tx = t % ntx
            tx0 = (tx * tile).astype(jnp.float32)
            ty0 = (ty * tile).astype(jnp.float32)
            tx1 = tx0 + (tile - 1)
            ty1 = ty0 + (tile - 1)

            def fill(r):
                acc_ref[:] = jnp.zeros((acc_ref.shape[0], K), jnp.float32)
                n_act = acnt_ref[0, 0, t]
                n_grp = (n_act + (CW - 1)) // CW
                n_act_f = n_act.astype(jnp.float32)

                def do_group(g, base):
                    j0 = g * CW
                    slabs, ovs = [], []
                    for j in range(CW):
                        cid = act_ref[0, t, j0 + j]
                        slab = rec_ref[0, cid, :, :]
                        live = (j0 + j).astype(jnp.float32) < n_act_f
                        ov = ((slab[0:1, :] <= tx1) & (slab[1:2, :] >= tx0)
                              & (slab[2:3, :] <= ty1) & (slab[3:4, :] >= ty0)
                              & (slab[13:14, :] > 0) & live)
                        slabs.append(slab)
                        ovs.append(ov)
                    OV = jnp.concatenate(
                        [o.astype(jnp.float32) for o in ovs], axis=0)
                    ranks = jax.lax.dot_general(
                        OV, U, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    totals = ranks[:, 127:128]
                    bases = jax.lax.dot_general(
                        L, totals, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    tgt = ranks + bases + (base - 1.0 - r * K)
                    tgt = tgt * OV - (1.0 - OV) * jnp.float32(2e9)
                    slab_all = jnp.concatenate([s[4:] for s in slabs], axis=1)
                    tgt_all = tgt.reshape(1, CW * 128)
                    oh_all = (rowid_k == tgt_all).astype(jnp.float32)
                    acc_ref[:] += jax.lax.dot_general(
                        slab_all, oh_all, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    return base + jnp.sum(totals)

                return jax.lax.fori_loop(0, n_grp, do_group, jnp.float32(0.0))

            count = fill(0)
            ovf_ref[0, 0, t] = jnp.maximum(
                count - float(rounds * K), 0.0).astype(jnp.int32)
            out_ref[0, t, :, :] = jnp.zeros((Da, P), jnp.float32) + count
            return 0

        jax.lax.fori_loop(0, ntx * nty, do_tile, 0)

    return kern


def run_variant(mode, rec, act, acnt, tile, ntx, nty, K, rounds):
    N, D2, Fp = rec.shape
    Da = (D2 - 17) // 3
    T = ntx * nty
    P = tile * tile
    C = Fp // 128
    rec_c = rec.reshape(N, D2, C, 128).transpose(0, 2, 1, 3)
    pad_c = (-act.shape[2]) % 8
    if pad_c:
        act = jnp.concatenate(
            [act, jnp.zeros((N, T, pad_c), act.dtype)], axis=2)
    kern = functools.partial(
        make_variant(mode), tile=tile, ntx=ntx, nty=nty, K=K, Da=Da,
        rounds=rounds)
    f = jax.jit(lambda a, c, r: pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((N, T, Da, P), jnp.float32),
            jax.ShapeDtypeStruct((N, 1, T), jnp.int32),
        ),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, T, act.shape[2]), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, D2, 128), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, Da, P), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((D2 - 4, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(a, c, r)[0])
    return timeit(f, act, acnt[:, None, :], rec_c)


def main():
    import tools.profile_render_stages as S  # reuse its input builder

    # Rebuild the same inputs inline (the module has no builder fn).
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RasterCfg, RefinerCfg, ScorerCfg, FoundationPose,
    )
    from foundationpose_tpu.models.networks import init_refine_net, init_score_net
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.ops import rasterizer as R
    from foundationpose_tpu.ops.pallas_raster2 import active_chunks, pack_records

    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(nrm[:, 1], nrm[:, 0]) / (2 * np.pi) + 0.5,
         nrm[:, 2] * 0.5 + 0.5], axis=-1).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]],
                 np.float32)
    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    cfg = EstimatorCfg(refiner=RefinerCfg(raster=raster),
                       scorer=ScorerCfg(mode="network", raster=raster))
    rp = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    sp = init_score_net(jax.random.PRNGKey(1), cfg.scorer.net)
    est = FoundationPose(mesh=mesh, cfg=cfg, refiner_params=rp,
                         scorer_params=sp)
    mt = est.mesh_tensors
    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = [0.02, -0.01, 0.9]
    posesj = jnp.asarray(poses)
    Kj = jnp.asarray(K)
    diam = jnp.float32(est.diameter)
    tf = jax.jit(lambda p: compute_crop_window_tf(p, Kj, 1.2, 160, diam))(
        posesj)

    H = W = 160
    tile = raster.tile
    nty, ntx = H // tile, W // tile
    pos_f = mt.pos[mt.faces]
    vn_f = mt.vnormals[mt.faces]
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
        diff = jnp.clip(jnp.sum(vn_n * (-light_dir), axis=-1), 0.0, 1.0)[
            ..., None]
        tri_attr = jnp.concatenate([col_f, diff], axis=-1)
        coeffs, zinv = R._face_coeffs(xy_f, pts_f[..., 2], valid_f)
        rec = pack_records(xy_f, pts_f[..., 2], valid_f, tri_attr, coeffs,
                           zinv)
        act, acnt = active_chunks(rec, H, W, tile)
        return rec, act, acnt

    N = posesj.shape[0]
    pad_n = (-N) % raster.pose_block
    posesp = jnp.concatenate(
        [posesj, jnp.tile(posesj[:1], (pad_n, 1, 1))], 0)
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
             cb.reshape(nb, raster.pose_block, 3, 3)))

    rec_all, act_all, acnt_all = jax.jit(prep)(R_all, t_all, tfp)
    rec_all = jnp.reshape(rec_all, (Np, rec_all.shape[-2], rec_all.shape[-1]))
    act_all = jnp.reshape(act_all, (Np, nty * ntx, -1))
    acnt_all = jnp.reshape(acnt_all, (Np, nty * ntx))
    rec_all = jax.block_until_ready(rec_all)
    Kp = ((raster.max_faces_per_tile + 127) // 128) * 128

    t_full = run_variant("full", rec_all, act_all, acnt_all, tile, ntx,
                         nty, Kp, raster.rounds)
    t_fill = run_variant("fill_only", rec_all, act_all, acnt_all, tile,
                         ntx, nty, Kp, raster.rounds)
    print(f"full kernel: {t_full:7.2f} ms (raw, incl RTT)")
    print(f"fill only:   {t_fill:7.2f} ms (raw, incl RTT)")
    print(f"eval est:    {t_full - t_fill:7.2f} ms")


if __name__ == "__main__":
    main()
