"""Component profile of the neural-object-field train step on TPU.

Times, at reference-parity settings (2048 rays x (128+128) samples,
16-level 2^22 hash grid): the full train step, hashgrid forward,
hashgrid forward+backward, the backward's segment-add alone, the MLP
forward+backward, and the occupancy sampling.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import dataclasses

    from foundationpose_tpu.meshio import make_box
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
    from foundationpose_tpu.nerf import NerfCfg
    from foundationpose_tpu.nerf.runner import NerfRunner
    from foundationpose_tpu.nerf.scene import compute_scene_bounds, preprocess_data
    from foundationpose_tpu.ops.hashgrid import (
        HashGridCfg, hashgrid_encode, init_hashgrid,
    )
    from foundationpose_tpu.ops.pallas_scatter import sorted_segment_add_planes

    box = make_box(np.array([0.2, 0.2, 0.2]))
    rng = np.random.default_rng(0)
    box.vertex_colors = rng.integers(50, 255, (8, 3)).astype(np.uint8)
    K = np.array([[120.0, 0, 64.0], [0, 120.0, 64.0], [0, 0, 1.0]], np.float32)
    views = sample_views_icosphere(n_views=4)
    cam_in_obs = views.copy()
    cam_in_obs[:, :3, 3] *= 0.6
    out = render_mesh(
        jnp.asarray(box.vertices.astype(np.float32)),
        jnp.asarray(box.faces.astype(np.int32)),
        jnp.asarray(np.linalg.inv(cam_in_obs).astype(np.float32)),
        jnp.asarray(K), out_hw=(128, 128),
        vertex_color=jnp.asarray(box.vertex_colors.astype(np.float32) / 255),
        vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
        use_light=True, pose_block=12,
    )
    rgbs = (np.asarray(out.color) * 255).astype(np.uint8)
    depths = np.asarray(out.depth).astype(np.float32)
    masks = np.asarray(out.mask).astype(np.uint8)

    cfg = NerfCfg()  # reference parity
    sc, tr, pts = compute_scene_bounds(K, rgbs, depths, masks, cam_in_obs)
    cfg = dataclasses.replace(
        cfg, sc_factor=sc, translation=tuple(np.asarray(tr).tolist())
    )
    rn, dn, pn = preprocess_data(rgbs, depths, masks, cam_in_obs, sc, tr)
    runner = NerfRunner(cfg, rn, dn, masks, pn, K, build_pcd=pts)

    key = jax.random.PRNGKey(0)
    t_step = timeit(
        lambda: runner._train_step(runner.params, runner.opt_state, key)
    )
    print(f"full train step:            {t_step:8.1f} ms")

    # --- fewer-points presets: drop the occupancy samples farthest from
    # the depth band (NerfCfg.occ_keep_frac; quality A/B gated in
    # tests/test_nerf.py::TestOccKeepFrac)
    for frac in (0.75, 0.5):
        cfg_k = dataclasses.replace(cfg, occ_keep_frac=frac)
        runner_k = NerfRunner(cfg_k, rn, dn, masks, pn, K, build_pcd=pts)
        t_k = timeit(
            lambda: runner_k._train_step(
                runner_k.params, runner_k.opt_state, key
            )
        )
        print(f"train step keep_frac={frac}:   {t_k:8.1f} ms")

    # --- hashgrid alone on the same point count
    gcfg = runner.grid_cfg
    Np = cfg.n_rand * (cfg.n_samples + cfg.n_samples_around_depth)
    x = jnp.asarray(rng.uniform(-1, 1, (Np, 3)), jnp.float32)
    grid = runner.params["grid"]
    print(f"points/step: {Np}  slots/pt: {gcfg.n_levels * 8}  "
          f"table rows: {grid.shape[0]}")

    f_fwd = jax.jit(lambda g, x: hashgrid_encode(g, x, gcfg).sum())
    print(f"hashgrid fwd:               {timeit(f_fwd, grid, x):8.1f} ms")

    f_both = jax.jit(
        jax.grad(lambda g, x: hashgrid_encode(g, x, gcfg).sum(), argnums=(0, 1))
    )
    print(f"hashgrid fwd+bwd:           {timeit(f_both, grid, x):8.1f} ms")

    # --- segment-add alone at the same update count
    M = Np * gcfg.n_levels * 8
    idx = jnp.asarray(rng.integers(0, grid.shape[0], M), jnp.int32)
    upd = jnp.asarray(rng.standard_normal((2, M)), jnp.float32)
    f_seg = jax.jit(
        lambda i, u: sorted_segment_add_planes(i, u, grid.shape[0]).sum()
    )
    print(f"segment-add ({M/1e6:.1f}M upd):   {timeit(f_seg, idx, upd):8.1f} ms")

    # --- sort alone (the segment-add's prep)
    f_sort = jax.jit(
        lambda i, u: jax.lax.sort([i, u[0], u[1]], num_keys=1)[0][-1]
    )
    print(f"  sort {M/1e6:.1f}M (idx+2 planes): {timeit(f_sort, idx, upd):6.1f} ms")

    # --- MLP fwd+bwd at step shapes
    from foundationpose_tpu.nerf.model import apply_nerf_mlp

    S = cfg.n_samples + cfg.n_samples_around_depth
    from foundationpose_tpu.nerf.model import sh_encode

    sh_dim = sh_encode(jnp.ones((1, 3)), cfg.multires_views).shape[-1]
    emb = jnp.asarray(
        rng.standard_normal((cfg.n_rand, S, gcfg.out_dim)), jnp.float32
    )
    ve = jnp.asarray(
        rng.standard_normal(
            (cfg.n_rand, S, sh_dim + cfg.frame_features)
        ),
        jnp.float32,
    )
    mlp = runner.params["mlp"]
    f_mlp = jax.jit(
        jax.grad(
            lambda p, e, v: apply_nerf_mlp(
                p, e, v, dtype=jnp.bfloat16 if cfg.amp else jnp.float32
            ).sum().astype(jnp.float32)
        )
    )
    print(f"mlp fwd+bwd:                {timeit(f_mlp, mlp, emb, ve):8.1f} ms")

    # --- occupancy sampling alone
    from foundationpose_tpu.nerf.occupancy import sample_occupied

    dirs = jnp.asarray(rng.standard_normal((cfg.n_rand, 3)), jnp.float32)
    o = jnp.zeros((cfg.n_rand, 3), jnp.float32)
    d = jnp.asarray(rng.uniform(0.5, 1.5, (cfg.n_rand,)), jnp.float32)
    f_samp = jax.jit(
        lambda o, dirs, d: sample_occupied(
            runner.occ, o, dirs, jax.random.PRNGKey(1), cfg.n_samples,
            depth=d, trunc=cfg.trunc * cfg.sc_factor,
            far_clip=cfg.far * cfg.sc_factor,
            candidate_mult=cfg.candidate_mult,
        )[0].sum()
    )
    print(f"occupancy sampling:         {timeit(f_samp, o, dirs, d):8.1f} ms")


if __name__ == "__main__":
    main()
