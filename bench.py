"""Headline benchmark: full registration throughput on one chip.

Workload matches the reference's benchmark configuration
(BASELINE.md): 252 rotation hypotheses, 5 refinement iterations,
hypothesis scoring, argmax — on a ~5k-face textured-equivalent object at
640x480.

BASELINE BASIS (stated explicitly so `vs_baseline` cannot mislead):
the denominator is the only published measurement of the reference —
~1.3 s per 252-hypothesis registration (≈194 hyp/s) on an
**RTX-3090-class GPU** (paper, arXiv:2312.08344 §benchmarks). No
RTX-4090 measurement of the reference exists (in its repo, the paper,
or this environment); BASELINE.json's "vs RTX-4090" north star is
therefore reported against this 3090 basis, with the caveat that a
4090 would plausibly be 1.5-2x faster on the same CUDA code. The JSON
line carries `baseline_basis` so downstream records stay honest.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"baseline_basis", "parity_ok", ...}.
"""
import json
import time

import numpy as np

BASELINE_HYP_PER_S = 252.0 / 1.3  # reference: ~1.3 s / 252-hypothesis register
BASELINE_BASIS = "RTX-3090 paper number (1.3 s / 252 hyp); no 4090 measurement exists"


def parity_gate(mesh, K) -> dict:
    """On-chip parity of the compiled Pallas kernels vs exact references.

    Every parity TEST runs the kernels CPU-interpreted; this gate runs
    the actual compiled Mosaic code on the benchmark hardware before any
    timing, so the recorded throughput is of verified kernels:
    * rasterizer: 16-pose batch, method='pallas' vs 'brute' — masks
      bit-equal; on SMOOTH pixels (mask-interior AND 3x3 depth range
      < 2 mm) color/depth max |Δ| < 2e-4. Pixels at occlusion edges are
      excluded on principle: the two paths project vertices through
      differently-associated (equally valid) f32 math, so coverage can
      flip at a triangle boundary and a different face — at a genuinely
      different depth — wins the z-test there. That is a tie-break
      artifact every pair of independent rasterizers exhibits
      (nvdiffrast included), not a kernel defect; it is bounded instead
      (< 4% of covered pixels may differ by > 1e-3).
    * sorted_segment_add: 1M-update stream vs XLA scatter-add,
      max |Δ| < 1e-4.
    Returns {"parity_ok": bool, "raster_smooth_max_abs": float,
    "raster_edge_frac": float, "scatter_max_abs": float}.
    """
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.geometry.icosphere import sample_views_icosphere
    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.meshio import compute_mesh_diameter
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.ops.pallas_scatter import sorted_segment_add

    # --- rasterizer: the hot path's exact render shape — each pose
    # rasterized straight into its 160x160 network crop (crop_tf), with
    # vertex colors + lighting + back-face culling.
    rng = np.random.default_rng(7)
    views = sample_views_icosphere(n_views=4)[:16]
    poses = np.linalg.inv(views).astype(np.float32)
    poses[:, :3, 3] = [0.02, -0.01, 0.9]
    poses[:, 2, 3] += rng.uniform(-0.15, 0.3, len(poses))
    colors = rng.uniform(0.1, 1.0, (len(mesh.vertices), 3)).astype(np.float32)
    diam = jnp.float32(compute_mesh_diameter(mesh.vertices))
    Kj = jnp.asarray(K)
    crop_tf = compute_crop_window_tf(jnp.asarray(poses), Kj, 1.2, 160, diam)
    args = dict(
        out_hw=(160, 160),
        crop_tf=crop_tf,
        vertex_color=jnp.asarray(colors),
        vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
        use_light=True,
        tile=32,
        max_faces_per_tile=256,
        cull_backfaces=True,
    )
    outs = {}
    for method in ("pallas", "brute"):
        o = render_mesh(
            jnp.asarray(mesh.vertices.astype(np.float32)),
            jnp.asarray(mesh.faces.astype(np.int32)),
            jnp.asarray(poses), Kj, method=method, **args,
        )
        outs[method] = jax.block_until_ready(o)
    mask_mismatch = int(
        (np.asarray(outs["pallas"].mask) != np.asarray(outs["brute"].mask)).sum()
    )
    agree = np.asarray(outs["brute"].mask) & np.asarray(outs["pallas"].mask)

    def shift_filter(x, reduce):
        """3x3 min/max filter via shifted views (no scipy dependency)."""
        out = x.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = np.roll(np.roll(x, dy, axis=1), dx, axis=2)
                out = reduce(out, s)
        return out

    bd = np.asarray(outs["brute"].depth)
    interior = (
        shift_filter(agree.astype(np.uint8), np.minimum).astype(bool)
    )
    zmax = shift_filter(np.where(agree, bd, -1e9), np.maximum)
    zmin = shift_filter(np.where(agree, bd, 1e9), np.minimum)
    smooth = interior & ((zmax - zmin) < 2e-3)

    raster_max = 0.0
    edge_big = 0
    for field in ("color", "depth"):
        a = np.asarray(getattr(outs["pallas"], field))
        b = np.asarray(getattr(outs["brute"], field))
        m = smooth[..., None] if a.ndim == 4 else smooth
        ma = agree[..., None] if a.ndim == 4 else agree
        raster_max = max(raster_max, float(np.abs((a - b) * m).max()))
        edge_big = max(edge_big, int((np.abs((a - b) * ma) > 1e-3).sum()))
    edge_frac = edge_big / max(int(agree.sum()), 1)
    ovf = int(np.asarray(outs["pallas"].overflow).sum())

    # --- sorted segment-add: the NeRF hash-grid gradient workload.
    M, C, TBL = 1 << 20, 8, 1 << 19
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    idx = jnp.sort(jax.random.randint(k1, (M,), 0, TBL, dtype=jnp.int32))
    upd = jax.random.uniform(k2, (M, C), minval=-1.0, maxval=1.0)
    ours = sorted_segment_add(idx, upd, TBL)
    ref = jnp.zeros((TBL, C), jnp.float32).at[idx].add(upd)
    scatter_max = float(jnp.max(jnp.abs(ours - ref)))

    # --- factored segment-add: the oct hash-grid backward (sorts the
    # 8 weight + 2C cotangent factor planes, expands w*g per chunk).
    from foundationpose_tpu.ops.pallas_scatter import factored_segment_add

    L, N, SEG = 4, 1 << 16, 1 << 14
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    idx_lv = (
        jax.random.randint(ks[0], (L, N), 0, SEG, dtype=jnp.int32)
        + (jnp.arange(L, dtype=jnp.int32) * SEG)[:, None]
    )
    w8 = jax.random.uniform(ks[1], (8, L, N))
    gg = jax.random.uniform(ks[2], (2, L, N), minval=-1.0, maxval=1.0)
    ours_f = factored_segment_add(idx_lv, w8, gg, L * SEG)
    w16 = w8.astype(jnp.bfloat16).astype(jnp.float32)
    exp = (w16[:, None] * gg[None]).reshape(16, L * N)
    ref_f = (
        jnp.zeros((L * SEG, 16), jnp.float32)
        .at[idx_lv.reshape(-1)]
        .add(exp.T)
    )
    scatter_max = max(scatter_max, float(jnp.max(jnp.abs(ours_f - ref_f))))

    ok = (
        mask_mismatch == 0
        and ovf == 0
        and raster_max < 2e-4
        and edge_frac < 0.04
        and scatter_max < 1e-4
    )
    if not ok:
        import sys

        print(
            f"[parity FAILED] mask_mismatch={mask_mismatch} overflow={ovf} "
            f"raster_smooth_max={raster_max:.2e} edge_frac={edge_frac:.4f} "
            f"scatter_max={scatter_max:.2e}",
            file=sys.stderr,
        )
    return {
        "parity_ok": bool(ok),
        "raster_smooth_max_abs": round(raster_max, 8),
        "raster_edge_frac": round(edge_frac, 5),
        "scatter_max_abs": round(scatter_max, 8),
    }


def measure_tunnel_rtt_ms(n: int = 20) -> float:
    """Median host<->device round trip of a trivial 1-element fetch.

    On this environment's RPC-tunneled chip the RTT varies run to run
    (observed 10-35 ms); recording it makes tracking-FPS numbers
    comparable across BENCH artifacts (round 3's 55->15 FPS episode was
    unattributable without it)."""
    import jax
    import jax.numpy as jnp

    one = jnp.zeros(())
    jax.block_until_ready(one)
    rtts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.asarray(one) + 1.0)
        rtts.append(time.perf_counter() - t0)
    return float(np.median(rtts)) * 1000.0


def stage_breakdown(est, K, n_hyp):
    """Approximate per-stage register costs, each stage jitted alone with
    a scalar-reduced output (tools/profile_stages.py method): hypothesis
    render (per refine iteration), RefineNet forward, ScoreNet forward —
    plus the RefineNet's achieved TFLOP/s from the compiled executable's
    own cost analysis. Purely diagnostic; the headline number stays the
    fused end-to-end register time."""
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.geometry.projection import compute_crop_window_tf
    from foundationpose_tpu.models.networks import (
        apply_refine_net,
        apply_score_net,
    )
    from foundationpose_tpu.ops import render_mesh

    def timeit(fn, n=5):
        jax.block_until_ready(fn())
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1000.0

    mt = est.mesh_tensors
    rcfg = est.cfg.refiner
    res = rcfg.input_res
    poses = np.asarray(est.rot_grid).copy()
    poses[:, :3, 3] = [0.02, -0.01, 0.9]
    posesj = jnp.asarray(poses[:n_hyp])
    Kj = jnp.asarray(K)
    diam = jnp.float32(est.diameter)
    tf = compute_crop_window_tf(posesj, Kj, rcfg.crop_ratio, res, diam)
    r = rcfg.raster

    def rsum(o):
        return o.color.sum() + o.xyz.sum()

    render_f = jax.jit(lambda: rsum(render_mesh(
        mt.pos, mt.faces, posesj, Kj, out_hw=(res, res), crop_tf=tf,
        uv=mt.uv, tex=mt.tex, vertex_color=mt.vertex_color,
        vnormals=mt.vnormals, use_light=True, method="pallas",
        tile=r.tile, max_faces_per_tile=r.max_faces_per_tile,
        cull_backfaces=r.cull_backfaces)))
    rng = np.random.default_rng(1)
    c_in = 6 if not rcfg.use_normal else 9
    A = jnp.asarray(rng.uniform(0, 1, (n_hyp, res, res, c_in)), jnp.float32)
    B = jnp.asarray(rng.uniform(0, 1, (n_hyp, res, res, c_in)), jnp.float32)
    refine_f = jax.jit(lambda a, b: sum(
        v.sum() for v in apply_refine_net(
            est.refiner_params, rcfg.net, a, b).values()))
    score_f = jax.jit(lambda a, b: apply_score_net(
        est.scorer_params, est.cfg.scorer.net, a, b).sum())
    out = {
        "stage_render_ms": round(timeit(render_f), 2),
        "stage_refine_fwd_ms": round(timeit(lambda: refine_f(A, B)), 2),
        "stage_score_fwd_ms": round(timeit(lambda: score_f(A, B)), 2),
    }
    try:
        cost = refine_f.lower(A, B).compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
        if flops > 0:
            out["refine_fwd_tflops_per_s"] = round(
                flops / (out["stage_refine_fwd_ms"] / 1000.0) / 1e12, 2
            )
    except Exception:  # cost analysis is best-effort, backend-dependent
        pass
    return out


def main():
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.pipeline import EstimatorCfg, ScorerCfg, FoundationPose

    # ~5k-face TEXTURED object, 0.2 m diameter (mustard-bottle-class
    # workload; real YCB meshes are textured, so the benchmark exercises
    # the texture-sampling path).
    verts, faces = icosphere(4, radius=0.1)
    rng = np.random.default_rng(0)
    verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))  # non-sphere shape
    n = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
    uv = np.stack(
        [np.arctan2(n[:, 1], n[:, 0]) / (2 * np.pi) + 0.5,
         n[:, 2] * 0.5 + 0.5], axis=-1,
    ).astype(np.float32)
    tex = rng.integers(30, 255, size=(256, 256, 3)).astype(np.uint8)
    mesh = TriMesh(vertices=verts, faces=faces, uv=uv, texture=tex)

    H, W = 480, 640
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.02, -0.01, 0.9]

    # Verify the compiled kernels on this chip BEFORE timing them.
    parity = parity_gate(mesh, K)

    # Synthetic observation rendered with the same rasterizer.
    out = render_mesh(
        jnp.asarray(mesh.vertices.astype(np.float32)),
        jnp.asarray(mesh.faces.astype(np.int32)),
        jnp.asarray(gt[None]),
        jnp.asarray(K),
        out_hw=(H, W),
        uv=jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)),
        tex=jnp.asarray(tex.astype(np.float32) / 255.0),
        vnormals=jnp.asarray(mesh.vertex_normals.astype(np.float32)),
        use_light=True,
    )
    rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
    depth = np.asarray(out.depth[0]).astype(np.float32)
    mask = np.asarray(out.mask[0]).astype(np.uint8)

    from foundationpose_tpu.pipeline import RasterCfg, RefinerCfg

    # Closed consistently-wound mesh -> back-face culling is exact.
    raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster),
    )
    # Random-init weights, passed explicitly: the benchmark times the
    # REAL network path (refine x5 + score); accuracy needs trained or
    # converted checkpoints.
    import jax

    from foundationpose_tpu.models.networks import (
        init_refine_net,
        init_score_net,
    )

    est = FoundationPose(
        mesh=mesh,
        cfg=cfg,
        refiner_params=init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net),
        scorer_params=init_score_net(jax.random.PRNGKey(1), cfg.scorer.net),
    )
    n_hyp = int(np.asarray(est.hyp_valid).sum())

    # Warmup (compile), then timed runs.
    est.register(K, rgb, depth, mask, iteration=5)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        est.register(K, rgb, depth, mask, iteration=5)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    hyp_per_s = n_hyp / t

    # Secondary: the documented funneled preset (fast_register: prune@2
    # keep 64) on the SAME workload. Parity stays the headline; this
    # records the preset's throughput in the same artifact so both
    # README numbers trace to one bench run.
    est_f = FoundationPose(
        mesh=mesh,
        cfg=cfg.fast_register(),
        refiner_params=est.refiner_params,
        scorer_params=est.scorer_params,
    )
    est_f.register(K, rgb, depth, mask, iteration=5)  # warmup/compile
    times_f = []
    for _ in range(5):
        t0 = time.perf_counter()
        est_f.register(K, rgb, depth, mask, iteration=5)
        times_f.append(time.perf_counter() - t0)
    hyp_per_s_funneled = n_hyp / float(np.median(times_f))
    del est_f

    # Secondary: tracking FPS (refine-only, 2 iterations/frame).
    # Pipelined end-to-end: each frame ships fresh host inputs packed
    # into ONE buffer (cfg.track_pack), dispatch of frame N+1 overlaps
    # the fetch of frame N (track_one_async), so the host<->chip round
    # trip amortizes instead of serializing. The tunnel RTT, per-frame
    # dispatch/fetch medians, and recovery counters are all recorded so
    # the FPS number is attributable after the fact.
    from collections import deque

    tunnel_rtt_ms = measure_tunnel_rtt_ms()
    est.track_one(rgb, depth, K, iteration=2)  # warmup/compile
    est.track_stats = {"frames": 0, "roi_recoveries": 0, "chain_repairs": 0}
    n_track = 40
    frames = [
        (np.ascontiguousarray(rgb), np.ascontiguousarray(depth))
        for _ in range(n_track)
    ]  # distinct buffers -> real per-frame H2D transfers
    futs: deque = deque()
    disp_s, fetch_s = [], []
    t0 = time.perf_counter()
    for frgb, fdepth in frames:
        ta = time.perf_counter()
        futs.append(est.track_one_async(frgb, fdepth, K, iteration=2))
        disp_s.append(time.perf_counter() - ta)
        if len(futs) > 3:
            ta = time.perf_counter()
            futs.popleft().result()
            fetch_s.append(time.perf_counter() - ta)
    while futs:
        ta = time.perf_counter()
        futs.popleft().result()
        fetch_s.append(time.perf_counter() - ta)
    track_fps = n_track / (time.perf_counter() - t0)
    track_diag = {
        "tunnel_rtt_ms": round(tunnel_rtt_ms, 1),
        "track_dispatch_ms": round(float(np.median(disp_s)) * 1000, 1),
        "track_fetch_ms": round(float(np.median(fetch_s)) * 1000, 1),
        "track_roi_recoveries": est.track_stats["roi_recoveries"],
        "track_chain_repairs": est.track_stats["chain_repairs"],
    }

    # Device-side tracking rate (async-queued, excludes the host<->chip
    # round-trip latency of this environment's RPC tunnel).
    import jax.numpy as jnp

    from foundationpose_tpu.pipeline.graph import track_graph

    dev_args = (
        est.refiner_params, est.cfg, est.mesh_tensors, est.pose_last,
        jnp.asarray(K, jnp.float32), jnp.asarray(rgb, jnp.uint8),
        jnp.asarray(depth, jnp.float32), jnp.float32(est.diameter),
    )
    jax.block_until_ready(track_graph(*dev_args, iterations=2))
    t0 = time.perf_counter()
    outs = [track_graph(*dev_args, iterations=2) for _ in range(20)]
    jax.block_until_ready(outs)
    device_track_fps = 20 / (time.perf_counter() - t0)
    import sys

    stages = stage_breakdown(est, K, n_hyp)

    print(
        f"[secondary] tracking_fps={track_fps:.1f} end-to-end "
        f"(device-rate {device_track_fps:.1f}; target >=30; "
        f"rtt {track_diag['tunnel_rtt_ms']} ms, dispatch "
        f"{track_diag['track_dispatch_ms']} ms, fetch "
        f"{track_diag['track_fetch_ms']} ms, recoveries "
        f"{track_diag['track_roi_recoveries']}+"
        f"{track_diag['track_chain_repairs']}), "
        f"register_s={t:.3f} (render {stages['stage_render_ms']} ms/iter, "
        f"refine fwd {stages['stage_refine_fwd_ms']} ms, score fwd "
        f"{stages['stage_score_fwd_ms']} ms)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "register_hypotheses_per_sec",
                "value": round(hyp_per_s, 2),
                "unit": "hyp/s (252-hyp, 5-iter registration)",
                "vs_baseline": round(hyp_per_s / BASELINE_HYP_PER_S, 3),
                "baseline_basis": BASELINE_BASIS,
                "register_hyp_per_s_funneled": round(hyp_per_s_funneled, 2),
                "tracking_fps_end_to_end": round(track_fps, 1),
                "tracking_fps_device": round(device_track_fps, 1),
                **track_diag,
                **stages,
                **parity,
            }
        )
    )


if __name__ == "__main__":
    main()
