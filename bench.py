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
    * fused attention core: compiled Pallas kernel vs the XLA reference
      math at the RefineNet head shape (252, 400, 512, 4) on bf16
      inputs, max |Δ| < 2e-3 (one bf16 ulp at the output scale) — this
      kernel sits on every TPU refine/score forward, so a Mosaic
      miscompile of the masking or softmax must fail the gate, not
      silently skew every recorded number.
    Returns {"parity_ok": bool, "raster_smooth_max_abs": float,
    "raster_edge_frac": float, "scatter_max_abs": float,
    "attn_max_abs": float}.
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

    # --- fused attention core: compiled kernel vs XLA math at the
    # RefineNet transformer-head shape (this is the exact dispatch the
    # refine/score forwards take on TPU; see ops/attention.py).
    from foundationpose_tpu.ops.attention import (
        _attention_core_pallas,
        _attention_core_xla,
        _routes_to_pallas,
    )

    B_a, L_a, D_a, H_a = 252, 400, 512, 4
    assert _routes_to_pallas(jnp.bfloat16, D_a, H_a), (
        "bench shape no longer routes to the Pallas attention kernel"
    )
    qkv = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (B_a, L_a, 3 * D_a)),
        jnp.bfloat16,
    )
    a_pl = np.asarray(
        jax.block_until_ready(_attention_core_pallas(qkv, H_a)), np.float32
    )
    a_ref = np.asarray(_attention_core_xla(qkv, H_a), np.float32)
    attn_max = float(np.abs(a_pl - a_ref).max())

    ok = (
        mask_mismatch == 0
        and ovf == 0
        and raster_max < 2e-4
        and edge_frac < 0.04
        and scatter_max < 1e-4
        and attn_max < 2e-3
    )
    if not ok:
        import sys

        print(
            f"[parity FAILED] mask_mismatch={mask_mismatch} overflow={ovf} "
            f"raster_smooth_max={raster_max:.2e} edge_frac={edge_frac:.4f} "
            f"scatter_max={scatter_max:.2e} attn_max={attn_max:.2e}",
            file=sys.stderr,
        )
    return {
        "parity_ok": bool(ok),
        "raster_smooth_max_abs": round(raster_max, 8),
        "raster_edge_frac": round(edge_frac, 5),
        "scatter_max_abs": round(scatter_max, 8),
        "attn_max_abs": round(attn_max, 8),
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

    # All tensors enter as jit ARGUMENTS (not closed-over constants), so
    # each timed stage compiles against runtime parameters — XLA can
    # neither fold nor specialize on the inputs (ADVICE r4).
    render_jit = jax.jit(lambda _mt, _p, _K, _tf: rsum(render_mesh(
        _mt.pos, _mt.faces, _p, _K, out_hw=(res, res), crop_tf=_tf,
        uv=_mt.uv, tex=_mt.tex, vertex_color=_mt.vertex_color,
        vnormals=_mt.vnormals, use_light=True, method="pallas",
        tile=r.tile, max_faces_per_tile=r.max_faces_per_tile,
        cull_backfaces=r.cull_backfaces)))

    def render_f():
        return render_jit(mt, posesj, Kj, tf)
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
    flops = 0.0
    try:
        cost = refine_f.lower(A, B).compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
        if flops > 0:
            out["refine_fwd_tflops_per_s"] = round(
                flops / (out["stage_refine_fwd_ms"] / 1000.0) / 1e12, 2
            )
    except Exception:  # cost analysis is best-effort, backend-dependent
        pass

    # Amortized DEVICE timing of the same forward (VERDICT r4 #8): K
    # chained iterations inside one jitted fori_loop (data dependence so
    # XLA cannot elide them), one scalar fetch, RTT subtracted — the
    # `tools/profile_refine_segments.py` method behind the README's MFU
    # claim, now emitted into the artifact so both methodologies live in
    # the same JSON line. stage_refine_fwd_ms above includes per-call
    # dispatch; this one is what the chip itself sustains.
    K_loop = 10

    @jax.jit
    def refine_loop(a, b):
        def body(i, carry):
            outs = apply_refine_net(
                est.refiner_params, rcfg.net,
                (a + carry * 1e-30).astype(a.dtype), b,
            )
            return sum(v.sum() for v in outs.values()).astype(jnp.float32)

        return jax.lax.fori_loop(0, K_loop, body, jnp.float32(0.0))

    rtt_s = measure_tunnel_rtt_ms(n=8) / 1e3
    np.asarray(refine_loop(A, B))  # compile
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(refine_loop(A, B))
        ts.append(time.perf_counter() - t0)
    ms_dev = max(float(np.median(ts)) - rtt_s, 1e-9) * 1e3 / K_loop
    out["stage_refine_fwd_ms_device"] = round(ms_dev, 2)
    if flops > 0:
        out["refine_fwd_tflops_per_s_device"] = round(
            flops / (ms_dev / 1e3) / 1e12, 2
        )
    return out


import sys

def _progress(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

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
    _progress("parity gate...")
    parity = parity_gate(mesh, K)
    _progress("parity done")

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
    # Random-init trunk + ZEROED delta heads, passed explicitly: the
    # benchmark times the REAL network path (refine x5 + score) with
    # identical FLOPs to any trained checkpoint; accuracy needs trained
    # or converted weights. Zero heads = zero pose deltas = the
    # steady-state of a converged tracker on a static scene. Random
    # nonzero heads are the wrong workload for a throughput number:
    # full-range tanh deltas (~diameter/2 per iteration) walk every
    # register out of its ROI window (8/8 timed registers paid window +
    # full-frame recovery, r5 measured), and even 1e-3-scaled heads
    # drift the tracked pose until its crop clips the frame edge, at
    # which point the containment recovery + in-flight chain repair
    # correctly but expensively re-run everything (3.2 FPS measured).
    # The recovery paths have their own tests (tests/test_pipeline.py);
    # the bench measures the violation-free steady state and reports
    # the recovery counters so a nonzero count flags a regression.
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.models.networks import (
        init_refine_net,
        init_score_net,
    )

    refiner_params = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    for head in ("trans_head", "rot_head"):
        refiner_params[head]["1"]["kernel"] = jnp.zeros_like(
            refiner_params[head]["1"]["kernel"]
        )
        refiner_params[head]["1"]["bias"] = jnp.zeros_like(
            refiner_params[head]["1"]["bias"]
        )

    est = FoundationPose(
        mesh=mesh,
        cfg=cfg,
        refiner_params=refiner_params,
        scorer_params=init_score_net(jax.random.PRNGKey(1), cfg.scorer.net),
    )
    n_hyp = int(np.asarray(est.hyp_valid).sum())

    # Warmup (compile), then timed runs.
    _progress("register warmup...")
    est.register(K, rgb, depth, mask, iteration=5)
    _progress("register timing...")
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        est.register(K, rgb, depth, mask, iteration=5)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    hyp_per_s = n_hyp / t
    # Attribution: the upload-window size the registers used (None =
    # full frame) and whether any containment recovery re-ran a frame.
    reg_roi = est._register_roi_window(
        np.asarray(K), np.asarray(depth), np.asarray(mask)
    )
    register_diag = {
        "register_roi_px": 0 if reg_roi is None else int(reg_roi[2]),
        "register_roi_recoveries": int(est.register_roi_recoveries),
    }

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
    _progress("funneled warmup...")
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
    # into ONE buffer (cfg.track_pack); dispatches run up to 2k frames
    # ahead and poses are fetched k AT A TIME with one RPC
    # (fetch_track_results), so the tunnel round trip costs RTT/k per
    # frame instead of RTT per frame (BENCH_r04: fetch 22.3 ms/frame ~=
    # the 28.3 ms RTT — it was the dominant term). The tunnel RTT,
    # per-frame dispatch/fetch medians, and recovery counters are all
    # recorded so the FPS number is attributable after the fact.
    from collections import deque

    from foundationpose_tpu.pipeline import fetch_track_results

    _progress("tracking section...")
    tunnel_rtt_ms = measure_tunnel_rtt_ms()
    est.track_one(rgb, depth, K, iteration=2)  # warmup/compile
    est.track_stats = {"frames": 0, "roi_recoveries": 0, "chain_repairs": 0}
    n_track, k_fetch = 48, 8
    frames = [
        (np.ascontiguousarray(rgb), np.ascontiguousarray(depth))
        for _ in range(n_track)
    ]  # distinct buffers -> real per-frame H2D transfers
    # Producer/consumer overlap: the main thread only dispatches; a
    # single consumer thread drains poses in dispatch order, k at a
    # time (fetch_track_results). Inline fetches would stall the
    # dispatch loop for the batch-fetch's ~2 tunnel RTTs every k
    # frames (BENCH r5 interim: 21.8 FPS with inline batched fetches —
    # fetch and dispatch each ~13 ms/frame, serialized). Overlapped,
    # the wall per frame is max(dispatch, fetch/k), not the sum; pose
    # values and the containment/repair cascade are unchanged because
    # fetches still run strictly in dispatch order.
    import queue
    import threading

    # maxsize bounds dispatch-ahead (backpressure keeps ROI placement
    # from going arbitrarily stale on moving scenes)
    futs: "queue.Queue" = queue.Queue(maxsize=2 * k_fetch)
    disp_s, fetch_s = [], []

    def consumer():
        pend = []
        while True:
            item = futs.get()
            if item is None:
                break
            pend.append(item)
            if len(pend) >= k_fetch:
                ta = time.perf_counter()
                fetch_track_results(pend)
                fetch_s.append((time.perf_counter() - ta) / len(pend))
                pend = []
        if pend:
            ta = time.perf_counter()
            fetch_track_results(pend)
            fetch_s.append((time.perf_counter() - ta) / len(pend))

    th = threading.Thread(target=consumer)
    t0 = time.perf_counter()
    th.start()
    for frgb, fdepth in frames:
        ta = time.perf_counter()
        fut = est.track_one_async(frgb, fdepth, K, iteration=2)
        disp_s.append(time.perf_counter() - ta)
        futs.put(fut)  # blocks only when the consumer falls k*2 behind
    futs.put(None)
    th.join()
    track_fps = n_track / (time.perf_counter() - t0)
    track_diag = {
        "tunnel_rtt_ms": round(tunnel_rtt_ms, 1),
        "track_fetch_batch": k_fetch,
        "track_fetch_overlap": True,
        "track_dispatch_ms": round(float(np.median(disp_s)) * 1000, 1),
        "track_fetch_ms": round(float(np.median(fetch_s)) * 1000, 1),
        "track_roi_recoveries": est.track_stats["roi_recoveries"],
        "track_chain_repairs": est.track_stats["chain_repairs"],
    }

    # Tracking metric 2: DEVICE-CHAINED rate — k=32 packed frames are
    # pre-staged on device and the 2-iter tracking step runs as a
    # lax.scan chain over them (pipeline/graph.py::track_chain_graph,
    # bit-identical per step to the per-frame packed graph, tested in
    # tests/test_pipeline.py). One dispatch + one fetch covers 32
    # frames, so neither host scheduling nor tunnel load can leak into
    # the per-frame number: this is the chip-capability figure
    # (BENCH_r04's "device rate" fell 342.6 -> 217.6 under host load
    # because it still dispatched per frame). The windows are the SAME
    # ROI-sized windows the e2e path streams.
    import jax.numpy as jnp

    from foundationpose_tpu.pipeline.graph import (
        pack_track_frame,
        track_chain_graph,
    )

    n_chain = 32
    roi = est._track_roi_window(np.asarray(K, np.float32), H, W)
    if roi is not None:
        cx0, cy0, csz = roi
        chain_rgb = rgb[cy0 : cy0 + csz, cx0 : cx0 + csz]
        chain_depth = depth[cy0 : cy0 + csz, cx0 : cx0 + csz]
    else:
        cx0 = cy0 = 0
        chain_rgb, chain_depth = rgb, depth
    one = pack_track_frame(chain_rgb, chain_depth, cx0, cy0)
    bufs = jax.block_until_ready(
        jnp.asarray(np.broadcast_to(one, (n_chain,) + one.shape).copy())
    )
    chain_args = (
        est.refiner_params, est.cfg, est.mesh_tensors, est.pose_last,
        jnp.asarray(K, jnp.float32), bufs, jnp.float32(est.diameter),
    )
    chain_kw = dict(hw=chain_depth.shape, iterations=2)
    _progress("chain metric...")
    np.asarray(track_chain_graph(*chain_args, **chain_kw))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        # fetch the output (np.asarray) rather than block_until_ready:
        # the only completion signal that is reliable across this RPC
        # tunnel (see tools/profile_refine_segments.py). One RTT per 32
        # frames rides the measurement; subtract it below.
        np.asarray(track_chain_graph(*chain_args, **chain_kw))
        ts.append(time.perf_counter() - t0)
    t_chain = max(float(np.median(ts)) - tunnel_rtt_ms / 1e3, 1e-6)
    device_track_fps = n_chain / t_chain
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
                **register_diag,
                "tracking_fps_end_to_end": round(track_fps, 1),
                "tracking_fps_device_chain": round(device_track_fps, 1),
                **track_diag,
                **stages,
                **parity,
            }
        )
    )


if __name__ == "__main__":
    main()
