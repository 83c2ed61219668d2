"""Multi-chip scaling evidence beyond ok/skipped (VERDICT r4 #5).

Compiles the FULL hypothesis-sharded register graph (the flagship path:
depth filters -> translation guess -> crop render -> 2-iter refine ->
network scorer -> argsort, `pipeline.graph.register_graph`) over 1/2/4/8
virtual CPU devices with the SAME total workload and records, per device
count:

  * the collective inventory of the compiled partitioned HLO
    (all-gather / all-reduce / collective-permute / reduce-scatter /
    all-to-all counts, plus the byte size of the largest all-gather) —
    SURVEY.md §2.9 predicts the scorer's cross-hypothesis attention
    inserts exactly ONE ICI all-gather of pooled (N, D) features; a
    crop-tensor-sized gather here would mean accidental full-tensor
    replication, which this artifact proves absent;
  * median walltime over 5 runs (CPU walltime is NOT TPU perf — XLA's
    CPU backend multithreads a single device — but the relative curve
    shows the sharded graph executes, shrinks per-device work, and
    pays only small collectives).

Writes MULTICHIP_SCALING.json at the repo root (committed artifact).

Run:  python tools/multichip_evidence.py
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must win before backend init AND before the package's jax_config.py
# runs: the axon TPU plugin overrides JAX_PLATFORMS during discovery,
# and jax_config.py re-asserts the env var (the login shell exports
# JAX_PLATFORMS=axon) over any earlier config.update.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

COLLECTIVES = (
    "all-gather", "all-reduce", "collective-permute", "reduce-scatter",
    "all-to-all",
)
DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def collective_inventory(hlo_text: str) -> dict:
    """Count collective ops in compiled HLO and size the all-gathers."""
    counts = {}
    for op in COLLECTIVES:
        # matches both sync (`all-gather(`) and async (`all-gather-start(`)
        counts[op] = len(re.findall(rf"\b{op}(?:-start)?\(", hlo_text))
    ag_bytes, ag_shapes = [], []
    for m in re.finditer(
        r"= ([a-z0-9]+)\[([0-9,]*)\][^=]*? all-gather(?:-start)?\(", hlo_text
    ):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        ag_bytes.append(n * DTYPE_BYTES.get(dt, 4))
        ag_shapes.append(f"{dt}[{dims}]")
    counts["max_allgather_bytes"] = max(ag_bytes, default=0)
    counts["sum_allgather_bytes"] = sum(ag_bytes)
    counts["allgather_shapes"] = sorted(ag_shapes)
    return counts


def main():
    from foundationpose_tpu.geometry.icosphere import icosphere
    from foundationpose_tpu.meshio import TriMesh
    from foundationpose_tpu.models.networks import (
        RefineNetCfg, ScoreNetCfg, init_refine_net, init_score_net,
    )
    from foundationpose_tpu.ops import render_mesh
    from foundationpose_tpu.parallel.sharding import (
        batch_sharding, make_device_mesh, replicate_tree, replicated,
    )
    from foundationpose_tpu.pipeline import (
        EstimatorCfg, RefinerCfg, ScorerCfg, make_mesh_tensors,
    )
    from foundationpose_tpu.pipeline.graph import register_graph

    assert jax.default_backend() == "cpu" and jax.device_count() >= 8, (
        jax.default_backend(), jax.device_count(),
    )

    # --- fixed workload (identical at every device count)
    N_HYP, ITERS, HW = 64, 2, (120, 160)
    cfg = EstimatorCfg(
        refiner=RefinerCfg(
            net=RefineNetCfg(base_width=8), compute_dtype="float32",
            input_res=32,
        ),
        scorer=ScorerCfg(
            net=ScoreNetCfg(base_width=8), mode="network", input_res=32,
            compute_dtype="float32",
        ),
    )
    verts, faces = icosphere(2, radius=0.1)
    rng = np.random.default_rng(0)
    mesh = TriMesh(
        vertices=verts, faces=faces,
        vertex_colors=rng.integers(30, 255, size=(len(verts), 3)).astype(np.uint8),
    )
    mt = make_mesh_tensors(mesh)
    K = jnp.asarray(
        np.array([[140.0, 0, 80.0], [0, 140.0, 60.0], [0, 0, 1.0]], np.float32)
    )
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.01, -0.02, 0.85]
    frame = render_mesh(
        mt.pos, mt.faces, jnp.asarray(gt[None]), K, out_hw=HW,
        vertex_color=mt.vertex_color, vnormals=mt.vnormals, use_light=True,
    )
    rgb_u8 = (np.asarray(frame.color[0]) * 255).astype(np.uint8)
    depth = np.asarray(frame.depth[0]).astype(np.float32)
    mask = np.asarray(frame.mask[0]).astype(np.uint8)
    grid = np.tile(np.eye(4, dtype=np.float32), (N_HYP, 1, 1))
    rots = jax.random.orthogonal(jax.random.PRNGKey(0), 3, shape=(N_HYP,))
    grid[:, :3, :3] = np.asarray(rots, np.float32)
    rparams = init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net)
    sparams = init_score_net(jax.random.PRNGKey(1), cfg.scorer.net)
    diameter = jnp.float32(0.2)

    out = {
        "workload": {
            "graph": "pipeline.graph.register_graph (full register, one jit)",
            "n_hyp": N_HYP, "iterations": ITERS, "frame_hw": list(HW),
            "base_width": 8, "input_res": 32, "scorer_mode": "network",
            "mesh": "icosphere(nsub=2) 162v/320f",
            "note": "CPU walltime is not TPU perf: all virtual devices "
                    "share this host's physical cores, which XLA:CPU "
                    "already multithreads for ONE device — so sharding "
                    "shrinks per-device work 8x without adding cores, "
                    "and collective overhead can make the curve flat or "
                    "negative. The checkable claims are the collective "
                    "inventory (SURVEY.md 2.9: the scorer's "
                    "cross-hypothesis attention gathers pooled features; "
                    "everything else is KB-scale pose/score bookkeeping) "
                    "and the ABSENCE of crop-tensor-sized collectives "
                    "(no accidental full replication).",
        },
        "per_devices": {},
    }
    base_ms = None
    for n_dev in (1, 2, 4, 8):
        dmesh = make_device_mesh(n_dev)
        sh = batch_sharding(dmesh)
        rep = replicated(dmesh)
        args = (
            replicate_tree(rparams, dmesh),
            replicate_tree(sparams, dmesh),
            cfg,
            replicate_tree(mt, dmesh),
            jax.device_put(jnp.asarray(grid), sh),
            jax.device_put(jnp.ones((N_HYP,), bool), sh),
            jax.device_put(K, rep),
            jax.device_put(jnp.asarray(rgb_u8), rep),
            jax.device_put(jnp.asarray(depth), rep),
            jax.device_put(jnp.asarray(mask), rep),
            jax.device_put(diameter, rep),
        )
        lowered = register_graph.lower(*args, iterations=ITERS)
        compiled = lowered.compile()
        inv = collective_inventory(compiled.as_text())

        def run():
            t0 = time.perf_counter()
            res = register_graph(*args, iterations=ITERS)
            jax.block_until_ready(res)
            return (time.perf_counter() - t0) * 1e3

        run()  # warmup (executable cache is keyed on shardings)
        times = sorted(run() for _ in range(5))
        med = times[len(times) // 2]
        if n_dev == 1:
            base_ms = med
        out["per_devices"][str(n_dev)] = {
            "walltime_ms_median": round(med, 2),
            "rel_speedup_vs_1dev": round(base_ms / med, 3),
            "collectives": inv,
        }
        print(f"{n_dev} devices: {med:.1f} ms, collectives={inv}")

    # --- the claims a reader must be able to check
    for n_dev in ("2", "4", "8"):
        inv = out["per_devices"][n_dev]["collectives"]
        assert inv["all-gather"] >= 1, inv  # scorer cross-hyp attention
        # No accidental full-tensor replication: the largest gather must
        # be pooled-feature-sized (N*D floats), far under one crop
        # tensor (N*res*res*6 f32 = 1.5 MiB at res 32).
        assert inv["max_allgather_bytes"] < 2**20, inv
    out["checks"] = {
        "allgather_present_when_sharded": True,
        "max_allgather_under_1MiB": True,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "MULTICHIP_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
