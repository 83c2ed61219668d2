"""Find what serializes the pipelined tracking loop on the tunneled TPU.

Times each per-frame host step in isolation:
  1. jnp.asarray(rgb/depth)  -- H2D transfer enqueue
  2. track_graph dispatch    -- jit call with already-device inputs
  3. fetch (np.asarray)      -- D2H of the (4,4) pose
"""
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from foundationpose_tpu.geometry.icosphere import icosphere
from foundationpose_tpu.meshio import TriMesh
from foundationpose_tpu.ops import render_mesh
from foundationpose_tpu.pipeline import EstimatorCfg, ScorerCfg, FoundationPose, RasterCfg, RefinerCfg
from foundationpose_tpu.models.networks import init_refine_net, init_score_net

verts, faces = icosphere(4, radius=0.1)
rng = np.random.default_rng(0)
verts = verts * (1.0 + 0.15 * np.sin(8 * verts[:, 2:3]))
mesh = TriMesh(vertices=verts, faces=faces,
               vertex_colors=np.full((len(verts), 3), 0.7, np.float32))
H, W = 480, 640
K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]], np.float32)
gt = np.eye(4, dtype=np.float32)
gt[:3, 3] = [0.02, -0.01, 0.9]
out = render_mesh(jnp.asarray(mesh.vertices.astype(np.float32)),
                  jnp.asarray(mesh.faces.astype(np.int32)),
                  jnp.asarray(gt[None]), jnp.asarray(K), out_hw=(H, W),
                  vertex_color=jnp.full((len(verts), 3), 0.7, jnp.float32),
                  use_light=False)
rgb = (np.asarray(out.color[0]) * 255).astype(np.uint8)
depth = np.asarray(out.depth[0]).astype(np.float32)
mask = np.asarray(out.mask[0]).astype(np.uint8)

raster = RasterCfg(tile=32, max_faces_per_tile=256, cull_backfaces=True)
cfg = EstimatorCfg(refiner=RefinerCfg(raster=raster), scorer=ScorerCfg(mode="network", raster=raster))
est = FoundationPose(mesh=mesh, cfg=cfg,
                     refiner_params=init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net),
                     scorer_params=init_score_net(jax.random.PRNGKey(1), cfg.scorer.net))
est.register(K, rgb, depth, mask, iteration=5)
est.track_one(rgb, depth, K, iteration=2)

# --- 1. H2D enqueue cost
frames = [(np.ascontiguousarray(rgb), np.ascontiguousarray(depth)) for _ in range(20)]
t0 = time.perf_counter()
devs = []
for frgb, fdepth in frames:
    devs.append((jnp.asarray(frgb), jnp.asarray(fdepth)))
t_enq = time.perf_counter() - t0
jax.block_until_ready(devs)
t_done = time.perf_counter() - t0
print(f"H2D enqueue: {t_enq/20*1000:.1f} ms/frame; enqueue+complete: {t_done/20*1000:.1f} ms/frame")

# --- 2. dispatch cost with device-resident inputs
from foundationpose_tpu.pipeline.graph import track_graph
dev_rgb, dev_depth = devs[0]
dev_K = jnp.asarray(K, jnp.float32)
dia = jnp.float32(est.diameter)
jax.block_until_ready(track_graph(est.refiner_params, est.cfg, est.mesh_tensors,
                                  est.pose_last, dev_K, dev_rgb, dev_depth, dia, iterations=2))
t0 = time.perf_counter()
outs = []
p = est.pose_last
for i in range(20):
    p = track_graph(est.refiner_params, est.cfg, est.mesh_tensors,
                    p, dev_K, dev_rgb, dev_depth, dia, iterations=2)
    outs.append(p)
t_disp = time.perf_counter() - t0
jax.block_until_ready(outs)
t_disp_done = time.perf_counter() - t0
print(f"dispatch(dev inputs): {t_disp/20*1000:.1f} ms/frame enqueue; {t_disp_done/20*1000:.1f} ms/frame complete")

# --- 3. fetch cost
t0 = time.perf_counter()
for o in outs:
    np.asarray(o)
print(f"fetch after ready: {(time.perf_counter()-t0)/20*1000:.2f} ms/frame")

# --- 4. full async loop, pipeline depth sweep
for pd in (1, 2, 4, 8):
    futs = deque()
    t0 = time.perf_counter()
    for frgb, fdepth in frames:
        futs.append(est.track_one_async(frgb, fdepth, K, iteration=2))
        if len(futs) > pd:
            futs.popleft().result()
    while futs:
        futs.popleft().result()
    dt = time.perf_counter() - t0
    print(f"pipeline depth {pd}: {20/dt:.1f} FPS ({dt/20*1000:.1f} ms/frame)")

# --- 5. copy_to_host_async: does it make the later fetch free?
outs2 = []
p = est.pose_last
for i in range(20):
    p = track_graph(est.refiner_params, est.cfg, est.mesh_tensors,
                    p, dev_K, dev_rgb, dev_depth, dia, iterations=2)
    p.copy_to_host_async()
    outs2.append(p)
jax.block_until_ready(outs2)
time.sleep(0.3)
t0 = time.perf_counter()
for o in outs2:
    np.asarray(o)
print(f"fetch after copy_to_host_async: {(time.perf_counter()-t0)/20*1000:.2f} ms/frame")

# --- 6. full async loop with copy_to_host_async inside track_one_async
import foundationpose_tpu.pipeline.estimator as _em
_orig = _em.FoundationPose.track_one_async
def _async2(self, rgb, depth, K, iteration=2):
    r = _orig(self, rgb, depth, K, iteration)
    r._pose_dev.copy_to_host_async()
    return r
_em.FoundationPose.track_one_async = _async2
for pd in (2, 4, 8):
    futs = deque()
    t0 = time.perf_counter()
    for frgb, fdepth in frames:
        futs.append(est.track_one_async(frgb, fdepth, K, iteration=2))
        if len(futs) > pd:
            futs.popleft().result()
    while futs:
        futs.popleft().result()
    dt = time.perf_counter() - t0
    print(f"[c2ha] pipeline depth {pd}: {20/dt:.1f} FPS ({dt/20*1000:.1f} ms/frame)")

# --- 7. where does the time go? no-fetch loop with fresh H2D per frame
t_async = 0.0
futs = []
t0 = time.perf_counter()
for frgb, fdepth in frames:
    ta = time.perf_counter()
    futs.append(est.track_one_async(frgb, fdepth, K, iteration=2))
    t_async += time.perf_counter() - ta
jax.block_until_ready([f._pose_dev for f in futs])
dt = time.perf_counter() - t0
print(f"no-fetch loop: {20/dt:.1f} FPS ({dt/20*1000:.1f} ms/frame); "
      f"host time in track_one_async: {t_async/20*1000:.1f} ms/frame")
for f in futs:
    f.result()

# --- 8. same but pre-transferred device inputs (isolate H2D)
dev_frames = [(jnp.asarray(a), jnp.asarray(b)) for a, b in frames]
jax.block_until_ready(dev_frames)
futs = []
t0 = time.perf_counter()
for da, db in dev_frames:
    futs.append(est.track_one_async(da, db, K, iteration=2))
jax.block_until_ready([f._pose_dev for f in futs])
dt = time.perf_counter() - t0
print(f"no-fetch loop, device inputs: {20/dt:.1f} FPS ({dt/20*1000:.1f} ms/frame)")

# --- 9. break down track_one_async host time
from foundationpose_tpu.pipeline.graph import track_graph as tg
t_rgb = t_dep = t_k = t_disp2 = 0.0
p = est.pose_last
for frgb, fdepth in frames:
    ta = time.perf_counter(); da = jnp.asarray(frgb); t_rgb += time.perf_counter()-ta
    ta = time.perf_counter(); db = jnp.asarray(fdepth); t_dep += time.perf_counter()-ta
    ta = time.perf_counter(); dk = jnp.asarray(K, jnp.float32); dd = jnp.float32(est.diameter); t_k += time.perf_counter()-ta
    ta = time.perf_counter()
    p = tg(est.refiner_params, est.cfg, est.mesh_tensors, p, dk, da, db, dd, iterations=2)
    t_disp2 += time.perf_counter()-ta
jax.block_until_ready(p)
print(f"asarray(rgb): {t_rgb/20*1000:.1f}  asarray(depth): {t_dep/20*1000:.1f}  "
      f"K/diam: {t_k/20*1000:.1f}  dispatch: {t_disp2/20*1000:.1f} ms/frame")

# --- 10. single packed H2D (rgb u8 + depth-as-mm u16 -> one (H,W,5) u8 buffer)
packed = []
for frgb, fdepth in frames:
    mm = (fdepth * 1000.0).astype(np.uint16)
    buf = np.concatenate([frgb, mm.view(np.uint8).reshape(H, W, 2)], axis=-1)
    packed.append(np.ascontiguousarray(buf))
t0 = time.perf_counter()
devs3 = [jnp.asarray(b) for b in packed]
t_enq3 = time.perf_counter() - t0
jax.block_until_ready(devs3)
t_done3 = time.perf_counter() - t0
print(f"packed (H,W,5)u8 H2D: enqueue {t_enq3/20*1000:.1f} ms/frame, complete {t_done3/20*1000:.1f} ms/frame")
