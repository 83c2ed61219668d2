"""Quick TPU probe: end-to-end tracking FPS with the packed single-buffer
upload vs the unpacked 3-transfer path, plus measured tunnel RTT.

Run on the real chip (no JAX_PLATFORMS override).
"""
import dataclasses
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
from foundationpose_tpu.pipeline import (
    EstimatorCfg, ScorerCfg, FoundationPose, RasterCfg, RefinerCfg,
)
from foundationpose_tpu.models.networks import init_refine_net, init_score_net

print("backend:", jax.default_backend(), jax.devices())

# Tunnel RTT: median of 20 trivial 1-element fetches.
one = jnp.zeros(())
jax.block_until_ready(one)
rtts = []
for _ in range(20):
    t0 = time.perf_counter()
    float(jnp.asarray(one) + 1.0)
    rtts.append(time.perf_counter() - t0)
rtt_ms = float(np.median(rtts)) * 1000
print(f"tunnel RTT (1-elt fetch): median {rtt_ms:.1f} ms")

# H2D bandwidth: time a 1 MB upload.
buf = np.ones(1 << 20, np.uint8)
jax.block_until_ready(jnp.asarray(buf))
ts = []
for _ in range(10):
    b2 = buf.copy()
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(b2))
    ts.append(time.perf_counter() - t0)
h2d_ms = float(np.median(ts)) * 1000
print(f"H2D 1MB: median {h2d_ms:.1f} ms ({1.0/ (h2d_ms/1000) :.0f} MB/s)")

verts, faces = icosphere(4, radius=0.1)
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
frames = [(np.ascontiguousarray(rgb), np.ascontiguousarray(depth))
          for _ in range(40)]

for pack in (True, False):
    cfg = EstimatorCfg(
        refiner=RefinerCfg(raster=raster),
        scorer=ScorerCfg(mode="network", raster=raster),
        track_pack=pack,
    )
    est = FoundationPose(
        mesh=mesh, cfg=cfg,
        refiner_params=init_refine_net(jax.random.PRNGKey(0), cfg.refiner.net),
        scorer_params=init_score_net(jax.random.PRNGKey(1), cfg.scorer.net))
    est.register(K, rgb, depth, mask, iteration=5)
    est.track_one(rgb, depth, K, iteration=2)  # warmup/compile
    for pd in (3, 6):
        futs = deque()
        disp_ms = []
        fetch_ms = []
        t0 = time.perf_counter()
        for frgb, fdepth in frames:
            ta = time.perf_counter()
            futs.append(est.track_one_async(frgb, fdepth, K, iteration=2))
            disp_ms.append(time.perf_counter() - ta)
            if len(futs) > pd:
                ta = time.perf_counter()
                futs.popleft().result()
                fetch_ms.append(time.perf_counter() - ta)
        while futs:
            ta = time.perf_counter()
            futs.popleft().result()
            fetch_ms.append(time.perf_counter() - ta)
        dt = time.perf_counter() - t0
        print(f"pack={pack} depth={pd}: {len(frames)/dt:.1f} FPS "
              f"({dt/len(frames)*1000:.1f} ms/f; dispatch med "
              f"{np.median(disp_ms)*1000:.1f} ms, fetch med "
              f"{np.median(fetch_ms)*1000:.1f} ms) stats={est.track_stats}")
