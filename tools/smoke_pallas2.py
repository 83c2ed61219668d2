"""Quick parity smoke test: pallas2 rasterizer vs brute, CPU interpret."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from foundationpose_tpu.geometry.icosphere import icosphere
from foundationpose_tpu.ops import render_mesh


def main():
    verts, faces = icosphere(2, radius=0.1)
    rng = np.random.default_rng(0)
    colors = rng.integers(30, 255, size=(len(verts), 3)).astype(np.float32) / 255.0
    nrm = verts / np.linalg.norm(verts, axis=-1, keepdims=True)

    K = jnp.asarray(
        np.array([[120.0, 0, 32.0], [0, 120.0, 32.0], [0, 0, 1.0]], np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[:, 2, 3] = 0.5
    poses[1, 0, 3] = 0.03
    poses[2, :3, :3] = np.array(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)

    common = dict(
        out_hw=(64, 64),
        vertex_color=jnp.asarray(colors),
        vnormals=jnp.asarray(nrm.astype(np.float32)),
        use_light=True,
        get_normal=True,
        tile=32,
        max_faces_per_tile=256,
    )
    a = render_mesh(jnp.asarray(verts.astype(np.float32)),
                    jnp.asarray(faces.astype(np.int32)),
                    jnp.asarray(poses), K, method="brute", **common)
    b = render_mesh(jnp.asarray(verts.astype(np.float32)),
                    jnp.asarray(faces.astype(np.int32)),
                    jnp.asarray(poses), K, method="pallas", **common)
    for name in ("color", "xyz", "normal"):
        va, vb = getattr(a, name), getattr(b, name)
        d = float(jnp.max(jnp.abs(va - vb)))
        print(f"{name}: max abs diff = {d:.2e}")
        assert d < 1e-4, name
    dm = int(jnp.sum(a.mask != b.mask))
    print(f"mask: {dm} differing pixels of {a.mask.size}")
    assert dm == 0
    print("PARITY OK")


if __name__ == "__main__":
    main()
