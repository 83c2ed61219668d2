"""Neural object field model: SH direction encoding, NeRFSmall MLP,
per-frame feature/pose corrections (pure JAX param pytrees).

Replaces bundlesdf/nerf_helpers.py:25-64 (FeatureArray/PoseArray),
68-151 (SHEncoder), 277-355 (NeRFSmall). The MLP is tiny (2-layer SDF
head, 3-layer color head, width 64) — it runs in bf16 on the MXU with
f32 params, the JAX analogue of the reference's AMP autocast.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401
from ..geometry.rotations import hat, so3_exp_map

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396]
_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435]


def sh_encode(dirs: jax.Array, degree: int = 3) -> jax.Array:
    """Real spherical harmonics up to `degree` (<=4): (..., 3) -> (..., deg^2).

    Coefficient-exact with nerf_helpers.py:68-151.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    return jnp.stack(out, axis=-1)


def se3_exp(trans: jax.Array, log_rot: jax.Array) -> jax.Array:
    """SE(3) exponential: (..., 3) translation tangent + (..., 3) rotation
    tangent -> (..., 4, 4). Matches pytorch3d.se3_exp_map composed with the
    transpose applied by PoseArray (nerf_helpers.py:60)."""
    R = so3_exp_map(log_rot)
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    small = theta2 < 1e-8
    # Double-where against the sqrt-at-zero gradient NaN (pose params
    # initialize to exactly zero).
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / theta2_safe)
    B = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (safe * theta2_safe)
    )
    K = hat(log_rot)
    V = (
        jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
        + A[..., None, None] * K
        + B[..., None, None] * (K @ K)
    )
    t = (V @ trans[..., None])[..., 0]
    out = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), (*R.shape[:-2], 4, 4))
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    return out


def pose_array_matrices(data: jax.Array, max_trans: float, max_rot_deg: float) -> jax.Array:
    """(F, 6) raw params -> (F, 4, 4) per-frame correction transforms.

    PoseArray semantics (nerf_helpers.py:44-64): tanh-bounded trans/rot,
    frame 0 pinned to identity.
    """
    theta = jnp.tanh(data)
    trans = theta[:, :3] * max_trans
    rot = theta[:, 3:6] * max_rot_deg / 180.0 * jnp.pi
    Ts = se3_exp(trans, rot)
    eye = jnp.eye(4, dtype=Ts.dtype)
    return Ts.at[0].set(eye)


# ------------------------------------------------------------- NeRFSmall


def init_nerf_mlp(key, input_ch: int, input_ch_views: int,
                  hidden: int = 64, geo_feat: int = 15):
    """2-layer sigma net + 3-layer color net (nerf_runner.py:223)."""

    def lin(k, i, o):
        k1, k2 = jax.random.split(k)
        bound = math.sqrt(1.0 / i)
        return {
            "kernel": jax.random.uniform(k1, (i, o), jnp.float32, -bound * math.sqrt(3), bound * math.sqrt(3)),
            "bias": jax.random.uniform(k2, (o,), jnp.float32, -bound, bound),
        }

    ks = jax.random.split(key, 5)
    params = {
        "sigma": [lin(ks[0], input_ch, hidden), lin(ks[1], hidden, 1 + geo_feat)],
        "color": [
            lin(ks[2], input_ch_views + geo_feat, hidden),
            lin(ks[3], hidden, hidden),
            lin(ks[4], hidden, 3),
        ],
    }
    # Encourage positive initial SDF (nerf_helpers.py:299).
    params["sigma"][-1]["bias"] = params["sigma"][-1]["bias"].at[0].set(0.1)
    return params


def apply_nerf_mlp(params, embedded_pts, embedded_views, dtype=jnp.float32):
    """-> (..., 4): rgb logits (3) + sdf (1)."""

    def lin(p, x):
        return (
            jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + p["bias"]
        ).astype(dtype)

    h = embedded_pts.astype(dtype)
    h = jax.nn.relu(lin(params["sigma"][0], h))
    h = lin(params["sigma"][1], h)
    sdf = h[..., 0:1].astype(jnp.float32)
    geo = h[..., 1:]
    c = jnp.concatenate([embedded_views.astype(dtype), geo], axis=-1)
    c = jax.nn.relu(lin(params["color"][0], c))
    c = jax.nn.relu(lin(params["color"][1], c))
    rgb = lin(params["color"][2], c).astype(jnp.float32)
    return jnp.concatenate([rgb, sdf], axis=-1)


def apply_nerf_sdf(params, embedded_pts, dtype=jnp.float32):
    """SDF-only query for mesh extraction (nerf_helpers.py:334-340)."""

    def lin(p, x):
        return (
            jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + p["bias"]
        ).astype(dtype)

    h = embedded_pts.astype(dtype)
    h = jax.nn.relu(lin(params["sigma"][0], h))
    h = lin(params["sigma"][1], h)
    return h[..., 0].astype(jnp.float32)
