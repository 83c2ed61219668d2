"""Fully-fused register/track graphs — one dispatch per frame.

The estimator's per-frame work (depth filtering, XYZ map, translation
guess, hypothesis refinement, scoring, ranking) compiles into a single
XLA executable. This matters doubly on TPU: besides kernel-launch
overhead, the chip may sit behind a network tunnel where every dispatch
pays round-trip latency — the reference's stage-by-stage structure
(estimater.py:159-240 with host hops between stages) would be crippled
by it.

The translation guess (mask-bbox center ray x masked median depth,
estimater.py:137-156) is computed on device with a sort-based masked
median, eliminating the reference's numpy round trip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import jax_config  # noqa: F401
from ..geometry.projection import depth_to_xyz_map
from ..ops.depth_filters import bilateral_filter_depth, erode_depth
from .config import EstimatorCfg
from .mesh_tensors import MeshTensors
from .refiner import refine_poses
from .scorer import score_poses


def device_guess_translation(depth: jax.Array, mask: jax.Array, K: jax.Array):
    """Device-side translation guess. Returns (center (3,), n_valid)."""
    H, W = depth.shape
    m = mask > 0
    valid = m & (depth >= 0.001)

    col_any = jnp.any(m, axis=0)
    row_any = jnp.any(m, axis=1)
    ui = jnp.arange(W, dtype=jnp.float32)
    vi = jnp.arange(H, dtype=jnp.float32)
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(col_any, ui, big))
    umax = jnp.max(jnp.where(col_any, ui, -big))
    vmin = jnp.min(jnp.where(row_any, vi, big))
    vmax = jnp.max(jnp.where(row_any, vi, -big))
    uc = (umin + umax) / 2.0
    vc = (vmin + vmax) / 2.0

    # Masked median via a two-pass counting bisection: each pass
    # narrows the value range 256x with one (pixels x 256)
    # compare-and-reduce, resolving the order statistic to range/65536
    # (< 0.1 mm on any real scene) — ~10 ms cheaper than jnp.sort of
    # the full frame on a v5e, and exactly as deterministic.
    vals = depth.reshape(-1)
    vmask = valid.reshape(-1)
    n = jnp.sum(vmask).astype(jnp.int32)
    vmin = jnp.min(jnp.where(vmask, vals, jnp.inf))
    vmax = jnp.max(jnp.where(vmask, vals, -jnp.inf))

    def kth(k):
        def refine(carry, _):
            lo, hi = carry
            t = lo + (hi - lo) * (
                jnp.arange(1, 257, dtype=jnp.float32) / 256.0
            )  # (256,) upper edges
            cnt = jnp.sum(
                vmask[:, None] & (vals[:, None] <= t[None]), axis=0
            )  # (256,) nondecreasing
            b = jnp.argmax(cnt > k).astype(jnp.int32)
            new_lo = jnp.where(b > 0, t[jnp.maximum(b - 1, 0)], lo)
            return (new_lo, t[b]), None

        (lo, hi), _ = jax.lax.scan(refine, (vmin, vmax), None, length=2)
        return hi

    k1 = jnp.maximum((n - 1) // 2, 0)
    k2 = jnp.maximum(n // 2, 0)
    zc = (kth(k1) + kth(k2)) / 2.0
    # All-invalid mask: vmin/vmax are +/-inf and the bisection yields
    # NaN — pin zc to 0 before it feeds uc/vc math so no NaN is ever
    # materialized (the final where() would mask the output, but not
    # e.g. NaN-sensitive downstream reductions under --debug_nans).
    zc = jnp.where(n > 0, zc, 0.0)

    x = (uc - K[0, 2]) / K[0, 0] * zc
    y = (vc - K[1, 2]) / K[1, 1] * zc
    center = jnp.stack([x, y, zc])
    return jnp.where(n > 0, center, jnp.zeros(3)), n


def _register_body(
    refiner_params,
    scorer_params,
    cfg: EstimatorCfg,
    mesh: MeshTensors,
    rot_grid: jax.Array,  # (N, 4, 4)
    hyp_valid: jax.Array,  # (N,)
    K: jax.Array,
    rgb: jax.Array,  # (H, W, 3) f32 [0, 1]
    depth_raw: jax.Array,  # (H, W) f32 meters
    mask: jax.Array,  # (H, W) any numeric/bool
    mesh_diameter: jax.Array,
    iterations: int,
):
    """Full registration in ONE compiled graph.

    Returns (order, refined_sorted, scores_sorted, center, n_valid)."""
    depth = bilateral_filter_depth(erode_depth(depth_raw, radius=2), radius=2)
    xyz_map = depth_to_xyz_map(depth, K, zfar=cfg.zfar)
    center, n_valid = device_guess_translation(depth, mask, K)

    poses = rot_grid.at[:, :3, 3].set(center[None])

    n_hyp = rot_grid.shape[0]
    prune = (
        cfg.prune_after_iter is not None
        and iterations > cfg.prune_after_iter
        and cfg.prune_keep < n_hyp
    )
    if prune:
        # Hypothesis funneling (cfg.prune_after_iter): refine everything
        # a few iterations, drop the hopeless orientations by the
        # weights-free depth score, spend the remaining iterations + the
        # network scorer on the survivors only. Survivor scores are
        # offset so every survivor outranks every pruned hypothesis in
        # the returned order; pruned rows keep their early-refined poses
        # and rank by depth score among themselves.
        import dataclasses as _dc

        refined1 = refine_poses(
            refiner_params, cfg.refiner, mesh, poses, K, rgb, xyz_map,
            mesh_diameter, iterations=cfg.prune_after_iter,
        )
        depth_cfg = _dc.replace(cfg.scorer, mode="depth")
        pre = score_poses(
            scorer_params, depth_cfg, mesh, refined1, K, rgb, xyz_map,
            mesh_diameter, valid=hyp_valid,
        )
        _, keep_idx = jax.lax.top_k(pre, cfg.prune_keep)
        sub_refined = refine_poses(
            refiner_params, cfg.refiner, mesh, refined1[keep_idx], K, rgb,
            xyz_map, mesh_diameter,
            iterations=iterations - cfg.prune_after_iter,
        )
        sub_scores = score_poses(
            scorer_params, cfg.scorer, mesh, sub_refined, K, rgb, xyz_map,
            mesh_diameter, valid=hyp_valid[keep_idx],
        )
        refined = refined1.at[keep_idx].set(sub_refined)
        # Reported scores: survivors offset so callers see them above
        # every pruned row (+1e5 quantizes f32 logits to ~0.008 steps —
        # fine for REPORTING, monotone under rounding). The ORDER is
        # computed exactly below, never through the offset values, so
        # near-tied survivors rank exactly as the network scored them.
        scores = pre.at[keep_idx].set(sub_scores + 1e5)
        surv_order_local = jnp.argsort(
            -jnp.where(hyp_valid[keep_idx], sub_scores, -jnp.inf)
        )
        surv_ids = keep_idx[surv_order_local]
        # Non-survivors: valid rows by depth score desc, then invalid.
        # Invalid rows get a most-negative FINITE key so they still sort
        # above the -inf-masked survivor rows — the first N-keep entries
        # are then exactly the non-survivors.
        rest_key = jnp.where(hyp_valid, pre, jnp.float32(-3e38))
        rest_key = rest_key.at[keep_idx].set(-jnp.inf)
        rest_ids = jnp.argsort(-rest_key)[: n_hyp - cfg.prune_keep]
        order = jnp.concatenate([surv_ids, rest_ids])
    else:
        refined = refine_poses(
            refiner_params, cfg.refiner, mesh, poses, K, rgb, xyz_map,
            mesh_diameter, iterations=iterations,
        )
        scores = score_poses(
            scorer_params, cfg.scorer, mesh, refined, K, rgb, xyz_map,
            mesh_diameter, valid=hyp_valid,
        )
        order = jnp.argsort(-scores)
    return order, refined[order], scores[order], center, n_valid


@functools.partial(jax.jit, static_argnames=("cfg", "iterations"))
def register_graph(
    refiner_params,
    scorer_params,
    cfg: EstimatorCfg,
    mesh: MeshTensors,
    rot_grid: jax.Array,  # (N, 4, 4)
    hyp_valid: jax.Array,  # (N,)
    K: jax.Array,
    rgb_u8: jax.Array,  # (H, W, 3) uint8
    depth_raw: jax.Array,  # (H, W) f32 meters
    mask: jax.Array,  # (H, W) any numeric/bool
    mesh_diameter: jax.Array,
    iterations: int,
):
    """Unpacked-upload registration graph (see _register_body)."""
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    return _register_body(
        refiner_params, scorer_params, cfg, mesh, rot_grid, hyp_valid, K,
        rgb, depth_raw, mask, mesh_diameter, iterations,
    )


REGISTER_PACK_FOOTER = 8  # (x0, y0) window offset as 2 u16 LE + padding


def pack_register_frame(rgb_u8, depth_f32, mask, x0: int = 0, y0: int = 0) -> "np.ndarray":
    """Host-side: pack a register frame's rgb + depth + mask into ONE
    flat uint8 buffer — rgb u8 (3 B/px) + depth as u16 0.25 mm fixed
    point (2 B/px, same quantum as the tracking wire format) + the mask
    as a BIT PLANE (1 b/px) + an 8-byte (x0, y0) window-offset footer.
    One host->device transfer instead of three and ~64% of the bytes
    (2.46 -> 1.57 MB at 640x480): the r4 profile pinned register's
    wall-minus-device gap at ~45-60 ms of host/tunnel upload while
    tracking already had a packed format (pack_track_frame); this
    closes that asymmetry. With (x0, y0) set, the images are a window
    of the full frame and the graph shifts K's principal point exactly
    like the tracking ROI path — estimator._register_roi_window ships
    only a detection-sized window (~0.5 MB typical) instead of the
    frame."""
    import numpy as np

    H, W = depth_f32.shape
    n_px = H * W
    assert n_px % 8 == 0, "frame pixel count must be a multiple of 8"
    n_img = n_px * 5
    buf = np.empty(n_img + n_px // 8 + REGISTER_PACK_FOOTER, np.uint8)
    img = buf[:n_img].reshape(H, W, 5)
    img[..., :3] = rgb_u8
    mm = np.clip(
        np.nan_to_num(depth_f32) * DEPTH_PACK_SCALE + 0.5, 0, 65535
    ).astype(np.uint16)
    # byte-split without .view(): device-fetched frames can arrive
    # F-contiguous (axon zero-copy), where a dtype view is invalid
    img[..., 3] = (mm & 0xFF).astype(np.uint8)
    img[..., 4] = (mm >> 8).astype(np.uint8)
    buf[n_img:-REGISTER_PACK_FOOTER] = np.packbits(
        np.asarray(mask).reshape(-1) != 0, bitorder="little"
    )
    buf[-REGISTER_PACK_FOOTER:] = [
        x0 & 255, x0 >> 8, y0 & 255, y0 >> 8, 0, 0, 0, 0,
    ]
    return buf


def unpack_register_frame(buf: jax.Array, hw: tuple[int, int]):
    """Device-side inverse of pack_register_frame: (rgb [0,1] f32,
    depth f32 meters, mask uint8 0/1, x0, y0). Tested directly against
    host inputs in tests/test_pipeline.py."""
    H, W = hw
    n_px = H * W
    n_img = n_px * 5
    img = buf[:n_img].reshape(H, W, 5)
    rgb = img[..., :3].astype(jnp.float32) / 255.0
    lo = img[..., 3].astype(jnp.uint16)
    hi = img[..., 4].astype(jnp.uint16)
    depth_raw = (lo + hi * jnp.uint16(256)).astype(jnp.float32) * (
        1.0 / DEPTH_PACK_SCALE
    )
    bits = buf[n_img:-REGISTER_PACK_FOOTER]  # LE bit plane (np.packbits)
    mask = (
        (bits[:, None] >> jnp.arange(8, dtype=jnp.uint8)[None]) & 1
    ).reshape(H, W)
    foot = buf[-REGISTER_PACK_FOOTER:].astype(jnp.float32)
    x0 = foot[0] + foot[1] * 256.0
    y0 = foot[2] + foot[3] * 256.0
    return rgb, depth_raw, mask, x0, y0


@functools.partial(jax.jit, static_argnames=("cfg", "hw", "iterations"))
def register_graph_packed(
    refiner_params,
    scorer_params,
    cfg: EstimatorCfg,
    mesh: MeshTensors,
    rot_grid: jax.Array,
    hyp_valid: jax.Array,
    K: jax.Array,
    buf: jax.Array,  # flat uint8 from pack_register_frame
    mesh_diameter: jax.Array,
    hw: tuple[int, int],
    iterations: int,
):
    """Packed-upload registration: unpack rgb/depth/mask on device, then
    the same _register_body as the unpacked graph (roundtrip-tested in
    tests/test_pipeline.py). Depth quantization is <= 0.125 mm — an
    order of magnitude under sensor noise and 16x under the 2 mm
    accuracy gates. A nonzero packed (x0, y0) means the images are a
    window of the full frame: shifting K's principal point by it is the
    exact viewport reparameterization the tracking ROI path uses."""
    rgb, depth_raw, mask, x0, y0 = unpack_register_frame(buf, hw)
    K = K.at[0, 2].add(-x0).at[1, 2].add(-y0)
    return _register_body(
        refiner_params, scorer_params, cfg, mesh, rot_grid, hyp_valid, K,
        rgb, depth_raw, mask, mesh_diameter, iterations,
    )


def _track_body(refiner_params, cfg, mesh, pose_last, K, rgb, depth_raw,
                mesh_diameter, iterations):
    depth = bilateral_filter_depth(erode_depth(depth_raw, radius=2), radius=2)
    xyz_map = depth_to_xyz_map(depth, K, zfar=cfg.zfar)
    refined = refine_poses(
        refiner_params, cfg.refiner, mesh, pose_last[None], K, rgb, xyz_map,
        mesh_diameter, iterations=iterations,
    )
    return refined[0]


@functools.partial(jax.jit, static_argnames=("cfg", "iterations"))
def track_graph(
    refiner_params,
    cfg: EstimatorCfg,
    mesh: MeshTensors,
    pose_last: jax.Array,  # (4, 4)
    K: jax.Array,
    rgb_u8: jax.Array,
    depth_raw: jax.Array,
    mesh_diameter: jax.Array,
    iterations: int,
):
    """Per-frame tracking in ONE compiled graph; returns the new pose."""
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    return _track_body(
        refiner_params, cfg, mesh, pose_last, K, rgb, depth_raw,
        mesh_diameter, iterations,
    )


# Fixed-point depth quantum for the packed tracking upload: 0.25 mm steps
# (u16 -> 16.38 m range). Quantization error <= 0.125 mm, an order of
# magnitude under depth-sensor noise and 16x under the 2 mm accuracy gate;
# real RGB-D sensors deliver u16 millimeters natively, so the wire format
# is LESS quantized than the data it usually carries.
DEPTH_PACK_SCALE = 4000.0
TRACK_PACK_FOOTER = 8  # x0_lo, x0_hi, y0_lo, y0_hi + 4 spare bytes


def pack_track_frame(rgb_u8, depth_f32, x0: int, y0: int):
    """Host-side: pack an rgb window + depth window + ROI offset into ONE
    flat uint8 buffer so each tracking frame costs a single host->device
    transfer (per-transfer latency dominates on a tunneled chip, and f32
    depth is twice the bytes of u16 0.25 mm fixed point)."""
    import numpy as np

    H, W = depth_f32.shape
    n_img = H * W * 5
    buf = np.empty(n_img + TRACK_PACK_FOOTER, np.uint8)
    img = buf[:n_img].reshape(H, W, 5)
    img[..., :3] = rgb_u8
    # NaN depth (some sensors emit it for invalid pixels) -> 0 = invalid,
    # matching how the unpacked path's depth filters treat it; np.clip
    # passes NaN through and NaN->uint16 is undefined.
    mm = np.clip(
        np.nan_to_num(depth_f32) * DEPTH_PACK_SCALE + 0.5, 0, 65535
    ).astype(np.uint16)
    # byte-split without .view(): device-fetched frames can arrive
    # F-contiguous (axon zero-copy), where a dtype view is invalid
    img[..., 3] = (mm & 0xFF).astype(np.uint8)
    img[..., 4] = (mm >> 8).astype(np.uint8)
    buf[n_img:] = [x0 & 255, x0 >> 8, y0 & 255, y0 >> 8, 0, 0, 0, 0]
    return buf


def unpack_track_frame(buf: jax.Array, hw: tuple[int, int]):
    """Device-side inverse of pack_track_frame: (rgb [0,1] f32, depth
    f32 meters, x0, y0). Tested directly against host inputs in
    tests/test_pipeline.py (the e2e pose comparison alone could not
    catch a broken dequantization — ADVICE r4)."""
    H, W = hw
    n_img = H * W * 5
    img = buf[:n_img].reshape(H, W, 5)
    rgb = img[..., :3].astype(jnp.float32) / 255.0
    lo = img[..., 3].astype(jnp.uint16)
    hi = img[..., 4].astype(jnp.uint16)
    depth_raw = (lo + hi * jnp.uint16(256)).astype(jnp.float32) * (
        1.0 / DEPTH_PACK_SCALE
    )
    foot = buf[n_img:].astype(jnp.float32)
    x0 = foot[0] + foot[1] * 256.0
    y0 = foot[2] + foot[3] * 256.0
    return rgb, depth_raw, x0, y0


def _track_packed_body(
    refiner_params, cfg, mesh, pose_last, K_full, buf, mesh_diameter,
    hw, iterations,
):
    """Shared body of track_graph_packed / track_chain_graph: unpack one
    pack_track_frame buffer on device and run the tracking step."""
    rgb, depth_raw, x0, y0 = unpack_track_frame(buf, hw)
    K = K_full.at[0, 2].add(-x0).at[1, 2].add(-y0)
    return _track_body(
        refiner_params, cfg, mesh, pose_last, K, rgb, depth_raw,
        mesh_diameter, iterations,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "hw", "iterations"))
def track_graph_packed(
    refiner_params,
    cfg: EstimatorCfg,
    mesh: MeshTensors,
    pose_last: jax.Array,  # (4, 4)
    K_full: jax.Array,  # (3, 3) device-resident full-frame intrinsics
    buf: jax.Array,  # flat uint8 from pack_track_frame
    mesh_diameter: jax.Array,
    hw: tuple[int, int],
    iterations: int,
):
    """Packed-upload variant of track_graph: unpacks rgb/depth/ROI offset
    on device and shifts K's principal point by the window offset (the
    exact viewport reparameterization of estimator._track_roi_window)."""
    return _track_packed_body(
        refiner_params, cfg, mesh, pose_last, K_full, buf, mesh_diameter,
        hw, iterations,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "hw", "iterations"))
def track_chain_graph(
    refiner_params,
    cfg: EstimatorCfg,
    mesh: MeshTensors,
    pose0: jax.Array,  # (4, 4) chain start
    K_full: jax.Array,  # (3, 3)
    bufs: jax.Array,  # (k, n_bytes) uint8 — k pack_track_frame buffers
    mesh_diameter: jax.Array,
    hw: tuple[int, int],
    iterations: int,
):
    """k sequential tracking steps chained ON DEVICE via lax.scan over k
    pre-staged packed frames; returns the (k, 4, 4) pose trajectory.

    Two uses: (a) a load-robust chip-capability measurement — one
    dispatch + one fetch covers k frames, so host scheduling and tunnel
    RTT cannot leak into the per-frame number (bench.py
    tracking_fps_device_chain); (b) batch tracking of pre-captured
    frame runs. Each step is bit-identical to track_graph_packed: the
    scan body is the same _track_packed_body the per-frame graph calls.
    """

    def step(pose, buf):
        new = _track_packed_body(
            refiner_params, cfg, mesh, pose, K_full, buf, mesh_diameter,
            hw, iterations,
        )
        return new, new

    _, poses = jax.lax.scan(step, pose0, bufs)
    return poses
