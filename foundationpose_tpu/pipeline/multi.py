"""Batched multi-object tracking — every tracked object in ONE dispatch.

The reference tracks multiple objects by instantiating one estimator per
object (estimater.py:18; its demos construct a fresh FoundationPose per
mesh), so each frame pays per object: a separate dispatch chain, its own
host<->device hops, and a redundant copy of the shared frame
preprocessing. On a TPU behind an RPC tunnel every dispatch costs a full
round trip, so that structure multiplies latency by the object count.

:class:`MultiTracker` is the TPU-first redesign: the tracking steps of M
objects fuse into one jitted graph per frame.

* Frame preprocessing (depth erode + bilateral filter, XYZ map) runs
  ONCE per frame, not once per object.
* Each object renders its own mesh into its 160x160 crop — meshes of
  different sizes stay separate static tensors, no cross-object padding
  and no change to the rasterizer.
* All M (render, observation) crop pairs run the RefineNet as a single
  batched forward, riding the MXU's batch dimension instead of M tiny
  launches; pose deltas apply batched with per-object diameters.
* One dispatch and one result fetch per frame for ALL objects; the
  per-object pose chain stays on device between frames exactly like
  :meth:`FoundationPose.track_one_async`.

Poses match running M independent single-object trackers (full-frame
mode) — see tests/test_multi.py.
"""
from __future__ import annotations

import functools
import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import jax_config  # noqa: F401
from ..geometry.projection import depth_to_xyz_map
from ..meshio import TriMesh, compute_mesh_diameter
from ..models.networks import init_refine_net
from ..ops.depth_filters import bilateral_filter_depth, erode_depth
from .config import EstimatorCfg
from .crops import make_crop_inputs
from .estimator import FoundationPose, prepare_render_mesh, roi_contains_pose
from .mesh_tensors import MeshTensors, make_mesh_tensors
from .refiner import apply_pose_delta

logger = logging.getLogger(__name__)


def _multi_body(refiner_params, cfg, meshes, poses, K, rgb, depth_raw,
                diameters, iterations):
    """Shared full-frame M-object tracking body (rgb already f32 0..1)."""
    depth = bilateral_filter_depth(erode_depth(depth_raw, radius=2), radius=2)
    xyz_map = depth_to_xyz_map(depth, K, zfar=cfg.zfar)
    rcfg = cfg.refiner
    dtype = jnp.bfloat16 if rcfg.compute_dtype == "bfloat16" else jnp.float32

    def step(cur_poses, _):
        a_list, b_list, tf_list = [], [], []
        for m, mesh in enumerate(meshes):
            a, b, tf = make_crop_inputs(
                mesh,
                cur_poses[m : m + 1],
                K,
                rgb,
                xyz_map,
                diameters[m],
                input_res=rcfg.input_res,
                crop_ratio=rcfg.crop_ratio,
                normalize_xyz=rcfg.normalize_xyz,
                invalid_z=rcfg.xyz_invalid_z,
                use_normal=rcfg.use_normal,
                raster=rcfg.raster,
            )
            a_list.append(a)
            b_list.append(b)
            tf_list.append(tf)
        A = jnp.concatenate(a_list, axis=0)  # (M, res, res, c)
        B = jnp.concatenate(b_list, axis=0)
        tfs = jnp.concatenate(tf_list, axis=0)  # (M, 3, 3)
        from ..models.networks import apply_refine_net

        out = apply_refine_net(refiner_params, rcfg.net, A, B, dtype=dtype)
        new_poses = apply_pose_delta(
            cur_poses,
            out["trans"],
            out["rot"],
            rcfg,
            diameters[:, None],  # per-object: broadcasts against (M, 3)
            K=K,
            tf_to_crops=tfs,
        )
        return new_poses, None

    refined, _ = jax.lax.scan(
        step, poses.astype(jnp.float32), None, length=iterations
    )
    return refined


@functools.partial(jax.jit, static_argnames=("cfg", "iterations"))
def multi_track_graph(
    refiner_params,
    cfg: EstimatorCfg,
    meshes: tuple[MeshTensors, ...],  # static length M, per-object shapes
    poses: jax.Array,  # (M, 4, 4) centered-object-in-camera
    K: jax.Array,  # (3, 3)
    rgb_u8: jax.Array,  # (H, W, 3) uint8
    depth_raw: jax.Array,  # (H, W) f32 meters
    diameters: jax.Array,  # (M,) f32
    iterations: int,
):
    """One frame of tracking for all M objects in ONE compiled graph.

    Returns the refined (M, 4, 4) poses. The per-iteration structure
    mirrors refiner.refine_poses (render -> crop -> network -> delta),
    but the render fans out over per-object meshes while the network
    forward and the delta application stay batched over M.
    """
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    return _multi_body(refiner_params, cfg, meshes, poses, K, rgb,
                       depth_raw, diameters, iterations)


@functools.partial(jax.jit, static_argnames=("cfg", "hw", "iterations"))
def multi_track_graph_packed(
    refiner_params,
    cfg: EstimatorCfg,
    meshes: tuple[MeshTensors, ...],
    poses: jax.Array,  # (M, 4, 4)
    K_full: jax.Array,  # (3, 3) device-resident intrinsics
    buf: jax.Array,  # flat uint8 from graph.pack_track_frame (offset 0,0)
    diameters: jax.Array,  # (M,)
    hw: tuple[int, int],
    iterations: int,
):
    """Full-frame multi-object tracking from ONE packed host upload —
    the same wire format as the single tracker's track_graph_packed
    (rgb u8 + depth as u16 0.25 mm fixed point in one flat buffer)."""
    from .graph import DEPTH_PACK_SCALE

    H, W = hw
    n_img = H * W * 5
    img = buf[:n_img].reshape(H, W, 5)
    rgb = img[..., :3].astype(jnp.float32) / 255.0
    lo = img[..., 3].astype(jnp.uint16)
    hi = img[..., 4].astype(jnp.uint16)
    depth_raw = (lo + hi * jnp.uint16(256)).astype(jnp.float32) * (
        1.0 / DEPTH_PACK_SCALE
    )
    return _multi_body(refiner_params, cfg, meshes, poses, K_full, rgb,
                       depth_raw, diameters, iterations)


def _multi_roi_body(refiner_params, cfg, meshes, poses, Ks, rgb, depth_w,
                    diameters, iterations):
    """Shared ROI M-object tracking body (rgb already f32 0..1; depth_w
    raw meters; Ks per-object principal-point-shifted)."""
    depth = jax.vmap(
        lambda d: bilateral_filter_depth(erode_depth(d, radius=2), radius=2)
    )(depth_w)
    xyz = jax.vmap(lambda d, k: depth_to_xyz_map(d, k, zfar=cfg.zfar))(depth, Ks)
    rcfg = cfg.refiner
    dtype = jnp.bfloat16 if rcfg.compute_dtype == "bfloat16" else jnp.float32

    def step(cur_poses, _):
        a_list, b_list, tf_list = [], [], []
        for m, mesh in enumerate(meshes):
            a, b, tf = make_crop_inputs(
                mesh,
                cur_poses[m : m + 1],
                Ks[m],
                rgb[m],
                xyz[m],
                diameters[m],
                input_res=rcfg.input_res,
                crop_ratio=rcfg.crop_ratio,
                normalize_xyz=rcfg.normalize_xyz,
                invalid_z=rcfg.xyz_invalid_z,
                use_normal=rcfg.use_normal,
                raster=rcfg.raster,
            )
            a_list.append(a)
            b_list.append(b)
            tf_list.append(tf)
        A = jnp.concatenate(a_list, axis=0)
        B = jnp.concatenate(b_list, axis=0)
        tfs = jnp.concatenate(tf_list, axis=0)
        from ..models.networks import apply_refine_net

        out = apply_refine_net(refiner_params, rcfg.net, A, B, dtype=dtype)
        if rcfg.trans_rep == "deepim":
            # deepim deltas read K — per-object here, so apply per object
            new_poses = jnp.concatenate([
                apply_pose_delta(
                    cur_poses[m : m + 1],
                    out["trans"][m : m + 1],
                    out["rot"][m : m + 1],
                    rcfg,
                    diameters[m],
                    K=Ks[m],
                    tf_to_crops=tfs[m : m + 1],
                )
                for m in range(len(meshes))
            ])
        else:
            new_poses = apply_pose_delta(
                cur_poses, out["trans"], out["rot"], rcfg, diameters[:, None]
            )
        return new_poses, None

    refined, _ = jax.lax.scan(
        step, poses.astype(jnp.float32), None, length=iterations
    )
    return refined


@functools.partial(jax.jit, static_argnames=("cfg", "iterations"))
def multi_track_roi_graph(
    refiner_params,
    cfg: EstimatorCfg,
    meshes: tuple[MeshTensors, ...],
    poses: jax.Array,  # (M, 4, 4)
    Ks: jax.Array,  # (M, 3, 3) per-object principal-point-shifted K
    rgb_w: jax.Array,  # (M, S, S, 3) uint8 per-object windows
    depth_w: jax.Array,  # (M, S, S) f32
    diameters: jax.Array,  # (M,)
    iterations: int,
):
    """ROI variant of :func:`multi_track_graph`: each object gets its own
    static-size window of the frame with K's principal point shifted by
    the window offset — the same exact reparameterization the
    single-object tracker streams (estimator.py:365-392), batched over
    objects. Frame prep vmaps over the M windows."""
    rgb = rgb_w.astype(jnp.float32) / 255.0
    return _multi_roi_body(refiner_params, cfg, meshes, poses, Ks, rgb,
                           depth_w, diameters, iterations)


def pack_multi_track_frame(rgb, depth, x0s, y0s, size: int):
    """Host-side: slice M static-size windows out of the frame and pack
    them (with their offsets) into ONE flat uint8 buffer — the M-object
    analogue of graph.pack_track_frame, so a whole multi-object frame
    costs a single host->device transfer."""
    from .graph import DEPTH_PACK_SCALE

    M = len(x0s)
    n_img = M * size * size * 5
    buf = np.empty(n_img + 4 * M, np.uint8)
    img = buf[:n_img].reshape(M, size, size, 5)
    for m, (x0, y0) in enumerate(zip(x0s, y0s)):
        img[m, ..., :3] = rgb[y0 : y0 + size, x0 : x0 + size]
        # nan_to_num: NaN depth -> 0 = invalid (see graph.pack_track_frame)
        mm = np.clip(
            np.nan_to_num(depth[y0 : y0 + size, x0 : x0 + size])
            * DEPTH_PACK_SCALE
            + 0.5,
            0,
            65535,
        ).astype(np.uint16)
        img[m, ..., 3:5] = mm.view(np.uint8).reshape(size, size, 2)
    foot = buf[n_img:].reshape(M, 4)
    x0a = np.asarray(x0s, np.int64)
    y0a = np.asarray(y0s, np.int64)
    foot[:, 0] = x0a & 255
    foot[:, 1] = x0a >> 8
    foot[:, 2] = y0a & 255
    foot[:, 3] = y0a >> 8
    return buf


@functools.partial(jax.jit, static_argnames=("cfg", "size", "iterations"))
def multi_track_roi_graph_packed(
    refiner_params,
    cfg: EstimatorCfg,
    meshes: tuple[MeshTensors, ...],
    poses: jax.Array,  # (M, 4, 4)
    K_full: jax.Array,  # (3, 3) device-resident full-frame intrinsics
    buf: jax.Array,  # flat uint8 from pack_multi_track_frame
    diameters: jax.Array,  # (M,)
    size: int,
    iterations: int,
):
    """Packed-upload ROI variant: unpack the M windows + offsets on
    device and shift each object's principal point — identical math to
    multi_track_roi_graph, one transfer instead of three."""
    from .graph import DEPTH_PACK_SCALE

    M = len(meshes)
    n_img = M * size * size * 5
    img = buf[:n_img].reshape(M, size, size, 5)
    rgb = img[..., :3].astype(jnp.float32) / 255.0
    lo = img[..., 3].astype(jnp.uint16)
    hi = img[..., 4].astype(jnp.uint16)
    depth_w = (lo + hi * jnp.uint16(256)).astype(jnp.float32) * (
        1.0 / DEPTH_PACK_SCALE
    )
    foot = buf[n_img:].reshape(M, 4).astype(jnp.float32)
    x0 = foot[:, 0] + foot[:, 1] * 256.0
    y0 = foot[:, 2] + foot[:, 3] * 256.0
    Ks = jnp.tile(K_full, (M, 1, 1))
    Ks = Ks.at[:, 0, 2].add(-x0).at[:, 1, 2].add(-y0)
    return _multi_roi_body(refiner_params, cfg, meshes, poses, Ks, rgb,
                           depth_w, diameters, iterations)


class MultiTrackResult:
    """Handle to an in-flight multi-object tracking dispatch.

    ``result()`` blocks until the (M, 4, 4) pose block is on host and
    returns it in each object's ORIGINAL (uncentered) mesh frame, i.e.
    row m equals what ``FoundationPose.track_one`` would return for
    object m.
    """

    __slots__ = ("_poses_dev", "_tfs", "_on_fetch", "_cached")

    def __init__(self, poses_dev: jax.Array, tfs: np.ndarray, on_fetch=None):
        self._poses_dev = poses_dev
        self._tfs = tfs  # (M, 4, 4) per-object centered-mesh transforms
        self._on_fetch = on_fetch
        self._cached = None

    def result(self) -> np.ndarray:
        if self._cached is None:
            raw = np.asarray(self._poses_dev, dtype=np.float64)
            if self._on_fetch is not None:
                # on_fetch may return a corrected pose block (the
                # ROI-containment check re-running full-frame).
                corrected = self._on_fetch(raw)
                if corrected is not None:
                    raw = corrected
            self._cached = raw @ self._tfs
        return self._cached


class MultiTracker:
    """Track M rigid objects through one fused graph per frame.

    Typical flow: register each object once with a full
    :class:`FoundationPose` estimator (which needs the scorer and the
    rotation grid), then hand the registered estimators to
    :meth:`from_estimators` and stream frames through :meth:`track` /
    :meth:`track_async`. Objects may also be constructed directly from
    meshes and seeded with :meth:`set_poses`.

    All objects share one refiner (the reference's released refiner is
    object-agnostic); per-object state is the mesh tensors, diameter,
    centering transform, and the on-device pose chain.
    """

    def __init__(
        self,
        meshes: Sequence[TriMesh] | None = None,
        cfg: EstimatorCfg | None = None,
        refiner_params=None,
    ):
        self.cfg = cfg or EstimatorCfg()
        self.has_refiner = refiner_params is not None
        if refiner_params is None:
            refiner_params = init_refine_net(
                jax.random.PRNGKey(0), self.cfg.refiner.net
            )
            logger.info("no refiner weights: refinement iterations disabled")
        self.refiner_params = refiner_params
        self.mesh_tensors: list[MeshTensors] = []
        self.diameters: list[float] = []
        self.tf_to_centered: list[np.ndarray] = []
        # (M, 4, 4) centered-object-in-camera poses, device-resident
        self.poses_last: jax.Array | None = None
        # Host-side hints of the latest fetched raw poses; drive the ROI
        # windows (may lag poses_last by the async pipeline depth, which
        # track_roi_margin absorbs — violations recover full-frame).
        self._pose_hints: np.ndarray | None = None
        self._track_seq = 0
        # (seq, corrected_poses_dev) of the newest chain correction that
        # in-flight successor frames have not absorbed yet; fetches
        # cascade it forward (see track_async.on_fetch).
        self._chain_repair: tuple[int, jax.Array] | None = None
        # Device-resident full-frame K for the packed upload, keyed by
        # the host K's bytes (re-uploaded only when K changes).
        self._K_cache: tuple[bytes, jax.Array] | None = None
        # Diagnosability counters (reset by set_poses): frames fetched
        # and how often ROI recovery / chain repair fired.
        self.track_stats = {"frames": 0, "roi_recoveries": 0, "chain_repairs": 0}
        for mesh in meshes or ():
            self.add_object(mesh)

    # ------------------------------------------------------------ setup

    def add_object(self, mesh: TriMesh) -> int:
        """Prepare one object (center, bake/decimate per cfg, upload);
        returns its index. Mirrors FoundationPose.reset_object's render
        path (estimator.py:159-205) for a tracking-only object."""
        min_xyz = mesh.vertices.min(axis=0)
        max_xyz = mesh.vertices.max(axis=0)
        center = (min_xyz + max_xyz) / 2
        mesh = mesh.copy()
        mesh.vertices = mesh.vertices - center.reshape(1, 3)
        diameter = compute_mesh_diameter(mesh.vertices)
        render_src = prepare_render_mesh(mesh, self.cfg, diameter)
        tf = np.eye(4)
        tf[:3, 3] = -center
        self.mesh_tensors.append(
            make_mesh_tensors(render_src, self.cfg.max_tex_size)
        )
        self.diameters.append(float(diameter))
        self.tf_to_centered.append(tf)
        return len(self.mesh_tensors) - 1

    @classmethod
    def from_estimators(
        cls, estimators: Sequence[FoundationPose], cfg: EstimatorCfg | None = None
    ) -> "MultiTracker":
        """Build a tracker from registered single-object estimators,
        reusing each estimator's prepared render mesh and current pose —
        the natural hand-off after per-object ``register()`` calls."""
        if not estimators:
            raise ValueError("need at least one estimator")
        first = estimators[0]
        for est in estimators:
            if est.pose_last is None:
                raise RuntimeError(
                    "all estimators must be registered (pose_last set) "
                    "before building a MultiTracker"
                )
            # All objects share ONE refiner: the delta parameterization,
            # crop geometry and weights must agree or poses silently
            # diverge from the per-object trackers.
            if est.cfg.refiner != first.cfg.refiner:
                raise ValueError(
                    "estimators have different refiner configs "
                    "(delta rep / crop geometry / net) — MultiTracker "
                    "runs one shared refiner for every object"
                )
            if est.has_refiner != first.has_refiner:
                raise ValueError(
                    "estimators disagree on has_refiner (some have real "
                    "weights, some are random-init)"
                )
            if est.refiner_params is not first.refiner_params:
                logger.warning(
                    "estimators carry different refiner_params objects; "
                    "MultiTracker uses estimators[0]'s weights for ALL "
                    "objects (identical weights loaded separately are "
                    "fine; different checkpoints are not)"
                )
        def unshard(tree):
            # Estimators registered with n_devices>1 carry replicated
            # mesh tensors / sharded pose arrays; tracking has no
            # hypothesis axis to shard, so pull everything onto the
            # default single device (meshes are small).
            return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tree)

        refiner_params = first.refiner_params
        if first.device_mesh is not None:
            refiner_params = unshard(refiner_params)
        t = cls(
            meshes=None,
            cfg=cfg or first.cfg,
            refiner_params=refiner_params,
        )
        t.has_refiner = first.has_refiner
        for est in estimators:
            mt = est.mesh_tensors
            if est.device_mesh is not None:
                mt = unshard(mt)
            t.mesh_tensors.append(mt)
            t.diameters.append(float(est.diameter))
            t.tf_to_centered.append(est.get_tf_to_centered_mesh())
        t.poses_last = jnp.stack(
            [jnp.asarray(np.asarray(e.pose_last), jnp.float32) for e in estimators]
        )
        t._pose_hints = np.asarray(t.poses_last, dtype=np.float64)
        t._upload_diameters()
        return t

    def _upload_diameters(self):
        self._diam_dev = jnp.asarray(self.diameters, dtype=jnp.float32)

    @property
    def n_objects(self) -> int:
        return len(self.mesh_tensors)

    def set_poses(self, poses: np.ndarray):
        """Seed/overwrite all object poses; ``poses`` is (M, 4, 4) in
        each object's ORIGINAL mesh frame (what register/track return)."""
        poses = np.asarray(poses, dtype=np.float64)
        if poses.shape != (self.n_objects, 4, 4):
            raise ValueError(f"expected {(self.n_objects, 4, 4)}, got {poses.shape}")
        raw = np.stack(
            [p @ np.linalg.inv(tf) for p, tf in zip(poses, self.tf_to_centered)]
        )
        self.poses_last = jnp.asarray(raw, dtype=jnp.float32)
        self._pose_hints = raw
        self._chain_repair = None  # fresh chain
        self.track_stats = {"frames": 0, "roi_recoveries": 0, "chain_repairs": 0}
        self._upload_diameters()

    # ------------------------------------------------------ ROI windows

    def _roi_windows(self, K: np.ndarray, H: int, W: int):
        """Per-object static-size square windows around the last fetched
        poses (the single tracker's _track_roi_window, batched): returns
        (x0s, y0s, size) with ONE common size (max over objects, so the
        window stack is a single static shape) or None for full-frame."""
        if not self.cfg.track_roi or self._pose_hints is None:
            return None
        f = float(max(K[0, 0], K[1, 1]))
        sizes, x0s, y0s = [], [], []
        for m in range(self.n_objects):
            t = self._pose_hints[m][:3, 3]
            z = float(t[2])
            if z <= 1e-6:
                return None
            crop_px = f * (self.diameters[m] * self.cfg.refiner.crop_ratio) / z
            sizes.append(
                int(np.ceil((crop_px * self.cfg.track_roi_margin + 16) / 64) * 64)
            )
        size = max(sizes)
        if size >= min(H, W):
            return None
        for m in range(self.n_objects):
            t = self._pose_hints[m][:3, 3]
            z = float(t[2])
            u = float(K[0, 0] * t[0] / z + K[0, 2])
            v = float(K[1, 1] * t[1] / z + K[1, 2])
            x0s.append(int(np.clip(round(u - size / 2), 0, W - size)))
            y0s.append(int(np.clip(round(v - size / 2), 0, H - size)))
        return x0s, y0s, size

    def _roi_contains(self, raw_pose, m, K, H, W, x0, y0, size) -> bool:
        """Shared containment predicate, per-object diameter."""
        return roi_contains_pose(
            raw_pose, K, H, W, (x0, y0, size),
            self.diameters[m], self.cfg.refiner.crop_ratio,
        )

    # --------------------------------------------------------- tracking

    def track_async(self, rgb, depth, K, iteration=2) -> MultiTrackResult:
        """Enqueue one frame's fused M-object graph; non-blocking.

        The (M, 4, 4) pose block stays on device as the next frame's
        input, so callers can pipeline frames exactly like
        ``track_one_async`` — but with ONE dispatch per frame for all
        objects instead of M. With ``cfg.track_roi`` (default), only M
        static-size windows around the objects ship per frame (exact via
        per-object principal-point-shifted K); each fetch verifies every
        object's crop window was contained in its streamed window and
        re-runs the frame full-frame when any object outran it. A
        correction also CASCADES through frames already in flight (each
        successor re-runs full-frame from the corrected chain on fetch),
        so poses match full-frame tracking provided results are fetched
        in dispatch order — which every driver here does. Dropping
        futures or fetching out of order breaks the cascade (a warning
        is logged); per-frame containment checking still applies."""
        if self.poses_last is None:
            raise RuntimeError("seed poses first (set_poses / from_estimators)")
        if not hasattr(self, "_diam_dev"):
            self._upload_diameters()
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        K_full = np.asarray(K, dtype=np.float32)
        H, W = depth.shape
        iters = int(iteration) if self.has_refiner else 0
        pose_in = self.poses_last
        meshes = tuple(self.mesh_tensors)
        roi = self._roi_windows(K_full, H, W)
        pack = self.cfg.track_pack
        if pack:
            kb = K_full.tobytes()
            if self._K_cache is None or self._K_cache[0] != kb:
                self._K_cache = (kb, jnp.asarray(K_full))
        if roi is not None:
            x0s, y0s, size = roi
            if pack:
                buf = pack_multi_track_frame(rgb, depth, x0s, y0s, size)
                poses = multi_track_roi_graph_packed(
                    self.refiner_params,
                    self.cfg,
                    meshes,
                    pose_in,
                    self._K_cache[1],
                    jnp.asarray(buf),
                    self._diam_dev,
                    size=size,
                    iterations=iters,
                )
            else:
                rgb_w = np.stack(
                    [rgb[y0 : y0 + size, x0 : x0 + size]
                     for x0, y0 in zip(x0s, y0s)]
                )
                depth_w = np.stack(
                    [depth[y0 : y0 + size, x0 : x0 + size]
                     for x0, y0 in zip(x0s, y0s)]
                )
                Ks = np.tile(K_full, (self.n_objects, 1, 1))
                Ks[:, 0, 2] -= np.asarray(x0s, np.float32)
                Ks[:, 1, 2] -= np.asarray(y0s, np.float32)
                poses = multi_track_roi_graph(
                    self.refiner_params,
                    self.cfg,
                    meshes,
                    pose_in,
                    jnp.asarray(Ks),
                    jnp.asarray(rgb_w, dtype=jnp.uint8),
                    jnp.asarray(depth_w, dtype=jnp.float32),
                    self._diam_dev,
                    iterations=iters,
                )
        elif pack:
            from .graph import pack_track_frame

            poses = multi_track_graph_packed(
                self.refiner_params,
                self.cfg,
                meshes,
                pose_in,
                self._K_cache[1],
                jnp.asarray(pack_track_frame(rgb, depth, 0, 0)),
                self._diam_dev,
                hw=depth.shape,
                iterations=iters,
            )
        else:
            poses = multi_track_graph(
                self.refiner_params,
                self.cfg,
                meshes,
                pose_in,
                jnp.asarray(K_full),
                jnp.asarray(rgb, dtype=jnp.uint8),
                jnp.asarray(depth, dtype=jnp.float32),
                self._diam_dev,
                iterations=iters,
            )
        self.poses_last = poses
        self._track_seq += 1
        seq = self._track_seq
        try:
            poses.copy_to_host_async()
        except AttributeError:
            pass

        def rerun_full_frame(from_poses, _self=self):
            if pack:
                from .graph import pack_track_frame

                return multi_track_graph_packed(
                    _self.refiner_params, _self.cfg, meshes, from_poses,
                    _self._K_cache[1],
                    jnp.asarray(pack_track_frame(rgb, depth, 0, 0)),
                    _self._diam_dev, hw=depth.shape, iterations=iters,
                )
            return multi_track_graph(
                _self.refiner_params, _self.cfg, meshes, from_poses,
                jnp.asarray(K_full), jnp.asarray(rgb, dtype=jnp.uint8),
                jnp.asarray(depth, dtype=jnp.float32), _self._diam_dev,
                iterations=iters,
            )

        def on_fetch(raw, _self=self):
            _self.track_stats["frames"] += 1
            repair = _self._chain_repair
            if repair is not None and repair[0] == seq - 1:
                # The predecessor frame was corrected AFTER this frame
                # dispatched: this frame's inputs chained from a stale
                # pose block. Recompute it full-frame from the corrected
                # chain (full-frame parity needs no containment check),
                # cascading the correction through the pipeline.
                _self.track_stats["chain_repairs"] += 1
                poses2 = rerun_full_frame(repair[1])
                raw2 = np.asarray(poses2, dtype=np.float64)
                _self._pose_hints = raw2
                _self._chain_repair = (seq, poses2)
                if _self._track_seq == seq:
                    _self.poses_last = poses2
                    _self._chain_repair = None  # chain fully repaired
                return raw2
            if repair is not None and repair[0] < seq - 1:
                # A future was dropped or fetched out of order: the
                # correction cannot cascade. Per-frame containment
                # checking below still bounds the damage.
                logger.warning(
                    "multi-tracking chain correction could not cascade "
                    "(results fetched out of dispatch order?)"
                )
                _self._chain_repair = None
            _self._pose_hints = raw
            if roi is None:
                return None
            x0s, y0s, size = roi
            ok = all(
                _self._roi_contains(raw[m], m, K_full, H, W, x0s[m], y0s[m], size)
                for m in range(_self.n_objects)
            )
            if ok:
                return None
            logger.warning(
                "multi-tracking ROI violated (an object outran its window); "
                "re-running frame full-frame"
            )
            _self.track_stats["roi_recoveries"] += 1
            poses2 = rerun_full_frame(pose_in)
            raw2 = np.asarray(poses2, dtype=np.float64)
            _self._pose_hints = raw2
            _self._chain_repair = (seq, poses2)
            if _self._track_seq == seq:
                # No newer frame dispatched: repair the device chain too.
                _self.poses_last = poses2
                _self._chain_repair = None
            return raw2

        return MultiTrackResult(
            poses, np.stack(self.tf_to_centered), on_fetch=on_fetch
        )

    def track(self, rgb, depth, K, iteration=2) -> np.ndarray:
        """Blocking per-frame tracking; returns (M, 4, 4) poses in each
        object's original mesh frame."""
        return self.track_async(rgb, depth, K, iteration=iteration).result()
