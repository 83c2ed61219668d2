"""FoundationPose public estimator API (register / track_one).

TPU-native counterpart of the reference estimator (estimater.py:18-268)
with the same public surface:

    est = FoundationPose(mesh=mesh, symmetry_tfs=None)
    pose = est.register(K, rgb, depth, ob_mask, iteration=5)   # (4,4) np
    pose = est.track_one(rgb, depth, K, iteration=2)           # (4,4) np

Design differences (deliberate, TPU-first):
* All per-frame compute — depth filtering, XYZ maps, hypothesis
  rendering, 5x refinement, scoring, argmax — runs on device in a few
  compiled graphs with static shapes; the reference's cuda<->numpy hops
  between refiner and scorer (estimater.py:204,215,219) do not exist.
* Per-frame state (pose_last, rotation grid) is explicit array state on
  the object; everything below it is a pure function.
* The rotation grid is built once per object on the host (icosphere +
  greedy symmetry clustering, native C++ or numpy) exactly like the
  reference (estimater.py:106-124).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from .. import jax_config  # noqa: F401
from ..geometry.clustering import cluster_poses
from ..geometry.icosphere import sample_views_icosphere
from ..geometry.projection import guess_translation
from ..meshio import TriMesh, compute_mesh_diameter, voxel_downsample
from ..models.networks import init_refine_net, init_score_net
from .config import EstimatorCfg
from .mesh_tensors import make_mesh_tensors

logger = logging.getLogger(__name__)


class TrackResult:
    """Handle to an in-flight tracking dispatch.

    `track_one_async` returns immediately after enqueueing the frame's
    compiled graph; the pose stays on device (it is also the next
    frame's `pose_last` input, so the frame-to-frame dependency never
    leaves the chip) while its host copy streams back in the background
    (`copy_to_host_async`). `result()` blocks until the value is on host
    and returns the (4, 4) float64 object-in-camera pose with the
    centered-mesh transform applied — identical to what the blocking
    `track_one` returns.
    """

    __slots__ = ("_pose_dev", "_tf", "_on_fetch", "_cached", "_raw_host")

    def __init__(self, pose_dev: jax.Array, tf: np.ndarray, on_fetch=None):
        self._pose_dev = pose_dev
        self._tf = tf
        self._on_fetch = on_fetch
        self._cached = None
        self._raw_host = None

    def _prefill(self, raw_host: np.ndarray) -> None:
        """Install an already-fetched raw device pose (from a batched
        transfer — see fetch_track_results); result() then runs the
        per-frame containment/chain checks on it without paying its own
        host<->device round trip."""
        if self._cached is None and self._raw_host is None:
            self._raw_host = np.asarray(raw_host, np.float64).reshape(4, 4)

    def result(self) -> np.ndarray:
        if self._cached is None:
            raw = self._raw_host
            if raw is None:
                raw = np.asarray(self._pose_dev, dtype=np.float64).reshape(4, 4)
            if self._on_fetch is not None:
                # on_fetch may return a corrected raw pose (e.g. the
                # tracking-ROI containment check re-running full-frame).
                corrected = self._on_fetch(raw)
                if corrected is not None:
                    raw = corrected
            self._cached = raw @ self._tf
        return self._cached


def fetch_track_results(results) -> list[np.ndarray]:
    """Resolve a batch of in-flight TrackResults with ONE host<->device
    transfer, then run each frame's checks in dispatch order.

    Per-frame `result()` pays a full tunnel round trip to fetch a 4x4
    pose — 20-30 ms on this environment's RPC-tunneled chip, which
    dominated end-to-end tracking FPS (BENCH_r04: fetch 22.3 ms/frame ≈
    the 28.3 ms RTT). Stacking the k device poses (one tiny dispatch)
    and fetching the (k, 4, 4) array once amortizes that RTT over k
    frames; the ROI-containment check and chain-repair cascade still
    run per frame on the fetched poses, exactly as sequential result()
    calls would. Frames needing recovery re-run as usual (their
    corrected poses invalidate nothing: _prefill only seeds the raw
    fetch). Pass results IN DISPATCH ORDER; returns their poses.
    """
    results = list(results)
    pending = [r for r in results if r._cached is None and r._raw_host is None]
    if len(pending) > 1:
        stacked = jnp.stack([r._pose_dev for r in pending])
        host = np.asarray(stacked)  # one RPC for the whole batch
        for r, raw in zip(pending, host):
            r._prefill(raw)
    return [r.result() for r in results]


def _rotation_about_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    out = np.eye(4)
    out[:2, :2] = [[c, -s], [s, c]]
    return out


def prepare_render_mesh(mesh: TriMesh, cfg: EstimatorCfg, diameter: float) -> TriMesh:
    """Render-mesh prep shared by FoundationPose.reset_object and
    MultiTracker.add_object: bake textures to vertex colors and/or
    decimate dense meshes per cfg (both accuracy-validated — see
    tests/test_render_defaults.py). `mesh` is the centered mesh."""
    render_src = mesh
    if cfg.vertex_color_render and mesh.has_texture:
        from ..meshio import texture_to_vertex_colors

        render_src = texture_to_vertex_colors(mesh)
    if cfg.max_render_faces is not None and len(mesh.faces) > cfg.max_render_faces:
        from ..meshio import decimate_vertex_clustering

        vox = diameter / 160.0  # crop-pixel scale
        render_src = decimate_vertex_clustering(mesh, vox)
        while len(render_src.faces) > cfg.max_render_faces:
            vox *= 1.4
            render_src = decimate_vertex_clustering(mesh, vox)
        logger.info(
            "render mesh decimated: %d -> %d faces",
            len(mesh.faces),
            len(render_src.faces),
        )
    return render_src


def roi_contains_pose(
    raw_pose: np.ndarray,
    K: np.ndarray,
    H: int,
    W: int,
    roi: tuple[int, int, int],
    diameter: float,
    crop_ratio: float,
) -> bool:
    """Was the crop window implied by `raw_pose` (centered-mesh frame,
    full-frame K) inside the streamed ROI, up to the stencil-filter
    halo? The window is first clipped to the image: pixels past the
    border zero-sample identically in full-frame mode, so only in-image
    excursions count as violations. Shared by the single- and
    multi-object trackers."""
    x0, y0, size = roi
    t = raw_pose[:3, 3]
    z = float(t[2])
    if z <= 1e-6:
        return False
    f = float(max(K[0, 0], K[1, 1]))
    halo = 4.0  # erode(r=2) + bilateral(r=2) support
    half = f * (diameter * crop_ratio) / z / 2 + halo
    u = float(K[0, 0] * t[0] / z + K[0, 2])
    v = float(K[1, 1] * t[1] / z + K[1, 2])
    lo_u, hi_u = max(u - half, 0.0), min(u + half, float(W))
    lo_v, hi_v = max(v - half, 0.0), min(v + half, float(H))
    return (
        lo_u >= x0 and hi_u <= x0 + size
        and lo_v >= y0 and hi_v <= y0 + size
    )


class FoundationPose:
    def __init__(
        self,
        model_pts=None,
        model_normals=None,
        symmetry_tfs=None,
        mesh: TriMesh | None = None,
        cfg: EstimatorCfg | None = None,
        refiner_params=None,
        scorer_params=None,
        debug: int = 0,
        debug_dir: str | None = None,
        n_devices: int | None = None,
    ):
        """n_devices > 1 shards the hypothesis batch across a 1-D device
        mesh (SURVEY.md §2.9): rendering, crops and conv trunks are
        embarrassingly parallel; GSPMD inserts the one all-gather the
        scorer's cross-hypothesis attention needs. None = single device.
        """
        self.cfg = cfg or EstimatorCfg()
        self.debug = debug
        self.debug_dir = debug_dir
        self.gt_pose = None
        self.pose_last: jax.Array | None = None
        self._guess_center = None  # set by register(); feeds debug vis
        self.K_last = None
        # Host-side hint of the latest fetched raw pose (centered-mesh
        # frame); drives the tracking ROI window. Updated by register()
        # and by every TrackResult fetch — it may lag pose_last by the
        # async pipeline depth, which track_roi_margin absorbs.
        self._pose_hint: np.ndarray | None = None
        # Newest chain correction not yet absorbed by in-flight frames
        # (seq, corrected_pose_dev); see track_one_async.on_fetch.
        self._chain_repair = None
        # Device-resident full-frame K for the packed tracking upload,
        # keyed by the host K's bytes (re-uploaded only when K changes).
        self._K_cache: tuple[bytes, jax.Array] | None = None
        # Diagnosability counters (reset by register): how many tracking
        # frames were fetched, and how often the ROI-containment recovery
        # / chain-repair machinery actually fired — so a recorded FPS
        # number can be attributed after the fact.
        self.track_stats = {"frames": 0, "roi_recoveries": 0, "chain_repairs": 0}
        self.register_roi_recoveries = 0
        self.device_mesh = None
        if n_devices is not None and n_devices > 1:
            from ..parallel.sharding import make_device_mesh

            self.device_mesh = make_device_mesh(n_devices)

        # Weights-awareness: a randomly initialized refiner would apply
        # garbage deltas, so refinement is skipped unless real weights
        # are supplied; the scorer falls back to the classical depth
        # scorer in "auto" mode.
        self.has_refiner = refiner_params is not None
        if self.cfg.scorer.mode == "auto":
            import dataclasses as _dc

            resolved = "network" if scorer_params is not None else "depth"
            self.cfg = _dc.replace(
                self.cfg, scorer=_dc.replace(self.cfg.scorer, mode=resolved)
            )
            logger.info("scorer mode auto -> %s", resolved)
        if refiner_params is None:
            refiner_params = init_refine_net(
                jax.random.PRNGKey(0), self.cfg.refiner.net
            )
            logger.info("no refiner weights: refinement iterations disabled")
        if scorer_params is None:
            scorer_params = init_score_net(jax.random.PRNGKey(1), self.cfg.scorer.net)
        if self.device_mesh is not None:
            from ..parallel.sharding import replicate_tree

            refiner_params = replicate_tree(refiner_params, self.device_mesh)
            scorer_params = replicate_tree(scorer_params, self.device_mesh)
        self.refiner_params = refiner_params
        self.scorer_params = scorer_params

        self.reset_object(
            model_pts=model_pts,
            model_normals=model_normals,
            symmetry_tfs=symmetry_tfs,
            mesh=mesh,
        )
        self.make_rotation_grid(
            min_n_views=self.cfg.min_n_views,
            inplane_step=self.cfg.inplane_step_deg,
        )

    # ------------------------------------------------------------ setup

    def reset_object(self, model_pts=None, model_normals=None, symmetry_tfs=None, mesh=None):
        """Re-center the mesh, compute diameter/points, upload tensors
        (estimater.py:44-78)."""
        if mesh is None:
            raise ValueError("mesh is required")
        max_xyz = mesh.vertices.max(axis=0)
        min_xyz = mesh.vertices.min(axis=0)
        self.model_center = (min_xyz + max_xyz) / 2
        self.mesh_ori = mesh
        mesh = mesh.copy()
        mesh.vertices = mesh.vertices - self.model_center.reshape(1, 3)

        self.diameter = compute_mesh_diameter(mesh.vertices)
        self.vox_size = max(self.diameter / 20.0, 0.003)
        pts, normals = voxel_downsample(
            mesh.vertices, self.vox_size, mesh.vertex_normals
        )
        self.max_xyz = pts.max(axis=0)
        self.min_xyz = pts.min(axis=0)
        self.pts = jnp.asarray(pts, dtype=jnp.float32)
        self.normals = jnp.asarray(normals, dtype=jnp.float32)
        self.mesh = mesh
        render_mesh_src = prepare_render_mesh(mesh, self.cfg, self.diameter)
        self.mesh_tensors = make_mesh_tensors(render_mesh_src, self.cfg.max_tex_size)
        # Device-resident scalar: avoids a per-frame small-array upload
        # (~1 ms each through a tunneled chip) on the tracking hot path.
        self._diam_dev = jnp.float32(self.diameter)

        if symmetry_tfs is None:
            self.symmetry_tfs = np.eye(4)[None]
        else:
            self.symmetry_tfs = np.asarray(symmetry_tfs, dtype=np.float64)
        logger.info(
            "reset done: diameter=%.4f V=%d F=%d",
            self.diameter,
            len(mesh.vertices),
            len(mesh.faces),
        )

    def get_tf_to_centered_mesh(self) -> np.ndarray:
        tf = np.eye(4)
        tf[:3, 3] = -self.model_center
        return tf

    def make_rotation_grid(self, min_n_views=40, inplane_step=60):
        """Icosphere views x in-plane rotations, deduped under symmetry
        (estimater.py:106-124)."""
        cam_in_obs = sample_views_icosphere(n_views=min_n_views)
        rot_grid = []
        for i in range(len(cam_in_obs)):
            for inplane_rot in np.deg2rad(np.arange(0, 360, inplane_step)):
                cam_in_ob = cam_in_obs[i] @ _rotation_about_z(inplane_rot)
                rot_grid.append(np.linalg.inv(cam_in_ob))
        rot_grid = np.asarray(rot_grid)
        rot_grid = cluster_poses(
            self.cfg.cluster_angle_deg, 99999.0, rot_grid, self.symmetry_tfs
        )
        n = len(rot_grid)
        pad_mult = self.cfg.rot_grid_pad
        if self.device_mesh is not None:
            # pad to a multiple of the device count so the hypothesis
            # batch shards evenly
            pad_mult = int(np.lcm(pad_mult, self.device_mesh.devices.size))
        pad = (-n) % pad_mult
        if pad:
            rot_grid = np.concatenate([rot_grid, np.tile(np.eye(4)[None], (pad, 1, 1))])
        self.hyp_valid = jnp.asarray(
            np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        )
        self.rot_grid = jnp.asarray(rot_grid, dtype=jnp.float32)
        if self.device_mesh is not None:
            from ..parallel.sharding import batch_sharding, replicate_tree

            sh = batch_sharding(self.device_mesh)
            self.rot_grid = jax.device_put(self.rot_grid, sh)
            self.hyp_valid = jax.device_put(self.hyp_valid, sh)
            self.mesh_tensors = replicate_tree(self.mesh_tensors, self.device_mesh)
        logger.info("rotation grid: %d (+%d pad)", n, pad)

    # --------------------------------------------------------- inference
    #
    # register/track each run as ONE fused jit (pipeline/graph.py): a
    # single dispatch + result fetch per frame, which is what keeps
    # per-frame latency sane when the TPU sits behind an RPC tunnel.

    def _register_roi_window(self, K, depth_np, mask_np):
        """Detection-sized square upload window for register().

        Sized from the projected crop extent at the mask's median depth
        (x register_roi_margin, the same slack rule as the tracking
        ROI), placed on the mask centroid, snapped to 64-px buckets so
        jit buckets stay coarse. Returns (x0, y0, size) or None for
        full-frame (window would not shrink the upload, or the mask
        bbox cannot be contained)."""
        if not (self.cfg.register_roi and self.cfg.register_pack):
            return None
        H, W = depth_np.shape
        ys, xs = np.nonzero(mask_np)
        if len(ys) == 0:
            return None
        vals = depth_np[ys, xs]
        vals = vals[vals >= 0.001]
        if len(vals) == 0:
            return None
        z = float(np.median(vals))
        f = float(max(K[0, 0], K[1, 1]))
        crop_px = f * (self.diameter * self.cfg.refiner.crop_ratio) / z
        size = int(
            np.ceil((crop_px * self.cfg.register_roi_margin + 16) / 64) * 64
        )
        # the translation guess reads the mask: the window must cover the
        # whole detection (+ filter halo)
        size = max(
            size,
            int(np.ceil((int(xs.max() - xs.min()) + 17) / 64) * 64),
            int(np.ceil((int(ys.max() - ys.min()) + 17) / 64) * 64),
        )
        if size >= min(H, W):
            return None
        x0 = int(np.clip(round(float(xs.mean()) - size / 2), 0, W - size))
        y0 = int(np.clip(round(float(ys.mean()) - size / 2), 0, H - size))
        if (
            xs.min() < x0 or xs.max() >= x0 + size
            or ys.min() < y0 or ys.max() >= y0 + size
        ):
            return None  # centroid-off-center detection; ship the frame
        return x0, y0, size

    def register(self, K, rgb, depth, ob_mask, ob_id=None, iteration=5) -> np.ndarray:
        """Single-frame pose estimation (estimater.py:159-240)."""
        from .graph import (
            pack_register_frame,
            register_graph,
            register_graph_packed,
        )

        mask_np = np.asarray(ob_mask)
        depth_np = np.asarray(depth)
        K_np = np.asarray(K)
        valid = (depth_np >= 0.001) & (mask_np > 0)
        if valid.sum() < 4:
            # Degenerate input: identity rotation at the translation guess
            # (estimater.py:184-189; raw-depth median, filtering skipped).
            logger.info("valid region too small; returning translation guess")
            pose = np.eye(4)
            pose[:3, 3] = guess_translation(
                depth_np, mask_np, K_np
            )
            return pose

        iters = int(iteration) if self.has_refiner else 0
        rgb_np = np.asarray(rgb)
        H, W = depth_np.shape

        def run_packed(roi):
            if roi is None:
                x0 = y0 = 0
                win = (rgb_np, depth_np, mask_np)
                hw = depth_np.shape
            else:
                x0, y0, size = roi
                win = (
                    rgb_np[y0 : y0 + size, x0 : x0 + size],
                    depth_np[y0 : y0 + size, x0 : x0 + size],
                    mask_np[y0 : y0 + size, x0 : x0 + size],
                )
                hw = (size, size)
            buf = pack_register_frame(
                win[0], win[1].astype(np.float32), win[2], x0, y0
            )
            return register_graph_packed(
                self.refiner_params,
                self.scorer_params,
                self.cfg,
                self.mesh_tensors,
                self.rot_grid,
                self.hyp_valid,
                jnp.asarray(K_np, dtype=jnp.float32),
                jnp.asarray(buf),
                jnp.float32(self.diameter),
                hw=hw,
                iterations=iters,
            )

        roi = None
        best_host = None
        if self.cfg.register_pack and (depth_np.size % 8 == 0):
            roi = self._register_roi_window(K_np, depth_np, mask_np)
            out = run_packed(roi)
            if roi is not None:
                # The winner's crop must have been contained in the
                # shipped window, else its observed crop lost in-frame
                # content vs full-frame mode: verify on host and re-run
                # full-frame on violation (same recovery contract as
                # tracking; the window margin makes this rare). Stream
                # the order alongside so this fetch costs no extra
                # round trip over the one the epilogue pays anyway.
                try:
                    out[0].copy_to_host_async()
                    out[1].copy_to_host_async()
                except AttributeError:
                    pass
                best_host = np.asarray(out[1][0], np.float64).reshape(4, 4)
                if not self._roi_contains_pose(best_host, K_np, H, W, roi):
                    logger.info(
                        "register ROI violated (winner outran the "
                        "window); re-running full-frame"
                    )
                    self.register_roi_recoveries += 1
                    out = run_packed(None)
                    best_host = None
            order, refined, scores, _center, _n = out
        else:
            order, refined, scores, _center, _n = register_graph(
                self.refiner_params,
                self.scorer_params,
                self.cfg,
                self.mesh_tensors,
                self.rot_grid,
                self.hyp_valid,
                jnp.asarray(K_np, dtype=jnp.float32),
                jnp.asarray(rgb, dtype=jnp.uint8),
                jnp.asarray(depth, dtype=jnp.float32),
                jnp.asarray(mask_np),
                jnp.float32(self.diameter),
                iterations=iters,
            )
        self.poses = refined
        self.scores = scores
        self.pose_last = refined[0]
        # Overlap the two result fetches (order + best pose): each
        # blocking fetch pays a full host<->chip round trip on a
        # tunneled TPU, so start both transfers before reading either.
        try:
            order.copy_to_host_async()
            self.pose_last.copy_to_host_async()
        except AttributeError:
            pass
        self.best_id = int(order[0])
        self._guess_center = np.asarray(_center, dtype=np.float64)
        self._pose_hint = (
            best_host
            if best_host is not None
            else np.asarray(self.pose_last, dtype=np.float64)
        )
        self._chain_repair = None  # fresh chain
        self.track_stats = {"frames": 0, "roi_recoveries": 0, "chain_repairs": 0}
        best_pose = self._pose_hint @ self.get_tf_to_centered_mesh()
        if self.debug >= 2 and self.debug_dir:
            from ..utils.debug_vis import dump_refiner_debug, dump_register_debug

            dump_register_debug(self, self.debug_dir, K, rgb, depth)
            if self.has_refiner and int(iteration) > 0:
                dump_refiner_debug(
                    self, self.debug_dir, K, rgb, depth, int(iteration)
                )
        if self.debug >= 3 and self.debug_dir:
            from ..utils.debug_vis import dump_transformed_mesh

            dump_transformed_mesh(self, self.debug_dir, best_pose)
        return best_pose

    def compute_add_err_to_gt_pose(self, poses) -> np.ndarray:
        """GT hook. The reference stubs this to -1 (estimater.py:243-247);
        here it computes real ADD against self.gt_pose when set."""
        if self.gt_pose is None:
            return -np.ones(len(poses))
        pts = np.asarray(self.pts)
        gt = np.asarray(self.gt_pose) @ np.linalg.inv(self.get_tf_to_centered_mesh())
        poses = np.asarray(poses)
        gt_pts = pts @ gt[:3, :3].T + gt[:3, 3]
        pred = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
        return np.linalg.norm(pred - gt_pts[None], axis=-1).mean(axis=-1)

    def save_weights(self, refiner_path: str | None = None, scorer_path: str | None = None):
        """Save refiner/scorer params as .npz with the LIVE pipeline
        config embedded (mirroring how cli.convert_weights embeds the
        reference checkpoint's config.yml): load_weights / the CLIs'
        --refiner_ckpt reconstruct the exact net width, crop resolution
        and delta parameterization these weights were trained under."""
        import dataclasses as _dc

        from ..utils.checkpoint import save_params

        if refiner_path:
            save_params(
                refiner_path, self.refiner_params,
                meta={"pipeline_cfg": _dc.asdict(self.cfg.refiner)},
            )
        if scorer_path:
            save_params(
                scorer_path, self.scorer_params,
                meta={"pipeline_cfg": _dc.asdict(self.cfg.scorer)},
            )

    def load_weights(self, refiner_path: str | None = None, scorer_path: str | None = None):
        """Load converted (.npz) or raw torch (.pth) checkpoints.

        The checkpoint's shipped reference config (embedded by
        cli.convert_weights, or the sidecar config.yml next to a .pth)
        is ingested so the pipeline config always matches what the
        weights were trained for (predict_pose_refine.py:102-131)."""
        import dataclasses as _dc

        from ..models.loading import load_estimator_checkpoint

        if refiner_path:
            params, rcfg, zfar = load_estimator_checkpoint(
                refiner_path, "refiner", base=self.cfg.refiner
            )
            self.refiner_params = params
            self.cfg = _dc.replace(self.cfg, refiner=rcfg)
            if zfar is not None:
                self.cfg = _dc.replace(self.cfg, zfar=zfar)
            self.has_refiner = True
        if scorer_path:
            params, scfg, _ = load_estimator_checkpoint(
                scorer_path, "scorer", base=self.cfg.scorer
            )
            self.scorer_params = params
            self.cfg = _dc.replace(self.cfg, scorer=scfg)  # sets mode=network

    def track_one(self, rgb, depth, K, iteration=2, extra=None) -> np.ndarray:
        """Per-frame tracking: refine-only from pose_last (estimater.py:250-268)."""
        return self.track_one_async(rgb, depth, K, iteration=iteration).result()

    def _track_roi_window(self, K: np.ndarray, H: int, W: int):
        """Static-size square window around the last fetched pose.

        Returns (x0, y0, size) or None for full-frame. Exactness: the
        pipeline's geometry is parameterized entirely by K, so slicing
        the images and shifting K's principal point is a change of
        viewport, not of the computation — provided the refiner's crop
        window stays inside the slice, which the margin guarantees for
        inter-frame motion up to (margin - 1) crop half-extents.
        """
        if not self.cfg.track_roi or self._pose_hint is None:
            return None
        t = self._pose_hint[:3, 3]
        z = float(t[2])
        if z <= 1e-6:
            return None
        f = float(max(K[0, 0], K[1, 1]))
        # Projected crop extent (geometry/projection.py crop window) ×
        # safety margin + stencil-filter halo.
        crop_px = f * (self.diameter * self.cfg.refiner.crop_ratio) / z
        size = int(np.ceil((crop_px * self.cfg.track_roi_margin + 16) / 64) * 64)
        if size >= min(H, W):
            return None
        u = float(K[0, 0] * t[0] / z + K[0, 2])
        v = float(K[1, 1] * t[1] / z + K[1, 2])
        x0 = int(np.clip(round(u - size / 2), 0, W - size))
        y0 = int(np.clip(round(v - size / 2), 0, H - size))
        return x0, y0, size

    def _roi_contains_pose(self, raw_pose, K, H, W, roi) -> bool:
        """See module-level :func:`roi_contains_pose`."""
        return roi_contains_pose(
            raw_pose, K, H, W, roi, self.diameter, self.cfg.refiner.crop_ratio
        )

    def track_one_async(self, rgb, depth, K, iteration=2) -> TrackResult:
        """Non-blocking tracking: enqueue this frame's compiled graph and
        return a :class:`TrackResult` whose ``result()`` fetches the pose.

        The frame-to-frame dependency (``pose_last``) stays on device, so
        callers can dispatch frame N+1 before fetching frame N's pose and
        overlap host<->device latency with compute. With track_roi on,
        only a window around the object ships per frame, so throughput is
        bounded by compute + window bytes rather than full-frame
        transfers; each fetch verifies the refined pose's crop window was
        contained in the streamed window and transparently re-runs the
        frame full-frame when the object outran it (first such recovery
        compiles the full-frame bucket). A correction also CASCADES
        through frames already in flight — each successor re-runs
        full-frame from the corrected chain on fetch — so poses match
        sequential ``track_one`` calls provided results are fetched in
        dispatch order. Dropping futures or fetching out of order breaks
        the cascade (a warning is logged); per-frame containment
        checking still applies.
        """
        from .graph import pack_track_frame, track_graph, track_graph_packed

        if self.pose_last is None:
            raise RuntimeError("Please init pose by register() first")
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        K = np.asarray(K, dtype=np.float32)
        H, W = depth.shape
        rgb_full, depth_full, K_full = rgb, depth, K
        pose_in = self.pose_last
        iters = int(iteration) if self.has_refiner else 0
        roi = self._track_roi_window(K, H, W)
        x0 = y0 = 0
        if roi is not None:
            x0, y0, size = roi
            rgb = rgb[y0 : y0 + size, x0 : x0 + size]
            depth = depth[y0 : y0 + size, x0 : x0 + size]
        if self.cfg.track_pack:
            kb = K.tobytes()
            if self._K_cache is None or self._K_cache[0] != kb:
                self._K_cache = (kb, jnp.asarray(K))
            buf = pack_track_frame(rgb, depth, x0, y0)
            pose = track_graph_packed(
                self.refiner_params,
                self.cfg,
                self.mesh_tensors,
                pose_in,
                self._K_cache[1],
                jnp.asarray(buf),
                self._diam_dev,
                hw=depth.shape,
                iterations=iters,
            )
        else:
            Kr = K
            if roi is not None:
                Kr = K.copy()
                Kr[0, 2] -= x0
                Kr[1, 2] -= y0
            pose = track_graph(
                self.refiner_params,
                self.cfg,
                self.mesh_tensors,
                pose_in,
                jnp.asarray(Kr),
                jnp.asarray(rgb, dtype=jnp.uint8),
                jnp.asarray(depth, dtype=jnp.float32),
                self._diam_dev,
                iterations=iters,
            )
        self.pose_last = pose
        self._track_seq = getattr(self, "_track_seq", 0) + 1
        seq = self._track_seq
        try:
            pose.copy_to_host_async()
        except AttributeError:  # tracers / sharded arrays without the method
            pass

        def rerun_full_frame(from_pose, _self=self):
            if _self.cfg.track_pack:
                return track_graph_packed(
                    _self.refiner_params, _self.cfg, _self.mesh_tensors,
                    from_pose, _self._K_cache[1],
                    jnp.asarray(pack_track_frame(rgb_full, depth_full, 0, 0)),
                    _self._diam_dev, hw=depth_full.shape, iterations=iters,
                )
            return track_graph(
                _self.refiner_params, _self.cfg, _self.mesh_tensors,
                from_pose, jnp.asarray(K_full),
                jnp.asarray(rgb_full, dtype=jnp.uint8),
                jnp.asarray(depth_full, dtype=jnp.float32),
                _self._diam_dev, iterations=iters,
            )

        def on_fetch(raw, _self=self):
            _self.track_stats["frames"] += 1
            repair = getattr(_self, "_chain_repair", None)
            if repair is not None and repair[0] == seq - 1:
                # The predecessor was corrected AFTER this frame
                # dispatched: this frame chained from a stale pose.
                # Recompute full-frame from the corrected chain,
                # cascading the correction through the pipeline.
                _self.track_stats["chain_repairs"] += 1
                pose2 = rerun_full_frame(repair[1])
                raw2 = np.asarray(pose2, dtype=np.float64).reshape(4, 4)
                _self._pose_hint = raw2
                _self._chain_repair = (seq, pose2)
                if _self._track_seq == seq:
                    _self.pose_last = pose2
                    _self._chain_repair = None  # chain fully repaired
                return raw2
            if repair is not None and repair[0] < seq - 1:
                logger.warning(
                    "tracking chain correction could not cascade "
                    "(results fetched out of dispatch order?)"
                )
                _self._chain_repair = None
            _self._pose_hint = raw
            if roi is None or _self._roi_contains_pose(
                raw, K_full, H, W, roi
            ):
                return None
            # The ROI was derived from a pose hint that lagged the true
            # motion (async pipeline depth / dropped futures) and the
            # refiner's crop window left the streamed slice, where
            # warp_crop clamps/zero-samples. Recover by re-running this
            # frame full-frame from the same input pose, restoring the
            # "poses match sequential full-frame track_one" contract.
            logger.warning(
                "tracking ROI violated (object outran the window); "
                "re-running frame full-frame"
            )
            _self.track_stats["roi_recoveries"] += 1
            pose2 = rerun_full_frame(pose_in)
            raw2 = np.asarray(pose2, dtype=np.float64).reshape(4, 4)
            _self._pose_hint = raw2
            _self._chain_repair = (seq, pose2)
            if _self._track_seq == seq:
                # No newer frame dispatched yet: repair the on-device
                # chain too.
                _self.pose_last = pose2
                _self._chain_repair = None
            return raw2

        return TrackResult(pose, self.get_tf_to_centered_mesh(), on_fetch)
