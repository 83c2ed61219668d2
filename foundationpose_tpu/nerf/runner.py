"""Neural-object-field training/extraction — the model-free subsystem.

TPU redesign of bundlesdf/nerf_runner.py (NerfRunner, 1,232 LoC of torch
+ kaolin + custom CUDA). Differences by design:

* One jitted train step: ray-batch gather, occupancy sampling, hash-grid
  encode, MLP, SDF losses, adam update — a single compiled graph, scaled
  across chips by sharding the ray batch (data parallel, psum by GSPMD).
* The kaolin octree becomes a dense occupancy grid (occupancy.py); the
  torch-ngp CUDA hash grid becomes ops/hashgrid.py (XLA gathers with
  autodiff scatter-add backward).
* Everything stays in the OpenCV camera convention — the reference's
  OpenGL round-trips (run_nerf.py:23, nerf_helpers.py:248,265) vanish.
* Rays are a struct-of-arrays store with static shapes; batches are
  random gathers inside the jit.

Loss semantics follow nerf_runner.py:507-680 / nerf_helpers.py:398-428:
rgb MSE (first-frame weighting), free-space, empty, truncation-SDF,
feature/pose regularizers; sdf2weights band rendering for color.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import jax_config  # noqa: F401
from ..meshio import TriMesh
from ..ops.hashgrid import HashGridCfg, hashgrid_encode, init_hashgrid
from ..ops.marching import marching_tetrahedra
from .config import NerfCfg
from .model import (
    apply_nerf_mlp,
    apply_nerf_sdf,
    init_nerf_mlp,
    pose_array_matrices,
    sh_encode,
)
from .occupancy import (
    build_occupancy_grid,
    occupancy_lookup,
    ray_box_intersection,
    sample_occupied,
)
from .scene import BAD_DEPTH

logger = logging.getLogger(__name__)


def sample_pdf(bins, weights, n_samples, key, perturb=True):
    """Inverse-CDF resampling (nerf_helpers.py:358-385, vectorized).

    bins (N, B), weights (N, B-1) -> (N, n_samples) z values drawn from
    the piecewise-constant pdf over the bins."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    N = bins.shape[0]
    if perturb:
        u = jax.random.uniform(key, (N, n_samples))
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_samples)[None], (N, n_samples)
        )
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf, u
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def subset_near_band(z, valid, depth, trunc, neg_trunc_ratio, keep, key,
                     near=None, far=None):
    """Keep the `keep` samples per ray nearest the depth supervision
    band [depth - trunc, depth + trunc*neg_trunc_ratio] (NerfCfg.
    occ_keep_frac): all in-band samples rank first (ties break
    uniformly at random so the in-band subset stays unbiased when the
    band itself overflows `keep`), then out-of-band by distance to the
    band; invalid samples rank last. Rays without usable depth keep a
    random subset. Returns (z_kept, valid_kept) with per-ray ascending
    index order preserved, so downstream band rendering sees the same
    ordering contract as the full set."""
    lo = depth[:, None] - trunc
    hi = depth[:, None] + trunc * neg_trunc_ratio
    dist = jnp.maximum(lo - z, 0.0) + jnp.maximum(z - hi, 0.0)
    if near is not None:
        has_d = (depth >= near) & (depth <= far)
        dist = jnp.where(has_d[:, None], dist, 0.0)
    tie = jax.random.uniform(key, z.shape) * 1e-5
    rank = jnp.where(valid, -dist - tie, -jnp.inf)
    _, idx = jax.lax.top_k(rank, keep)
    idx = jnp.sort(idx, axis=-1)
    return (
        jnp.take_along_axis(z, idx, axis=-1),
        jnp.take_along_axis(valid, idx, axis=-1),
    )


def make_frame_rays(rgb, depth, mask, K, frame_id, dilate=0):
    """Per-frame ray records (nerf_runner.py:247-317, CV convention).

    Returns dict of numpy arrays: dir (N,3) with z=1, rgb (N,3),
    depth (N,), frame_id (N,). Rays come from mask pixels (optionally
    dilated); BAD_DEPTH pixels train free space.
    """
    H, W = depth.shape
    m = mask.astype(bool)
    if dilate > 0:
        import cv2

        kernel = np.ones((dilate, dilate), np.uint8)
        m = cv2.dilate(m.astype(np.uint8), kernel).astype(bool)
    v, u = np.nonzero(m)
    dirs = np.stack(
        [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u, np.float64)],
        axis=-1,
    )
    return {
        "dir": dirs.astype(np.float32),
        "rgb": rgb[v, u].astype(np.float32),
        "depth": depth[v, u].astype(np.float32),
        "frame_id": np.full(len(v), frame_id, np.int32),
    }


class NerfRunner:
    """Train a neural SDF object field from posed RGB-D views and extract
    a textured mesh (the reference's NerfRunner, redesigned)."""

    def __init__(self, cfg: NerfCfg, rgbs, depths, masks, poses, K, build_pcd,
                 seed: int = 0):
        """rgbs (N,H,W,3) float [0,1] preprocessed, depths (N,H,W)
        normalized, poses (N,4,4) cam_in_ob normalized CV, build_pcd (M,3)
        normalized object points for the occupancy grid."""
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        self.H, self.W = depths.shape[1:3]
        self.n_frames = len(rgbs)
        self.poses = np.asarray(poses, np.float64)

        occ_vox = cfg.occ_voxel_size * cfg.sc_factor
        self.occ = jnp.asarray(
            build_occupancy_grid(np.asarray(build_pcd), occ_vox, cfg.occ_dilate)
        )

        rays = [
            make_frame_rays(
                rgbs[i],
                depths[i],
                masks[i] if masks is not None
                else (depths[i] != BAD_DEPTH * cfg.sc_factor),
                self.K,
                i,
                # Frame 0's (assumed-perfect) mask gets the big dilation;
                # its BAD_DEPTH ring rays supervise free space
                # (nerf_runner.py:276-286).
                dilate=(
                    cfg.first_frame_dilate if i == 0 else cfg.dilate_mask_size
                ),
            )
            for i in range(self.n_frames)
        ]
        rays_np = {
            k: np.concatenate([r[k] for r in rays]) for k in rays[0]
        }
        self._denoise_dropped = 0
        if cfg.denoise_depth_use_octree_cloud:
            rays_np = self._denoise_rays_octree_cloud(rays_np, build_pcd)
        self.rays = {k: jnp.asarray(v) for k, v in rays_np.items()}
        self.n_rays = int(self.rays["dir"].shape[0])
        logger.info("rays: %d over %d frames", self.n_rays, self.n_frames)

        self.grid_cfg = HashGridCfg(
            n_levels=cfg.num_levels,
            level_dim=cfg.feature_grid_dim,
            base_resolution=cfg.base_res,
            desired_resolution=cfg.finest_res,
            log2_hashmap_size=cfg.log2_hashmap_size,
            layout=cfg.grid_layout,
        )
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        input_ch = self.grid_cfg.out_dim
        input_ch_views = cfg.multires_views**2 + cfg.frame_features
        self.params = {
            "grid": init_hashgrid(k1, self.grid_cfg),
            "mlp": init_nerf_mlp(k2, input_ch, input_ch_views),
            "features": jax.random.normal(k3, (self.n_frames, cfg.frame_features)),
            "pose": jnp.zeros((self.n_frames, 6), jnp.float32),
        }
        self.c2w = jnp.asarray(self.poses.astype(np.float32))

        schedule = optax.exponential_decay(
            cfg.lrate, transition_steps=cfg.n_step, decay_rate=cfg.decay_rate
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.gradient_max_norm),
            optax.scale_by_adam(eps=1e-15),
            optax.scale_by_learning_rate(schedule),
        )
        self.opt_state = self.optimizer.init(self.params)
        self.global_step = 0

    def _denoise_rays_octree_cloud(self, rays_np, build_pcd):
        """Drop rays whose depth point is far from the build cloud —
        the reference's octree-cloud depth denoise
        (nerf_runner.py:179-196, ON in config_ycbv.yml:52): sensor-depth
        outliers train spurious SDF surfaces. Host-side cKDTree over the
        (normalized) fused cloud; rays whose observed 3D point is more
        than 2 cm (real scale) from it are removed entirely."""
        from scipy.spatial import cKDTree

        cfg = self.cfg
        depth = rays_np["depth"]
        sel = depth <= cfg.far * cfg.sc_factor  # BAD_DEPTH rays excluded
        if not sel.any() or len(np.asarray(build_pcd)) == 0:
            return rays_np
        pts_cam = rays_np["dir"][sel] * depth[sel, None]
        fids = rays_np["frame_id"][sel]
        tf = self.poses[fids]  # (n, 4, 4) cam_in_ob, normalized
        pts_w = np.einsum("nij,nj->ni", tf[:, :3, :3], pts_cam) + tf[:, :3, 3]
        dists, _ = cKDTree(np.asarray(build_pcd)).query(pts_w, k=1, workers=-1)
        bad = dists > 0.02 * cfg.sc_factor
        keep = np.ones(len(depth), bool)
        keep[np.nonzero(sel)[0][bad]] = False
        self._denoise_dropped = int(bad.sum())
        logger.info("octree-cloud denoise: dropped %d rays", self._denoise_dropped)
        return {k: v[keep] for k, v in rays_np.items()}

    # ----------------------------------------------------------- render
    #
    # NOTE: traced code must take the big device arrays (rays, occupancy
    # grid, c2w) as ARGUMENTS — closing over them would inline them as
    # HLO constants (hundreds of MB of compile payload).

    def _frame_tf(self, params, frame_ids, c2w):
        """Per-frame corrected cam_in_ob (nerf_runner.py:769-771)."""
        if self.cfg.optimize_poses:
            corr = pose_array_matrices(
                params["pose"],
                self.cfg.max_trans * self.cfg.sc_factor,
                self.cfg.max_rot,
            )
            return corr[frame_ids] @ c2w[frame_ids]
        return c2w[frame_ids]

    def _truncation(self, step):
        """Annealed truncation band in NORMALIZED units
        (nerf_runner.py:491-504; trunc_decay_type '' = constant)."""
        cfg = self.cfg
        if cfg.trunc_decay_type == "linear":
            tr = cfg.trunc_start - (cfg.trunc_start - cfg.trunc) * (
                step / cfg.n_step
            )
        elif cfg.trunc_decay_type == "exp":
            lamb = float(
                np.log(cfg.trunc / cfg.trunc_start) / (cfg.n_step / 4)
            )
            tr = jnp.maximum(cfg.trunc_start * jnp.exp(step * lamb), cfg.trunc)
        else:
            tr = jnp.float32(cfg.trunc)
        return tr * cfg.sc_factor

    def _render_rays(self, params, batch, key, occ, c2w, perturb=True,
                     trunc=None):
        """Returns dict: rgb (N,3), sdf (N,S), z_vals (N,S), valid (N,S)."""
        cfg = self.cfg
        dirs = batch["dir"]  # (N, 3) cam frame, z = 1
        depth = batch["depth"]  # (N,) normalized units
        frame_ids = batch["frame_id"]
        N = dirs.shape[0]
        tf = self._frame_tf(params, frame_ids, c2w)  # (N, 4, 4)

        rays_o_w = tf[:, :3, 3]
        rays_d_w = jnp.einsum("nij,nj->ni", tf[:, :3, :3], dirs)
        far_clip = cfg.far * cfg.sc_factor
        if trunc is None:
            trunc = cfg.trunc * cfg.sc_factor

        k1, k2, k3, k4 = jax.random.split(key, 4)
        z_occ, valid_occ = sample_occupied(
            occ,
            rays_o_w,
            rays_d_w,
            k1,
            cfg.n_samples,
            depth=depth,
            trunc=trunc,
            far_clip=far_clip,
            candidate_mult=cfg.candidate_mult,
        )
        if cfg.occ_keep_frac is not None and cfg.occ_keep_frac < 1.0:
            # Importance subsetting after the occupancy pass (the step
            # cost is points x hash-grid gathers; the gather itself is
            # at its descriptor floor — see README): drop the occupancy
            # samples farthest from the depth band.
            keep = max(1, int(round(cfg.n_samples * cfg.occ_keep_frac)))
            z_occ, valid_occ = subset_near_band(
                z_occ, valid_occ, depth, trunc, cfg.neg_trunc_ratio,
                keep, k4, near=cfg.near * cfg.sc_factor, far=far_clip,
            )

        z_all = z_occ
        valid_all = valid_occ
        if cfg.n_samples_around_depth > 0:
            S2 = cfg.n_samples_around_depth
            has_d = (depth >= cfg.near * cfg.sc_factor) & (depth <= far_clip)
            lo = depth - trunc
            hi = depth + trunc * cfg.neg_trunc_ratio
            u = (
                jnp.arange(S2, dtype=jnp.float32)[None]
                + (jax.random.uniform(k2, (N, S2)) if perturb else 0.5)
            ) / S2
            z_d = lo[:, None] + (hi - lo)[:, None] * u
            valid_d = has_d[:, None] & jnp.ones((N, S2), bool)
            z_all = jnp.concatenate([z_all, z_d], axis=-1)
            valid_all = jnp.concatenate([valid_all, valid_d], axis=-1)

        feats = params["features"][frame_ids]  # (N, F)
        view_w = rays_d_w / jnp.linalg.norm(rays_d_w, axis=-1, keepdims=True)
        sh = sh_encode(view_w, self.cfg.multires_views)  # (N, deg^2)
        view1 = jnp.concatenate([sh, feats], axis=-1)  # (N, V)
        dtype = jnp.bfloat16 if cfg.amp else jnp.float32

        def run_network(z_vals, valid):
            S = z_vals.shape[-1]
            pts_w = (
                rays_o_w[:, None] + rays_d_w[:, None] * z_vals[..., None]
            )  # (N, S, 3)
            valid = valid & jnp.all(jnp.abs(pts_w) <= 1.0, axis=-1)
            emb = hashgrid_encode(
                params["grid"], pts_w.reshape(-1, 3), self.grid_cfg
            ).reshape(N, S, -1)
            view_emb = view1[:, None].repeat(S, axis=1)
            raw = apply_nerf_mlp(
                params["mlp"], emb, view_emb, dtype=dtype
            )  # (N, S, 4)
            return raw, valid, pts_w

        def band_weights(z_vals, valid):
            # sdf2weights band rendering (nerf_runner.py:848-885).
            sdf_from_depth = (depth[:, None] - z_vals) / trunc
            w = jax.nn.sigmoid(sdf_from_depth * cfg.sdf_lambda) * jax.nn.sigmoid(
                -sdf_from_depth * cfg.sdf_lambda
            )
            band = (z_vals - depth[:, None] <= trunc * cfg.neg_trunc_ratio) & (
                z_vals - depth[:, None] >= -trunc
            )
            depth_ok = depth[:, None] <= far_clip
            w = jnp.where(band & depth_ok & valid, w, 0.0)
            return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-10)

        raw, valid_all, pts_w = run_network(z_all, valid_all)
        w = band_weights(z_all, valid_all)

        if cfg.n_importance > 0:
            # Hierarchical resampling (nerf_runner.py:806-829, single
            # shared model): draw from the first pass's weight pdf,
            # evaluate, merge z-sorted with the uniform set.
            z_mid = 0.5 * (z_all[:, 1:] + z_all[:, :-1])
            z_imp = jax.lax.stop_gradient(
                sample_pdf(z_mid, w[:, 1:-1], cfg.n_importance, k3, perturb)
            )
            valid_imp = jnp.broadcast_to(
                jnp.any(valid_all, axis=-1, keepdims=True),
                z_imp.shape,
            )
            raw_imp, valid_imp, _ = run_network(z_imp, valid_imp)
            z_all = jnp.concatenate([z_all, z_imp], axis=-1)
            order = jnp.argsort(z_all, axis=-1)
            z_all = jnp.take_along_axis(z_all, order, axis=-1)
            raw = jnp.take_along_axis(
                jnp.concatenate([raw, raw_imp], axis=1),
                order[..., None], axis=1,
            )
            valid_all = jnp.take_along_axis(
                jnp.concatenate([valid_all, valid_imp], axis=-1),
                order, axis=-1,
            )
            w = band_weights(z_all, valid_all)
            pts_w = (
                rays_o_w[:, None] + rays_d_w[:, None] * z_all[..., None]
            )

        sdf = raw[..., 3]
        rgb_logits = raw[..., :3]
        rgb = jnp.sum(w[..., None] * jax.nn.sigmoid(rgb_logits), axis=-2)

        out = {
            "rgb": rgb,
            "raw_rgb": rgb_logits,
            "sdf": sdf,
            "z_vals": z_all,
            "valid": valid_all,
            "weights": w,
        }
        if cfg.eikonal_weight > 0:
            # |grad sdf| via one vjp over the (independent-per-point)
            # field (nerf_runner.py:563-567 uses autograd normals).
            S = z_all.shape[-1]

            def sdf_sum(pw):
                emb = hashgrid_encode(
                    params["grid"], pw.reshape(-1, 3), self.grid_cfg
                ).reshape(N, S, -1)
                ve = view1[:, None].repeat(S, axis=1)
                return apply_nerf_mlp(
                    params["mlp"], emb, ve, dtype=dtype
                )[..., 3].sum()

            out["normals"] = jax.grad(sdf_sum)(pts_w)  # (N, S, 3)
        return out

    # ------------------------------------------------------------ losses

    def _loss(self, params, batch, key, occ, c2w, step=None):
        cfg = self.cfg
        trunc = (
            self._truncation(step)
            if step is not None
            else jnp.float32(cfg.trunc * cfg.sc_factor)
        )
        out = self._render_rays(
            params, batch, key, occ, c2w, perturb=True, trunc=trunc
        )
        sdf = out["sdf"]
        z_vals = out["z_vals"]
        valid = out["valid"]
        depth = batch["depth"]
        N, S = sdf.shape

        far_clip = cfg.far * cfg.sc_factor
        target_d = depth[:, None]

        valid_rays = jnp.any(valid, axis=-1)
        ray_w = jnp.where(batch["frame_id"] == 0, cfg.first_frame_weight, 1.0)
        ray_w = ray_w * valid_rays
        sample_w = ray_w[:, None] * valid

        rgb_loss = cfg.rgb_weight * jnp.mean(
            (out["rgb"] - batch["rgb"]) ** 2 * ray_w[:, None]
        )

        # masks (nerf_helpers.py:398-428)
        valid_depth = (target_d >= cfg.near * cfg.sc_factor) & (target_d <= far_clip)
        front = z_vals < target_d - trunc
        back = z_vals > target_d + trunc * cfg.neg_trunc_ratio
        sdf_mask = (~front) & (~back) & valid_depth

        fs_mask = (target_d > far_clip) & (sdf < cfg.fs_sdf)
        fs_loss = (
            jnp.mean(((sdf - cfg.fs_sdf) * fs_mask) ** 2 * sample_w) * 0.5 * cfg.fs_weight
        )
        empty_mask = front & (target_d <= far_clip) & (sdf < 1)
        empty_loss = jnp.mean(jnp.abs(sdf - 1) * empty_mask * sample_w) * cfg.empty_weight
        sdf_loss = (
            jnp.mean(((z_vals + sdf * trunc) * sdf_mask - target_d * sdf_mask) ** 2 * sample_w)
            * 0.5
            * cfg.trunc_weight
        )

        loss = rgb_loss + fs_loss + empty_loss + sdf_loss
        aux = {
            "rgb_loss": rgb_loss,
            "fs_loss": fs_loss,
            "empty_loss": empty_loss,
            "sdf_loss": sdf_loss,
        }

        if cfg.depth_weight > 0:
            # First-SDF-zero-crossing depth MSE (nerf_runner.py:540-547).
            signs = sdf[:, 1:] * sdf[:, :-1]
            crossing = signs < 0
            inds = jnp.argmax(crossing.astype(jnp.int32), axis=1)
            z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)
            dw = (
                ray_w[:, None]
                * (target_d <= far_clip)
                * jnp.any(crossing, axis=-1, keepdims=True)
            )
            depth_loss = (
                jnp.mean((z_min * dw - target_d * dw) ** 2) * cfg.depth_weight
            )
            loss = loss + depth_loss
            aux["depth_loss"] = depth_loss

        if cfg.fs_rgb_weight > 0:
            # Free-space color prior: predict white in front of the
            # surface (nerf_runner.py:558-561).
            fs_rgb_loss = jnp.mean(
                ((jax.nn.sigmoid(out["raw_rgb"]) - 1.0)
                 * front[..., None]) ** 2
                * sample_w[..., None]
            ) * cfg.fs_rgb_weight
            loss = loss + fs_rgb_loss
            aux["fs_rgb_loss"] = fs_rgb_loss

        if cfg.eikonal_weight > 0:
            # |grad sdf| = 1 inside the narrow band
            # (nerf_runner.py:563-567: mask sdf < 1).
            nrm = jnp.linalg.norm(out["normals"], axis=-1)
            m = (sdf < 1.0) & valid
            eik = jnp.sum(((nrm - 1.0) ** 2) * m) / (jnp.sum(m) + 1e-9)
            eikonal_loss = eik * cfg.eikonal_weight
            loss = loss + eikonal_loss
            aux["eikonal_loss"] = eikonal_loss

        if cfg.frame_features > 0:
            loss = loss + cfg.feature_reg_weight * jnp.mean(params["features"] ** 2)
        if cfg.optimize_poses and cfg.pose_reg_weight > 0:
            loss = loss + cfg.pose_reg_weight * jnp.linalg.norm(params["pose"][1:])
        return loss, aux

    def _make_train_step(self):
        optimizer = self.optimizer
        n_rand = self.cfg.n_rand

        def step(params, opt_state, rays, occ, c2w, key, step_i):
            k1, k2 = jax.random.split(key)
            n_rays = rays["dir"].shape[0]
            idx = jax.random.randint(k1, (n_rand,), 0, n_rays)
            batch = {k: v[idx] for k, v in rays.items()}
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, batch, k2, occ, c2w, step_i
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        return jax.jit(step)

    def _train_step(self, params, opt_state, key):
        if not hasattr(self, "_train_step_fn"):
            self._train_step_fn = self._make_train_step()
        return self._train_step_fn(
            params, opt_state, self.rays, self.occ, self.c2w, key,
            jnp.float32(self.global_step),
        )

    def train(
        self,
        seed: int = 0,
        ckpt_dir: str | None = None,
        i_weights: int = 500,
        artifact_dir: str | None = None,
        i_img: int = 500,
        i_mesh: int = 500,
        i_pose: int = 500,
        metric_sink=None,
    ):
        """Train loop with optional periodic orbax checkpoints
        (cadence like nerf_runner.py:593-594; resume via .resume()) and
        periodic image/mesh/pose artifact dumps (the reference's
        i_img/i_mesh/i_pose observability, nerf_runner.py:596-680).

        metric_sink: optional callable(step, {name: float}) — the
        counterpart of the reference's sacred `_run.log_scalar` hook
        (nerf_runner.py:648-650), called at the logging cadence."""
        key = jax.random.PRNGKey(seed)
        n = self.cfg.n_step + 1
        for it in range(self.global_step, n):
            # fold_in keeps per-step randomness reproducible across resumes
            sub = jax.random.fold_in(key, it)
            self.params, self.opt_state, loss, aux = self._train_step(
                self.params, self.opt_state, sub
            )
            self.global_step += 1
            if it % max(1, n // 10) == 0:
                logger.info(
                    "step %d/%d loss=%.4f rgb=%.4f sdf=%.4f fs=%.4f empty=%.4f",
                    it, n, float(loss), float(aux["rgb_loss"]),
                    float(aux["sdf_loss"]), float(aux["fs_loss"]),
                    float(aux["empty_loss"]),
                )
                if metric_sink is not None:
                    scalars = {"loss": float(loss)}
                    scalars.update({k: float(v) for k, v in aux.items()})
                    metric_sink(it, scalars)
            if ckpt_dir is not None and it > 0 and it % i_weights == 0:
                self.save_weights(ckpt_dir)
            if artifact_dir is not None and it > 0:
                self._dump_artifacts(artifact_dir, it, i_img, i_mesh, i_pose)
        if ckpt_dir is not None:
            self.save_weights(ckpt_dir)

    def _dump_artifacts(
        self, artifact_dir: str, it: int, i_img: int, i_mesh: int,
        i_pose: int = 0,
    ):
        """Periodic eval imagery + mesh + pose snapshots
        (nerf_runner.py:596-680)."""
        import os

        if i_pose > 0 and it % i_pose == 0:
            # Optimized per-frame cam_in_ob poses in real-world units
            # (the reference's i_pose dump, nerf_runner.py:652-656).
            os.makedirs(f"{artifact_dir}/pose", exist_ok=True)
            np.save(
                f"{artifact_dir}/pose/step_{it:07d}.npy",
                self.get_optimized_poses_in_real_world(),
            )
        if i_img > 0 and it % i_img == 0:
            import imageio.v2 as imageio

            os.makedirs(f"{artifact_dir}/image", exist_ok=True)
            rgb, depth = self.render_frame(0)
            canvas = np.concatenate(
                [rgb, np.repeat(depth[..., None] / max(depth.max(), 1e-6), 3, -1)],
                axis=1,
            )
            imageio.imwrite(
                f"{artifact_dir}/image/step_{it:07d}.png",
                (np.clip(canvas, 0, 1) * 255).astype(np.uint8),
            )
        if i_mesh > 0 and it % i_mesh == 0:
            mesh = self.extract_mesh(voxel_size=self.cfg.mesh_resolution)
            if len(mesh.vertices):
                os.makedirs(f"{artifact_dir}/mesh", exist_ok=True)
                self.mesh_to_real_world(mesh).export(
                    f"{artifact_dir}/mesh/step_{it:07d}.obj"
                )

    def save_weights(self, ckpt_dir: str):
        from ..utils.checkpoint import save_train_state

        save_train_state(
            ckpt_dir, self.global_step,
            {"params": self.params, "opt_state": self.opt_state},
        )

    def resume(self, ckpt_dir: str, step: int | None = None):
        """Restore params/optimizer and continue from the saved step —
        the resume path the reference never implemented (SURVEY.md §5.4)."""
        from ..utils.checkpoint import load_train_state

        step, state = load_train_state(
            ckpt_dir, step,
            template={"params": self.params, "opt_state": self.opt_state},
        )
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.global_step = step
        logger.info("resumed from step %d", step)

    def render_frame(self, frame_idx: int, chunk: int = 4096):
        """Render a full training view from the learned field — the eval
        imagery of nerf_runner.render_images (nerf_runner.py:432-489).

        Returns (rgb (H, W, 3) float, depth (H, W) normalized units) with
        zeros outside the frame's ray set.
        """
        rays_np = {k: np.asarray(v) for k, v in self.rays.items()}
        sel = rays_np["frame_id"] == frame_idx
        dirs = rays_np["dir"][sel]
        depth_gt = rays_np["depth"][sel]
        n = len(dirs)

        rgb_out = np.zeros((n, 3), np.float32)
        depth_out = np.zeros((n,), np.float32)

        @jax.jit
        def render_chunk(params, batch, occ, c2w):
            out = self._render_rays(
                params, batch, jax.random.PRNGKey(0), occ, c2w, perturb=False
            )
            # surface depth = first sdf sign change along sorted z
            order = jnp.argsort(out["z_vals"], axis=-1)
            z_s = jnp.take_along_axis(out["z_vals"], order, axis=-1)
            sdf_s = jnp.take_along_axis(out["sdf"], order, axis=-1)
            signs = sdf_s[:, 1:] * sdf_s[:, :-1]
            crossing = signs < 0
            first = jnp.argmax(crossing, axis=-1)
            has = jnp.any(crossing, axis=-1)
            zhit = jnp.take_along_axis(z_s, first[:, None], axis=1)[:, 0]
            zhit = jnp.where(has, zhit, self.cfg.far * self.cfg.sc_factor)
            return out["rgb"], zhit

        for s0 in range(0, n, chunk):
            e = min(s0 + chunk, n)
            pad = (-(e - s0)) % 256
            batch = {
                "dir": jnp.asarray(
                    np.concatenate([dirs[s0:e], np.zeros((pad, 3), np.float32)])
                ),
                "depth": jnp.asarray(
                    np.concatenate([depth_gt[s0:e], np.zeros((pad,), np.float32)])
                ),
                "frame_id": jnp.full((e - s0 + pad,), frame_idx, jnp.int32),
            }
            rgb_c, z_c = render_chunk(self.params, batch, self.occ, self.c2w)
            rgb_out[s0:e] = np.asarray(rgb_c)[: e - s0]
            depth_out[s0:e] = np.asarray(z_c)[: e - s0]

        rgb_full = np.zeros((self.H, self.W, 3), np.float32)
        depth_full = np.zeros((self.H, self.W), np.float32)
        u = np.round(dirs[:, 0] * self.K[0, 0] / dirs[:, 2] + self.K[0, 2]).astype(int)
        v = np.round(dirs[:, 1] * self.K[1, 1] / dirs[:, 2] + self.K[1, 2]).astype(int)
        ok = (u >= 0) & (u < self.W) & (v >= 0) & (v < self.H)
        rgb_full[v[ok], u[ok]] = rgb_out[ok]
        depth_full[v[ok], u[ok]] = depth_out[ok]
        return rgb_full, depth_full

    # ------------------------------------------------------ extraction

    def query_sdf_grid(self, voxel_size: float | None = None, chunk: int = 262144):
        """Dense SDF grid over [-1,1]^3 (occupancy-culled)."""
        cfg = self.cfg
        vs = (voxel_size or cfg.mesh_resolution) * cfg.sc_factor
        coords = np.arange(-1 + 0.5 * vs, 1.0, vs)
        G = len(coords)
        xx, yy, zz = np.meshgrid(coords, coords, coords, indexing="ij")
        pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)

        occ_mask = np.asarray(occupancy_lookup(self.occ, jnp.asarray(pts)))
        sdf = np.full(len(pts), 1.0, np.float32)  # empty space
        idxs = np.nonzero(occ_mask)[0]

        @jax.jit
        def q(grid, mlp, p):
            emb = hashgrid_encode(grid, p, self.grid_cfg)
            return apply_nerf_sdf(mlp, emb)

        for s in range(0, len(idxs), chunk):
            sel = idxs[s : s + chunk]
            p = jnp.asarray(pts[sel])
            pad = (-len(sel)) % 1024
            if pad:
                p = jnp.concatenate([p, jnp.zeros((pad, 3), jnp.float32)])
            vals = np.asarray(q(self.params["grid"], self.params["mlp"], p))[: len(sel)]
            sdf[sel] = vals
        return sdf.reshape(G, G, G), coords

    def extract_mesh(self, voxel_size: float | None = None, isolevel: float = 0.0) -> TriMesh:
        """Marching tetrahedra on the SDF grid (nerf_runner.py:1062-1118)."""
        sdf, coords = self.query_sdf_grid(voxel_size)
        vs = coords[1] - coords[0]
        verts, faces = marching_tetrahedra(
            sdf, iso=isolevel, spacing=(vs, vs, vs), origin=(coords[0],) * 3
        )
        return TriMesh(vertices=verts, faces=faces)

    def mesh_to_real_world(self, mesh: TriMesh) -> TriMesh:
        """Un-normalize + apply the optimized first-frame offset
        (nerf_helpers.py:215-250, CV convention — no GL flip)."""
        mesh = mesh.copy()
        mesh.vertices = mesh.vertices / self.cfg.sc_factor - np.asarray(
            self.cfg.translation
        ).reshape(1, 3)
        offset = self.get_pose_offset()
        mesh.vertices = mesh.vertices @ offset[:3, :3].T + offset[:3, 3]
        return mesh

    def get_optimized_poses_in_real_world(self):
        """Corrected cam_in_ob poses in meters (nerf_helpers.py:224-250)."""
        corr = np.asarray(
            pose_array_matrices(
                self.params["pose"],
                self.cfg.max_trans * self.cfg.sc_factor,
                self.cfg.max_rot,
            )
        )
        optimized = corr @ self.poses
        out = optimized.copy()
        out[:, :3, 3] /= self.cfg.sc_factor
        out[:, :3, 3] -= np.asarray(self.cfg.translation)
        return out

    def get_pose_offset(self):
        """Offset aligning the optimized first frame back to its original
        pose, applied to the mesh (nerf_helpers.py:244-249)."""
        original = self.poses.copy()
        original[:, :3, 3] /= self.cfg.sc_factor
        original[:, :3, 3] -= np.asarray(self.cfg.translation)
        optimized = self.get_optimized_poses_in_real_world()
        return np.linalg.inv(optimized[0]) @ original[0]
