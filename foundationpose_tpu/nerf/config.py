"""Neural-object-field configuration (typed version of the reference's
bundlesdf/config_ycbv.yml / config_linemod.yml — same field names and
defaults where they survive the redesign)."""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class NerfCfg:
    # training
    n_step: int = 1000
    n_rand: int = 2048  # rays per batch
    lrate: float = 0.01
    decay_rate: float = 0.1
    amp: bool = True  # bf16 compute for the MLP
    gradient_max_norm: float = 0.1

    # sampling
    n_samples: int = 128
    n_samples_around_depth: int = 128
    candidate_mult: int = 4  # occupancy-sampling candidates per kept sample
    # Keep only this fraction of the occupancy samples per ray — the
    # ones nearest the depth supervision band (ties inside the band
    # break uniformly at random); None keeps all. The step cost is
    # dominated by hash-grid gathers, which scale with rays x samples,
    # so 0.75 drops ~12.5% of the points (the around-depth half is
    # always in-band) at the price of thinner free-space supervision
    # far from the surface. Quality A/B gated in tests/test_nerf.py.
    occ_keep_frac: float | None = None
    near: float = 0.1
    far: float = 2.0

    # hash grid
    num_levels: int = 16
    feature_grid_dim: int = 2
    log2_hashmap_size: int = 22
    base_res: int = 32
    finest_res: int = 512  # 256 for the linemod config
    # "oct" = TPU-native 8-corner-row layout (one gather descriptor per
    # point-level, z-scrambled hash); "quad" = 4-corner rows (2 fetches);
    # "cuda" = torch-ngp index-exact hashing (ops/hashgrid.py docstring).
    grid_layout: str = "oct"

    # SH view encoding
    multires_views: int = 3  # SH degree

    # occupancy grid (replaces the kaolin octree)
    occ_voxel_size: float = 0.02  # octree_raytracing_voxel_size (normalized units x sc)
    occ_dilate: int = 1
    # drop rays whose depth point is >2 cm from the fused build cloud
    # (nerf_runner.py:179-196; ON in config_ycbv.yml:52)
    denoise_depth_use_octree_cloud: bool = True

    # SDF losses
    rgb_weight: float = 100.0  # 1 for linemod config
    trunc: float = 0.01  # meters
    sdf_lambda: float = 5.0
    neg_trunc_ratio: float = 1.0
    fs_weight: float = 100.0  # 1000 for linemod config
    empty_weight: float = 1.0
    trunc_weight: float = 6000.0
    fs_sdf: float = 1.0
    feature_reg_weight: float = 0.1
    pose_reg_weight: float = 0.0
    first_frame_weight: float = 1.0

    # optional paths the reference carries but ships OFF
    # (config_ycbv.yml:20-21,66-71,75,84)
    trunc_start: float = 0.01  # annealing start (meters)
    trunc_decay_type: str = ""  # "", "linear", "exp" (nerf_runner.py:491-504)
    depth_weight: float = 0.0  # first-SDF-crossing depth MSE (:540-547)
    eikonal_weight: float = 0.0  # |grad sdf| = 1 regularizer (:563-567)
    fs_rgb_weight: float = 0.0  # white-color free-space rgb loss (:558-561)
    n_importance: int = 0  # hierarchical resampling (:806-829)

    # per-frame corrections
    frame_features: int = 2
    optimize_poses: bool = True
    max_trans: float = 0.02  # meters
    max_rot: float = 10.0  # degrees

    # mesh extraction / texture
    mesh_resolution: float = 0.003  # meters
    tex_res: int = 1024
    # views blended per face in the texture bake, angle-weighted
    # (reference _CHOOSE_TOP_N = 4, nerf_runner.py:1174; 1 = best-view only)
    tex_top_views: int = 4
    rays_valid_depth_only: bool = True
    dilate_mask_size: int = 0
    # Frame 0's mask is assumed perfect; the reference dilates it with a
    # 100 px kernel and keeps the ring's (BAD_DEPTH) rays as free-space
    # supervision (nerf_runner.py:276-286). Later frames use
    # dilate_mask_size (the reference hardcodes 60//down_scale_ratio).
    first_frame_dilate: int = 100

    # scene normalization (filled at runtime like the reference's
    # cfg['sc_factor']/cfg['translation'], run_nerf.py:32-33)
    sc_factor: float = 1.0
    translation: tuple[float, float, float] = (0.0, 0.0, 0.0)

    # dbscan
    dbscan_eps: float = 0.01
    dbscan_min_samples: int = 1


LINEMOD_OVERRIDES = dict(finest_res=256, rgb_weight=1.0, fs_weight=1000.0)

# Reduced-sampling preset for single-chip TPU training: the per-step
# cost is dominated by HBM random gathers into the hash table, which
# scale with rays x samples; depth-guided sampling keeps supervision
# quality at ~1/4 the points (reference-parity settings run 0.456
# s/step with the oct grid layout; this preset roughly quarters that).
TPU_FAST_OVERRIDES = dict(n_rand=1024, n_samples=64, n_samples_around_depth=96)
