"""Typed configuration tree for the estimator pipeline.

Single source of truth replacing the reference's three config mechanisms
(argparse + checkpoint OmegaConf + runtime-mutated YAML; SURVEY.md §5.6).
Frozen dataclasses are hashable, so they can be static args to jit.
"""
from __future__ import annotations

import dataclasses

from ..models.networks import RefineNetCfg, ScoreNetCfg


@dataclasses.dataclass(frozen=True)
class RasterCfg:
    """Rasterizer strategy knobs (see ops/rasterizer.py)."""

    method: str = "auto"  # auto | brute | binned | pallas
    tile: int = 32
    max_faces_per_tile: int = 512  # raise for dense meshes (overflow drops faces)
    cull_backfaces: bool = False  # exact speedup for closed, consistently wound meshes
    pose_block: int = 16
    # pallas only: per-tile capacity = rounds * max_faces_per_tile
    # (overflow beyond it is counted in RenderOutput.overflow)
    rounds: int = 4


@dataclasses.dataclass(frozen=True)
class RefinerCfg:
    net: RefineNetCfg = dataclasses.field(default_factory=RefineNetCfg)
    input_res: int = 160
    crop_ratio: float = 1.2
    # Delta parameterization — matches the released refiner checkpoint
    # semantics (predict_pose_refine.py:195-231):
    trans_rep: str = "tracknet"  # or "deepim"
    rot_rep: str = "axis_angle"  # or "6d"
    normalize_xyz: bool = True
    trans_normalizer: tuple[float, float, float] = (0.02, 0.02, 0.05)
    rot_normalizer: float = 0.34906585  # 20 degrees in radians
    xyz_invalid_z: float = 0.001  # PairH5Dataset threshold (h5_dataset.py:94)
    # 3 extra raw normal channels on A/B (c_in=9 nets; predict_score.py
    # :190-193 concat semantics). Released checkpoints use False.
    use_normal: bool = False
    compute_dtype: str = "bfloat16"
    raster: RasterCfg = dataclasses.field(default_factory=RasterCfg)


@dataclasses.dataclass(frozen=True)
class ScorerCfg:
    net: ScoreNetCfg = dataclasses.field(default_factory=ScoreNetCfg)
    input_res: int = 160
    crop_ratio: float = 1.2
    normalize_xyz: bool = True
    xyz_invalid_z: float = 0.1  # TripletH5Dataset threshold (h5_dataset.py:151)
    use_normal: bool = False  # see RefinerCfg.use_normal
    # "auto": network when scorer weights are provided, classical depth
    # alignment otherwise; or force "network" / "depth".
    mode: str = "auto"
    compute_dtype: str = "bfloat16"
    raster: RasterCfg = dataclasses.field(default_factory=RasterCfg)


@dataclasses.dataclass(frozen=True)
class EstimatorCfg:
    refiner: RefinerCfg = dataclasses.field(default_factory=RefinerCfg)
    scorer: ScorerCfg = dataclasses.field(default_factory=ScorerCfg)
    min_n_views: int = 40
    inplane_step_deg: float = 60.0
    cluster_angle_deg: float = 30.0
    rot_grid_pad: int = 4  # pad hypothesis count to a multiple of this
    max_tex_size: int | None = None
    # Decimate the RENDER mesh below this face count (None = never).
    # 160x160 crops resolve nothing below ~1/160 of the object extent, so
    # this bounds rasterization cost on dense meshes without accuracy loss.
    max_render_faces: int | None = 8192
    # Bake textures to per-vertex colors for hypothesis rendering:
    # visually equivalent at crop scale and ~2x faster (per-pixel texture
    # gathers leave the hot loop). False = exact per-pixel texturing.
    vertex_color_render: bool = True
    zfar: float = float("inf")
    # Tracking ROI streaming: crop each tracking frame on the host to a
    # static-size square window around the last fetched pose before
    # upload, shifting K's principal point by the window offset (an
    # exact reparameterization — all pipeline geometry flows through K).
    # Cuts per-frame host->device transfer several-fold, which dominates
    # end-to-end tracking latency when the chip sits behind a network
    # tunnel. The window size is the projected crop extent times
    # track_roi_margin (slack for inter-frame motion + the lag of the
    # async fetch), rounded up to a multiple of 64 so jit buckets stay
    # coarse. track_roi=False streams full frames.
    track_roi: bool = True
    track_roi_margin: float = 1.8
    # Pack each tracking frame (rgb u8 + depth as u16 0.25 mm fixed point
    # + ROI offset) into ONE flat buffer per frame before upload: a single
    # host->device transfer instead of three, and ~45% fewer bytes.
    # Quantization (<=0.125 mm) is far below sensor noise; False streams
    # f32 depth unpacked.
    track_pack: bool = True
    # Same wire format for register() uploads (rgb u8 + depth u16 + mask
    # bit plane): one transfer instead of three at ~64% of the bytes —
    # the r4 profile pinned ~45-60 ms of each register on host/tunnel
    # upload. False streams rgb/f32 depth/mask as separate transfers.
    register_pack: bool = True
    # Ship only a detection-sized window for register() uploads (needs
    # register_pack): a square around the mask covering the projected
    # crop extent x register_roi_margin, K shifted on device — the
    # same exact viewport reparameterization as track_roi. After the
    # run, the winner's crop containment is verified on host and the
    # frame transparently re-runs full-frame on violation (mirrors the
    # tracking recovery). ~1/3 the upload bytes on a 640x480 frame with
    # a mid-sized object. False ships the full frame.
    register_roi: bool = True
    register_roi_margin: float = 1.8
    # Hypothesis funneling (OFF by default = reference-parity register):
    # refine ALL hypotheses for `prune_after_iter` iterations, rank them
    # with the weights-free depth-alignment score, then run the
    # remaining iterations + the network scorer on only the top
    # `prune_keep` survivors. Cuts most of the per-iteration render +
    # RefineNet cost once the obviously-wrong orientations are dropped;
    # an approximation (a non-survivor can no longer win), validated on
    # synthetic scenes in tests/test_pipeline.py.
    prune_after_iter: int | None = None
    prune_keep: int = 64

    def fast_register(self) -> "EstimatorCfg":
        """The documented funneled-register preset: refine all 252
        hypotheses for 2 iterations, keep the top 64 by depth
        alignment, and spend iterations 3-5 + the network scorer on
        survivors only.

        Throughput: measured alongside the parity register in every
        bench run — see `register_hyp_per_s_funneled` in the newest
        committed BENCH_r*.json (typically ~1.5-1.6x the parity
        number). Accuracy is CI-gated: on the trained-net synthetic
        suites the funneled register's ADD-S must stay within 2 mm of
        the full register (tests/test_training.py). The pruning rank
        uses the weights-free depth-alignment score, so a hypothesis
        the RefineNet could still have rescued in iterations 3-5 can
        be lost — keep the parity default for benchmark comparisons.
        """
        return dataclasses.replace(
            self, prune_after_iter=2, prune_keep=64
        )
