"""Configuration tree for every pipeline stage.

The reference scatters configuration over per-script argparse, DSGN's
`Experimenter` config and Stereo R-CNN's global easydict
(`/root/reference/attack/DSGN/pgd_attack.py:35-56`,
`/root/reference/attack/Stereo-RCNN/predict_and_save_pgd.py:201-209`).
Here every stage has one frozen dataclass; CLIs override fields.

All magic constants that define behavioral parity with the reference are
collected here with their source citations (SURVEY.md §6).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# ---------------------------------------------------------------------------
# Normalization conventions
# ---------------------------------------------------------------------------

# DSGN pipeline: RGB in [0,1], ImageNet normalization
# (/root/reference/attack/DSGN/pgd_attack.py:153-154)
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)

# Stereo R-CNN pipeline: BGR pixels in [0,255], mean subtraction
# (/root/reference/attack/Stereo-RCNN/pgd_attack.py:189-207)
SRCNN_PIXEL_MEANS_BGR: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)


@dataclass(frozen=True)
class DSGNInputConfig:
    """DSGN input convention (/root/reference/attack/DSGN/patch_attack.py:154-155,318-320)."""
    height: int = 384
    width: int = 1248
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD


@dataclass(frozen=True)
class SRCNNInputConfig:
    """Stereo R-CNN input convention.

    The reference resizes to scale 600/min-side and pads; its attack scripts
    operate at 600x1987 (/root/reference/attack/Stereo-RCNN/patch_attack.py:170-171).
    TPU build pads to a static MXU-friendly shape.
    """
    height: int = 600
    width: int = 1984  # 1987 rounded down to a multiple of 32 for static FPN strides
    pixel_means_bgr: Tuple[float, float, float] = SRCNN_PIXEL_MEANS_BGR


# ---------------------------------------------------------------------------
# Detector configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StereoRCNNConfig:
    """Stereo R-CNN (Flax) — capability per /root/reference/attack/Stereo-RCNN/stereo_rcnn.py."""
    num_classes: int = 2                     # background + Car
    backbone_blocks: Tuple[int, ...] = (3, 4, 23, 3)   # resnet101
    backbone_width: int = 64
    fpn_channels: int = 256
    pooling_size: int = 7                    # cfg.POOLING_SIZE
    kpts_grid: int = 28                      # cfg.KPTS_GRID
    kpts_convs: int = 4                      # upstream RCNN_kpts conv stack
    dtype: str = "float32"                   # "bfloat16": bf16 conv trunk
                                             # (fp32 params/decode/losses).
                                             # CLIs default to bf16 (attack
                                             # AND predict — equivalence
                                             # tested); --fp32 keeps the
                                             # checkpoint-parity trunk
    stem_method: str = "conv7"               # "s2d": exact space-to-depth
                                             # stem (models.resnet), same
                                             # params, measured 28% faster
                                             # on the attack (r3 bench:
                                             # 10.44 vs 8.14 it/s). Attack
                                             # CLIs default to s2d (the
                                             # model falls back to conv7 on
                                             # odd H/W); --stem overrides
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_scales: Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0, 512.0)  # p2..p6
    feat_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    # static-shape proposal machinery
    pre_nms_top_n: int = 2000
    post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 8.0
    # anchor-target sampling
    rpn_batch_size: int = 256
    rpn_fg_fraction: float = 0.5
    rpn_positive_overlap: float = 0.7
    rpn_negative_overlap: float = 0.3
    # proposal-target sampling
    roi_batch_size: int = 128
    roi_fg_fraction: float = 0.25
    roi_fg_thresh: float = 0.5
    roi_bg_thresh_hi: float = 0.5
    roi_bg_thresh_lo: float = 0.0
    bbox_normalize_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    max_gt_boxes: int = 30                   # MAX_NUM_GT_BOXES padding (roibatchLoader.py:63-90)
    # test-time
    score_thresh: float = 0.05               # predict_and_save_pgd.py:115
    vis_thresh: float = 0.7                  # predict_and_save_pgd.py:116
    test_nms_thresh: float = 0.4             # cfg.TEST.NMS
    max_detections: int = 50
    input: SRCNNInputConfig = field(default_factory=SRCNNInputConfig)

    @staticmethod
    def tiny() -> "StereoRCNNConfig":
        """Small config for CPU tests: shallow backbone, tiny roi counts."""
        return StereoRCNNConfig(
            backbone_blocks=(1, 1, 1, 1), backbone_width=8, fpn_channels=16,
            pre_nms_top_n=128, post_nms_top_n=32, rpn_batch_size=32,
            roi_batch_size=16, max_gt_boxes=8, max_detections=8,
            input=SRCNNInputConfig(height=96, width=320))


@dataclass(frozen=True)
class DSGNConfig:
    """DSGN (Flax) — TPU-first re-design of the StereoNet capability
    (/root/reference/attack/DSGN/pgd_attack.py:136,308).

    Sizes are config-driven: `tiny()` for tests, default sized for one
    v5e chip in bf16, `full()` for DSGN-paper-scale volumes.
    """
    height: int = 384
    width: int = 1248
    feature_channels: int = 32               # stereo feature dim at stride 4
    feature_stride: int = 4
    # plane-sweep volume
    num_depth_planes: int = 64
    min_depth: float = 2.0
    max_depth: float = 59.6
    psv_channels: int = 32                   # 3D conv channels in PSV hourglass
    num_depth_preds: int = 3                 # multi-scale depth outputs; loss weights below
    disp_loss_weights: Tuple[float, ...] = (0.5, 0.7, 1.0)  # pgd_attack.py:314
    # 3D geometric volume (BEV voxel grid, camera frame: x right, z forward)
    voxel_x_min: float = -30.4
    voxel_x_max: float = 30.4
    voxel_z_min: float = 2.0
    voxel_z_max: float = 59.6
    voxel_y_min: float = -1.0
    voxel_y_max: float = 3.0
    num_voxels_x: int = 152
    num_voxels_z: int = 144
    num_voxels_y: int = 8
    gv_channels: int = 32
    # detection head (FCOS3D-style on BEV)
    num_classes: int = 1                     # Car
    head_channels: int = 64
    # loss
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    centerness_radius: float = 1.5           # positives within radius (in BEV cells) of box center
    # postprocessor (make_fcos3d_postprocessor parity)
    score_thresh: float = 0.1
    nms_thresh: float = 0.3                  # rotated BEV NMS
    max_detections: int = 50
    input: DSGNInputConfig = field(default_factory=DSGNInputConfig)
    # loss switches mirroring cfg.loss_disp / cfg.RPN3D_ENABLE
    loss_disp: bool = True
    rpn3d_enable: bool = True
    dtype: str = "bfloat16"
    # rematerialize the 3D hourglass in the backward pass: trades ~10%
    # throughput for HBM headroom — enable for big volumes / large batch
    remat: bool = False
    # PSV warp implementation: "einsum" (tent-weight matmuls, default) or
    # "pallas" (streaming shift kernel). Both are exact lerp-gather
    # equivalents. Measured at PAPER SCALE on one v5e (r3, fetch-synced
    # clock): einsum 119.6 ms/attack-iter end-to-end vs pallas 175.3 —
    # the einsum's O(D*W^2*H*C) extra FLOPs ride an otherwise idle MXU,
    # while the kernel's 8-way sublane-offset switch and C=32 lane
    # underutilization dominate its bandwidth savings. The kernel wins
    # when C >= 128 or the MXU is busy (larger models).
    psv_method: str = "einsum"
    # depth-score head formulation: "tap27" (default) computes the
    # 1-channel 3^3 score conv as a C->27 tap-projection matmul + static
    # slice-adds (models/dsgn.py Score3D; the N=1 conv cannot tile the
    # MXU — measured 9.2 vs 20.5 ms fwd+bwd isolated, and 11.20 vs 9.73
    # it/s on the paper-scale attack headline); "conv3" keeps the plain
    # conv. Parameters are interchangeable between the two.
    score_method: str = "tap27"
    # depth-stage formulation of the (2+1)D volume convs: "transpose"
    # runs the D conv as a 1D conv on (B*H*W, D, C) — XLA's best own
    # lowering, but it materializes two full-volume layout copies per
    # conv per pass (~7 GB/iter at paper scale); "pallas" fuses D-conv +
    # frozen BN + ReLU into one kernel that reads the volume once in its
    # native layout (ops/pallas_depthconv.py; stride-2 encoder blocks
    # keep the transpose form either way).
    depthconv_method: str = "transpose"
    # checkpoint-compat assembly only (models/dsgn_compat.py): how its
    # upstream-topology dense 3x3x3 convs are computed. "slice2d" = three
    # depth-sliced 2D convs (ops/conv3d_slice2d.py — same function, same
    # parameters, MXU-tiled; measured 5.51 vs 4.18 attack-iters/s on a
    # v5e at paper scale, BENCH_r03); "concat" = ONE 2D conv over the
    # depth-tap concat (3C input channels tile the MXU's K dimension
    # better at these widths); "xla" = plain Conv3D lowering. All three
    # are checkpoint-interchangeable (tests/test_dsgn_compat.py).
    compat_conv3d_method: str = "slice2d"

    @staticmethod
    def tiny() -> "DSGNConfig":
        return DSGNConfig(
            height=96, width=320, feature_channels=8, num_depth_planes=16,
            psv_channels=8, gv_channels=8, head_channels=16,
            num_voxels_x=40, num_voxels_z=36, num_voxels_y=4,
            input=DSGNInputConfig(height=96, width=320),
        )

    @staticmethod
    def full(remat: bool = False) -> "DSGNConfig":
        """Paper-scale volumes. remat=False keeps the hourglass activations
        resident (~5 GB at bf16) — measured 24% faster fwd+bwd; pass
        remat=True on HBM-constrained chips (e.g. 16 GB v5e)."""
        return DSGNConfig(
            feature_channels=32, num_depth_planes=96,
            num_voxels_x=304, num_voxels_z=288, num_voxels_y=10,
            remat=remat,
        )


# ---------------------------------------------------------------------------
# Attack configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PGDConfig:
    """PGD L-inf defaults.

    DSGN: iter 4, alpha 1/255, eps 0.3 in [0,1] space
    (/root/reference/attack/DSGN/pgd_attack.py:53-55).
    Stereo R-CNN: iter 4, alpha 1.0, eps 255*0.3 in pixel space
    (/root/reference/attack/Stereo-RCNN/pgd_attack.py:42-44,56-57).
    """
    num_iters: int = 4
    alpha: float = 1.0 / 255.0
    eps: float = 0.3
    pixel_min: float = 0.0
    pixel_max: float = 1.0
    save_intermediate: bool = True


@dataclass(frozen=True)
class PatchConfig:
    """Universal circular patch defaults.

    DSGN: eps 8/255, iters 2/batch, epochs 80, ratio 0.2, step 0.5*1e3*g
    (/root/reference/attack/DSGN/patch_attack.py:53-56,279,427-430).
    SRCNN: eps 0.1, iters 2, epochs 40, ratio 0.1
    (/root/reference/attack/Stereo-RCNN/patch_attack.py:44-48).
    """
    ratio: float = 0.2
    eps: float = 8.0 / 255.0
    iters_per_batch: int = 2
    epochs: int = 80
    step_scale: float = 0.5 * 1e3
    # placement: row in [0.4*H, H-r-1]; col in [0.2,0.8]*W
    # (/root/reference/attack/DSGN/patch_attack.py:237-243)
    row_band: Tuple[float, float] = (0.4, 1.0)
    col_band: Tuple[float, float] = (0.2, 0.8)
    # right-image center shift: -40*1.6 px (patch_attack.py:243)
    disparity_shift: float = -64.0
    # DSGN targeted ghost car (patch_attack.py:341-354)
    ghost_box2d: Tuple[float, float, float, float] = (569.33, 180.88, 613.91, 225.02)
    ghost_box3d: Tuple[float, ...] = (1.65, 1.67, 3.64, -0.78, 1.98, 29.11, -1.60)


# Patch placement bands at eval time
# (/root/reference/attack/DSGN/predict_and_save_patch.py:361-375)
PLACEMENT_BANDS = {
    "random": (0.2, 0.8),
    "sp_left": (0.2, 0.4),
    "sp_straight": (0.4, 0.6),
    "sp_right": (0.6, 0.8),
}


# ---------------------------------------------------------------------------
# Classifier configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RoadTypeConfig:
    """highway(1)/street(0) classifier (/root/reference/driving_constraint/Model.py:19-27)."""
    image_size: int = 224
    mean: Tuple[float, float, float] = (0.3775, 0.3923, 0.3839)
    std: Tuple[float, float, float] = (0.3110, 0.3154, 0.3180)
    lr: float = 1e-3
    lr_milestones: Tuple[int, ...] = (5, 10, 15)
    lr_gamma: float = 0.1
    dropout: float = 0.5
    epochs: int = 20
    batch_size: int = 32
    ckpt_every: int = 5


@dataclass(frozen=True)
class DynamicVehicleConfig:
    """moving(1)/static(0) crop classifier (/root/reference/dynamic_vehicles/Model.py:19-31)."""
    image_size: int = 224
    mean: Tuple[float, float, float] = (0.3091, 0.3181, 0.3248)
    std: Tuple[float, float, float] = (0.2328, 0.2308, 0.2337)
    lr: float = 1e-6
    lr_halve_epochs: Tuple[int, ...] = (6, 10)
    dropout: float = 0.1
    epochs: int = 12
    batch_size: int = 32
    crop_margin: int = 4                     # crop side = max(w,h)+4 (crop_image.py:60-72)


# ---------------------------------------------------------------------------
# Safety-evaluation configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ScenarioConfig:
    """Scenario conversion (/root/reference/evaluation/convert_gt_scenarios.py:47-51,127-139)."""
    street_vmin: float = 6.0
    street_vmax: float = 8.0
    highway_vmin: float = 11.0
    highway_vmax: float = 13.0
    dt: float = 0.1
    dynamic_rollout_steps: int = 19
    obstacle_classes: Tuple[str, ...] = ("Car", "Van", "Truck", "Misc")


@dataclass(frozen=True)
class PlannerConfig:
    """A* over BMW320i KS motion primitives (/root/reference/evaluation/plan_motion.py:36-37,113-118)."""
    dt: float = 0.1
    primitive_duration: float = 0.5
    steering_min: float = -1.066
    steering_max: float = 1.066
    steering_step: float = 0.36
    street_v: Tuple[float, float, float] = (6.0, 8.0, 0.0)    # vmin, vmax, vstep(0 => endpoints)
    highway_v: Tuple[float, float, float] = (11.0, 13.0, 2.0)
    max_tree_depth: int = 100
    max_expansions: int = 20000
    # visited-set duplicate-detection bucket sizes (x/y meters, psi/sa
    # radians, v m/s). Coarse buckets prune aggressively (fast); finer
    # buckets trade time for completeness — the r4 planner-failure triage
    # re-ran failing scenarios with these tightened (PARITY.md).
    visited_xy: float = 0.1
    visited_angle: float = 0.02
    visited_v: float = 0.1


@dataclass(frozen=True)
class PipelineConfig:
    dsgn: DSGNConfig = field(default_factory=DSGNConfig)
    srcnn: StereoRCNNConfig = field(default_factory=StereoRCNNConfig)
    pgd: PGDConfig = field(default_factory=PGDConfig)
    patch: PatchConfig = field(default_factory=PatchConfig)
    road_type: RoadTypeConfig = field(default_factory=RoadTypeConfig)
    dynamic_vehicle: DynamicVehicleConfig = field(default_factory=DynamicVehicleConfig)
    scenario: ScenarioConfig = field(default_factory=ScenarioConfig)
    planner: PlannerConfig = field(default_factory=PlannerConfig)
