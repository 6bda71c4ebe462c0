"""Typed configuration for the whole framework.

One config tree covers train + infer + postprocess, replacing the reference's
scattered dict/constants (``train.py:724-781`` RECOMMENDED_CFG,
``ui_infer_rectangle.py:39-49``, ``ui_infer_quadrilateral.py:36-50``,
``infer_pth_gui.py:8-15``).  The *compat presets* reproduce the reference's
exact defaults, including the places where the reference disagrees with
itself (BIN_THRESH 0.50 for the rect GUI vs 0.45 for the quad GUI, and the
three letterbox conventions — see ``LetterboxMode``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

# ImageNet statistics used by A.Normalize in the reference (train.py:108-109)
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)

# Image extensions accepted by the reference scanner (train.py:30)
IMG_EXTS: Tuple[str, ...] = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")


class LetterboxMode(str, enum.Enum):
    """The reference uses three inconsistent letterbox conventions (SURVEY §3.3).

    - CENTER_NO_UPSCALE: PySide6 GUIs — centered pad, never upscales
      (``ui_infer_rectangle.py:225-246``: scale = min(size/max(h,w), 1.0)).
    - CENTER_UPSCALE: training pipeline — A.LongestMaxSize + centered
      PadIfNeeded, upscaling allowed (``train.py:70-75``).
    - CORNER_UPSCALE: quick Tk viewer — top-left anchored pad (right/bottom
      only), upscaling allowed (``infer_pth_gui.py:17-24``).
    """

    CENTER_NO_UPSCALE = "center_no_upscale"
    CENTER_UPSCALE = "center_upscale"
    CORNER_UPSCALE = "corner_upscale"


class FitMode(str, enum.Enum):
    """Geometry fit for each detected component.

    RECT reproduces ``cv2.minAreaRect`` (ui_infer_rectangle.py:346-354);
    QUAD reproduces the robust quadrilateral fit
    (ui_infer_quadrilateral.py:331-417)."""

    RECT = "rect"
    QUAD = "quad"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Flax U-Net matching ``smp.Unet(encoder, classes=1, activation=None)``
    as constructed at train.py:357-379."""

    encoder: str = "resnet34"
    encoder_weights: Optional[str] = "imagenet"  # path to a .pth / None
    in_channels: int = 3
    classes: int = 1
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    # TPU compute policy: bf16 activations/compute, f32 params & BN stats.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """Geometry post-processing. Defaults follow ui_infer_rectangle.py:39-49;
    the quad compat preset uses BIN_THRESH=0.45 + fit_outset_px=2
    (ui_infer_quadrilateral.py:36-50, :433)."""

    fit: FitMode = FitMode.RECT
    bin_thresh: float = 0.50
    min_area_frac: float = 0.0008       # MIN_AREA_FRAC; floor of 200 px applied
    min_area_floor: int = 200
    morph_kernel: int = 3               # ellipse structuring element
    open_iter: int = 1
    close_iter: int = 1
    fit_outset_px: int = 0              # quad GUI uses 2 (fit-only dilation)
    max_components: int = 8             # static component budget (TPU shapes)
    cc_max_iters: int = 64              # hook+jump fixpoint cap for labeling
    # Connected-components implementation:
    #   "runs"  — row-run compression + run-graph fixpoint (default; ~an
    #             order of magnitude faster on TPU, exact while every row
    #             has <= max_runs_per_row foreground runs, which morphology
    #             guarantees for real masks)
    #   "pixel" — per-pixel segmented doubling scans (exact for arbitrary
    #             inputs; the round-1 implementation)
    cc_impl: str = "runs"
    # Run-table bound: work scales ~linearly with it (measured 28.6 / 43 /
    # 90 ms per batch-64 at 16/32/64).  16 covers every post-morphology
    # mask; inputs that exceed it raise PostprocessResult.overflow and
    # InferenceEngine.detect reroutes them through the exact pixel labeler,
    # so a tight bound is safe (round-3 change; was 64 with silent drops).
    max_runs_per_row: int = 16
    # Angle scan resolution for the min-area-rect search.
    rect_coarse_angles: int = 192
    rect_refine_angles: int = 64


@dataclasses.dataclass(frozen=True)
class HVConfig:
    """Vickers hardness HV = 1.8544 * F / d^2 (d in mm, F in kgf).

    The reference stops at pixel diagonals (ui_infer_rectangle.py:368-377);
    HV is the one-line extension demanded by BASELINE.json. Calibration
    um_per_px and force are inputs the reference never had."""

    force_kgf: float = 1.0
    um_per_px: float = 1.0


@dataclasses.dataclass(frozen=True)
class InferConfig:
    img_size: int = 512
    letterbox: LetterboxMode = LetterboxMode.CENTER_NO_UPSCALE
    batch_size: int = 8
    post: PostprocessConfig = dataclasses.field(default_factory=PostprocessConfig)
    hv: HVConfig = dataclasses.field(default_factory=HVConfig)
    # Tiled high-res mode (BASELINE config 4): fixed tiles with overlap blend.
    tile_size: int = 512
    tile_overlap: int = 64


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Faithful re-parameterisation of the albumentations pipeline at
    train.py:67-113 (probabilities and parameter ranges)."""

    orient_p: float = 0.8               # OneOf{HFlip,VFlip,Rot90} (train.py:82-86)
    rotate_p: float = 0.6               # A.Rotate(limit=180) (train.py:90)
    rotate_limit_deg: float = 180.0
    photo_p: float = 0.8                # OneOf{BC, CLAHE, Blur} (train.py:97-101)
    brightness_limit: float = 0.2       # A.RandomBrightnessContrast defaults
    contrast_limit: float = 0.2
    clahe_clip_limit: float = 2.0       # A.CLAHE(clip_limit=2.0, 8x8)
    clahe_grid: int = 8
    blur_limit: Tuple[int, int] = (3, 5)  # A.GaussianBlur(blur_limit=(3,5))
    noise_p: float = 0.3                # A.GaussNoise(p=0.3)
    noise_var_limit: Tuple[float, float] = (10.0, 50.0)
    # TPU-native extension (no reference equivalent): random isotropic scale
    # jitter about the image center, drawn from [1-scale_limit, 1+scale_limit].
    # Off by default so the compat preset reproduces train.py:67-113 exactly;
    # turning it on improves generalization across indentation sizes and is
    # what lets one checkpoint serve both letterbox-512 and tiled native-res
    # inference (BASELINE config 4).
    scale_p: float = 0.0
    scale_limit: float = 0.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Compat preset == RECOMMENDED_CFG (train.py:724-781)."""

    data: str = "data"
    img_size: int = 512
    epochs: int = 500
    batch: int = 8
    lr: float = 5e-5
    weight_decay: float = 1e-4          # train.py:606
    encoder: str = "resnet34"
    encoder_weights: Optional[str] = "imagenet"
    val_ratio: float = 0.1
    out: str = "runs/unet_r34_512"
    seed: int = 42
    dump_all_val: bool = True
    dump_all_train: bool = False
    early_stop_patience: Optional[int] = None
    augment: AugmentConfig = dataclasses.field(default_factory=AugmentConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    # TPU-native extensions (no reference equivalent):
    num_devices: Optional[int] = None   # None = all; DP sharding over mesh
    donate: bool = True
    log_every: int = 0                  # 0 = per-epoch printing only
    profile_dir: Optional[str] = None   # jax.profiler trace of epoch 1
    checkpoint_every: int = 1           # write last.ckpt/.pth every N epochs
                                        # (1 == reference behavior; raise to
                                        # amortize host serialization)
    resume: bool = False                # continue from <out>/last.ckpt
    ema_decay: float = 0.0              # 0 = off; e.g. 0.999 evaluates and
                                        # checkpoints an exponential moving
                                        # average of params + BN stats
    # Hard-example oversampling: each (stem_substring, extra_repeats) entry
    # appends every matching TRAIN sample extra_repeats more times to each
    # epoch's index stream (val untouched).  No reference equivalent; used to
    # upweight the etched-texture material family the val tail concentrates
    # on (e.g. (("image003", 1),) doubles that family's sampling rate).
    oversample: Tuple[Tuple[str, int], ...] = ()


def rect_compat_postprocess() -> PostprocessConfig:
    """ui_infer_rectangle.py module constants (:39-49)."""
    return PostprocessConfig(fit=FitMode.RECT, bin_thresh=0.50, fit_outset_px=0)


def quad_compat_postprocess() -> PostprocessConfig:
    """ui_infer_quadrilateral.py module constants (:36-50, fit_outset :433)."""
    return PostprocessConfig(fit=FitMode.QUAD, bin_thresh=0.45, fit_outset_px=2)


def recommended_train_config() -> TrainConfig:
    """Bit-for-bit the RECOMMENDED_CFG values (train.py:724-781)."""
    return TrainConfig()
