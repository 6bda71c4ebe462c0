"""Fused, XLA-friendly image preprocessing ops.

Replaces the reference's OpenCV/albumentations preprocessing with on-device
static-shape equivalents:

- ``letterbox_geometry``: the scale/pad arithmetic of all three reference
  letterbox conventions (SURVEY §3.3):
    * GUI:   ``letterbox_square``  (ui_infer_rectangle.py:225-246)
    * train: ``A.LongestMaxSize`` + centered ``A.PadIfNeeded`` (train.py:70-75)
    * quick: ``letterbox_pad``     (infer_pth_gui.py:17-24)
- ``resize_linear`` / ``resize_nearest_cv2``: match cv2.resize INTER_LINEAR
  (half-pixel centers, no antialias) and INTER_NEAREST (asymmetric
  ``sx = floor(dx * scale)``) respectively.
- ``letterbox_apply`` / ``unletterbox``: device-side resize+pad and its
  inverse (ui_infer_rectangle.py:249-261).
- ``normalize_imagenet``: x/255 then (x-mean)/std, as A.Normalize
  (train.py:108-109).

Shapes are static: the geometry is computed host-side from the (static)
input H, W so that everything under jit is fixed-shape and fusable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD, LetterboxMode


@dataclasses.dataclass(frozen=True)
class LetterboxGeometry:
    """Static description of one letterbox transform (host-side ints)."""

    src_h: int
    src_w: int
    size: int
    scale: float
    new_h: int
    new_w: int
    pad_top: int
    pad_bottom: int
    pad_left: int
    pad_right: int
    mode: LetterboxMode


def letterbox_geometry(h: int, w: int, size: int, mode: LetterboxMode) -> LetterboxGeometry:
    if mode == LetterboxMode.CENTER_NO_UPSCALE:
        # ui_infer_rectangle.py:231-238 — scale capped at 1.0, round-half-even
        scale = min(size / max(h, w), 1.0)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        top = (size - nh) // 2
        left = (size - nw) // 2
    elif mode == LetterboxMode.CENTER_UPSCALE:
        # A.LongestMaxSize: longest side -> size exactly; PadIfNeeded centered
        scale = size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        top = (size - nh) // 2
        left = (size - nw) // 2
    elif mode == LetterboxMode.CORNER_UPSCALE:
        # infer_pth_gui.py:17-24 — scale = min(size/h, size/w), pad right/bottom
        scale = min(size / h, size / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        top = 0
        left = 0
    else:  # pragma: no cover
        raise ValueError(mode)
    return LetterboxGeometry(
        src_h=h, src_w=w, size=size, scale=scale, new_h=nh, new_w=nw,
        pad_top=top, pad_bottom=size - nh - top,
        pad_left=left, pad_right=size - nw - left, mode=mode,
    )


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_linear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize INTER_LINEAR parity: half-pixel centers, no antialiasing.

    Works on (H, W), (H, W, C) or batched (..., H, W, C) arrays; the resize
    applies to the trailing spatial dims before an optional channel dim.
    """
    if img.ndim == 2:
        shape = (out_h, out_w)
    elif img.ndim == 3:
        shape = (out_h, out_w, img.shape[-1])
    elif img.ndim == 4:
        shape = (img.shape[0], out_h, out_w, img.shape[-1])
    else:  # pragma: no cover
        raise ValueError(f"unsupported ndim {img.ndim}")
    orig_dtype = img.dtype
    out = jax.image.resize(img.astype(jnp.float32), shape, method="linear", antialias=False)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        # cv2 rounds half away from zero on the uint8 path; values are >= 0 here.
        out = jnp.round(out)
        out = jnp.clip(out, 0, jnp.iinfo(orig_dtype).max)
    return out.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest_cv2(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize INTER_NEAREST parity: ``sx = floor(dx * src/dst)``.

    This asymmetric convention differs from jax.image.resize's half-pixel
    nearest; infer_pth_gui.py:26-29 upsamples its binary mask this way, so the
    compat path must match exactly.
    """
    h, w = (img.shape[0], img.shape[1]) if img.ndim >= 2 else (1, img.shape[0])
    sy = h / out_h
    sx = w / out_w
    rows = jnp.minimum((jnp.arange(out_h) * sy).astype(jnp.int32), h - 1)
    cols = jnp.minimum((jnp.arange(out_w) * sx).astype(jnp.int32), w - 1)
    out = jnp.take(img, rows, axis=0)
    out = jnp.take(out, cols, axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("geom",))
def letterbox_apply(img: jax.Array, geom: LetterboxGeometry, pad_value: float = 0.0) -> jax.Array:
    """Resize (bilinear) + constant-pad one image to (size, size[, C])."""
    rs = resize_linear(img, geom.new_h, geom.new_w)
    pads = [(geom.pad_top, geom.pad_bottom), (geom.pad_left, geom.pad_right)]
    if img.ndim == 3:
        pads.append((0, 0))
    return jnp.pad(rs, pads, constant_values=pad_value)


@functools.partial(jax.jit, static_argnames=("geom", "nearest"))
def unletterbox(prob_sq: jax.Array, geom: LetterboxGeometry, nearest: bool = False) -> jax.Array:
    """Crop the pads and resize back to the original resolution.

    LINEAR on probability maps (GUI path, ui_infer_rectangle.py:249-261);
    NEAREST on binary masks (quick-viewer path, infer_pth_gui.py:26-29).
    """
    size = geom.size
    crop = prob_sq[geom.pad_top:size - geom.pad_bottom, geom.pad_left:size - geom.pad_right]
    if crop.shape[0] == geom.src_h and crop.shape[1] == geom.src_w:
        return crop
    if nearest:
        return resize_nearest_cv2(crop, geom.src_h, geom.src_w)
    return resize_linear(crop, geom.src_h, geom.src_w)


_MEAN = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
_STD = np.asarray(IMAGENET_STD, np.float32) * 255.0


def normalize_imagenet(img_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(x/255 - mean)/std == (x - 255*mean)/(255*std); x is RGB in [0, 255]."""
    x = img_u8.astype(jnp.float32)
    return ((x - _MEAN) / _STD).astype(dtype)


def denormalize_imagenet(x: jax.Array) -> jax.Array:
    """Inverse of normalize_imagenet, to uint8 (visual dumps, train.py:317-322)."""
    img = x.astype(jnp.float32) * _STD + _MEAN
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


def scale_coords_to_original(xy: jax.Array, geom: LetterboxGeometry) -> jax.Array:
    """Map (x, y) coords measured in the letterboxed square back to original
    image pixels: undo the pad offset, then divide by scale.

    This is the TPU-native alternative to the reference's "resize the whole
    probability map back to 3072x2048 then run geometry there": lengths and
    coordinates transform exactly as points under the same similarity.
    """
    off = jnp.asarray([geom.pad_left, geom.pad_top], jnp.float32)
    return (xy - off) / jnp.float32(geom.scale)
