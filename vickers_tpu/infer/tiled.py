"""Tiled high-resolution inference with overlap blending (BASELINE config 4).

New capability, not a port: the reference downsamples every image to 512²
and upsamples the prob map back (SURVEY §5 long-context note), so a
3072x2048 image is segmented at 6x reduced resolution.  Here the image is
cut into a static grid of overlapping ``tile``-sized windows, every tile
runs through the U-Net as ONE batch (MXU-friendly), and logits are blended
back with a separable Hann taper so tile seams cancel.  The result is a
full-resolution probability map — diagonal precision is no longer bounded
by the 512 letterbox.

The whole thing (slice -> batch forward -> blend) is a single jitted
program per image shape; geometry (ops.postprocess) then runs on the
blended map at full resolution.

IMPORTANT scale caveat (measured, round 1): a model trained on 512-letterbox
images sees full-resolution structures ~6x larger than its training scale
and does NOT segment them (mask IoU 0.03 vs the letterbox path on real
3072x2048 shots).  Tiled mode therefore requires a model trained on
native-resolution tiles — the mechanism is validated (blending is exact to
1e-4 on single-tile inputs, seams cancel), the bundled checkpoint is not
scale-appropriate for it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.models.unet import VickersUNet
from vickers_tpu.ops.image import normalize_imagenet


def _tile_starts(extent: int, tile: int, stride: int) -> Tuple[int, ...]:
    """Static start offsets covering [0, extent) with the last tile clamped."""
    if extent <= tile:
        return (0,)
    starts = list(range(0, extent - tile + 1, stride))
    if starts[-1] != extent - tile:
        starts.append(extent - tile)
    return tuple(starts)


@functools.lru_cache(maxsize=None)
def _hann_taper(tile: int) -> np.ndarray:
    """Separable raised-cosine window, strictly positive so the denominator
    never vanishes (min clamp 0.05)."""
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tile) + 0.5) / tile)
    w = np.maximum(w, 0.05).astype(np.float32)
    return np.outer(w, w)


def make_tiled_prob_fn(model: VickersUNet, h: int, w: int,
                       tile: int = 512, overlap: int = 64):
    """Build the jitted (variables, img_rgb_u8 (H, W, 3)) -> prob (H, W)
    program for one image shape."""
    stride = tile - overlap
    ys = _tile_starts(h, tile, stride)
    xs = _tile_starts(w, tile, stride)
    n_tiles = len(ys) * len(xs)
    taper = jnp.asarray(_hann_taper(tile))

    @jax.jit
    def fn(variables, img_rgb):
        x = normalize_imagenet(img_rgb.astype(jnp.float32))
        # pad so every tile is in-bounds even when H or W < tile
        ph, pw = max(0, tile - h), max(0, tile - w)
        if ph or pw:
            x = jnp.pad(x, ((0, ph), (0, pw), (0, 0)))
        tiles = jnp.stack([
            jax.lax.dynamic_slice(x, (y0, x0, 0), (tile, tile, 3))
            for y0 in ys for x0 in xs
        ])                                               # (T, tile, tile, 3)
        logits = model.apply(variables, tiles, train=False)[..., 0]

        H2, W2 = h + ph, w + pw
        num = jnp.zeros((H2, W2), jnp.float32)
        den = jnp.zeros((H2, W2), jnp.float32)
        i = 0
        for y0 in ys:
            for x0 in xs:
                num = jax.lax.dynamic_update_slice(
                    num, jax.lax.dynamic_slice(num, (y0, x0), (tile, tile))
                    + logits[i] * taper, (y0, x0))
                den = jax.lax.dynamic_update_slice(
                    den, jax.lax.dynamic_slice(den, (y0, x0), (tile, tile))
                    + taper, (y0, x0))
                i += 1
        blended = num / den
        return jax.nn.sigmoid(blended[:h, :w])

    return fn


class TiledEngine:
    """High-res engine: full-resolution prob + full-resolution geometry."""

    def __init__(self, engine, tile: int = 512, overlap: int = 64,
                 min_rel_area: float = 0.15, min_center_prob: float = 0.8):
        from vickers_tpu.infer.engine import InferenceEngine

        assert isinstance(engine, InferenceEngine)
        self.engine = engine
        self.tile = tile
        self.overlap = overlap
        # Tiled-mode-only detection filters (no reference counterpart — the
        # reference never sees native resolution).  Set 0.0 to disable.
        #
        # min_rel_area: drop detections smaller than this fraction of the
        # largest one.  Corner-vignette blobs clear the absolute min_area
        # floor at native scale; genuine multi-indentation images have
        # near-equal sizes (observed ratios >= 0.9), so 0.15 separates.
        self.min_rel_area = min_rel_area
        # min_center_prob: drop detections whose mean probability over the
        # detection core (0.15*d_mean window at the center) is below this.
        # Real indentations measure 0.86-1.00 on the val split; large dark
        # corner structures (vignette / info bar) that fool the model at
        # native scale measure 0.59-0.73 — 0.8 separates with margin.
        self.min_center_prob = min_center_prob
        self._fns = {}

    def _center_prob(self, prob: np.ndarray, det) -> float:
        cx, cy = int(det.center[0]), int(det.center[1])
        r = max(3, int(0.15 * det.d_mean))
        win = prob[max(0, cy - r):cy + r, max(0, cx - r):cx + r]
        return float(win.mean()) if win.size else 0.0

    def prob(self, img_bgr: np.ndarray) -> np.ndarray:
        h, w = img_bgr.shape[:2]
        key = (h, w)
        if key not in self._fns:
            self._fns[key] = make_tiled_prob_fn(
                self.engine.model, h, w, self.tile, self.overlap
            )
        rgb = jnp.asarray(img_bgr[:, :, ::-1])
        return np.asarray(self._fns[key](self.engine._variables(), rgb))

    def detect(self, img_bgr: np.ndarray):
        """Full-res prob -> full-res on-device geometry -> detections already
        in original pixel coordinates (scale == 1)."""
        from vickers_tpu.infer.engine import _rescale_detections
        from vickers_tpu.ops.image import LetterboxGeometry
        from vickers_tpu.ops.postprocess import postprocess
        from vickers_tpu.core.config import LetterboxMode

        h, w = img_bgr.shape[:2]
        prob = self.prob(img_bgr)
        res = postprocess(jnp.asarray(prob), self.engine.cfg.post, self.engine.cfg.hv)
        if bool(res.overflow):
            # native-res masks can exceed the run-table bound more easily
            # than 512-letterbox ones; redo exactly rather than drop runs
            import dataclasses

            exact = dataclasses.replace(self.engine.cfg.post, cc_impl="pixel")
            res = postprocess(jnp.asarray(prob), exact, self.engine.cfg.hv)
        ident = LetterboxGeometry(
            src_h=h, src_w=w, size=max(h, w), scale=1.0, new_h=h, new_w=w,
            pad_top=0, pad_bottom=0, pad_left=0, pad_right=0,
            mode=LetterboxMode.CENTER_NO_UPSCALE,
        )
        dets = _rescale_detections(res.detections, ident, self.engine.cfg.hv)
        # Confidence filter FIRST: the rel-area floor must be computed from
        # high-confidence detections only, otherwise a large low-confidence
        # blob (corner vignette / info bar, center-prob 0.59-0.73) sets a
        # floor that drops the genuine indentation before the blob itself is
        # removed by the confidence filter (round-3 advisor finding).
        if dets and self.min_center_prob > 0.0:
            dets = [d for d in dets
                    if self._center_prob(prob, d) >= self.min_center_prob]
        if dets and self.min_rel_area > 0.0:
            floor = self.min_rel_area * max(d.area for d in dets)
            dets = [d for d in dets if d.area >= floor]
        return prob, dets
