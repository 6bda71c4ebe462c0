"""Validation visual dumps: [image | GT | prob | overlay] 4-panel JPEGs.

Parity with save_individual_visuals (train.py:285-350): de-normalized image,
GT mask at 0/255, probability map scaled to 0..255 (not thresholded), and an
orange (BGR 0,140,255) overlay at alpha=0.35 where prob > 0.5, hstacked and
written as ``<out>/<stem>.jpg``.  cv2 is used only for JPEG encoding (host
presentation path, not compute).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from vickers_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD

_OVERLAY_BGR = np.array([0, 140, 255], np.uint8)
_ALPHA = 0.35


def render_panel(img_norm: np.ndarray, gt: np.ndarray, prob: np.ndarray) -> np.ndarray:
    """-> (H, 4W, 3) BGR uint8 canvas for one sample.

    img_norm: (H, W, 3) normalized RGB float; gt/prob: (H, W) float."""
    rgb = (img_norm * np.array(IMAGENET_STD) + np.array(IMAGENET_MEAN)) * 255.0
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    bgr = rgb[:, :, ::-1]
    gt8 = (np.clip(gt, 0, 1) * 255).astype(np.uint8)
    pd8 = (np.clip(prob, 0, 1) * 255).astype(np.uint8)

    color = np.zeros_like(bgr)
    color[pd8 > 127] = _OVERLAY_BGR
    vis = np.clip(
        bgr.astype(np.float32) + _ALPHA * color.astype(np.float32), 0, 255
    ).astype(np.uint8)

    gt3 = np.repeat(gt8[:, :, None], 3, axis=2)
    pd3 = np.repeat(pd8[:, :, None], 3, axis=2)
    return np.hstack([bgr, gt3, pd3, vis])


def save_batch_visuals(
    imgs_norm: np.ndarray, gts: np.ndarray, probs: np.ndarray,
    stems: Sequence[str], out_dir: Path,
) -> None:
    import cv2

    out_dir.mkdir(parents=True, exist_ok=True)
    for i, stem in enumerate(stems):
        canvas = render_panel(imgs_norm[i], gts[i], probs[i])
        cv2.imwrite(str(out_dir / f"{stem}.jpg"), canvas)
