"""Detection rendering (presentation layer).

Parity with draw_detections_on_three (ui_infer_rectangle.py:384-447): cycling
8-color palette for the outline, red diagonals via the longest-non-sharing
rule, "#i mean=..px" text at the center; optionally onto the three canvases
(original / binary / overlay) the GUIs display.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np

PALETTE: Tuple[Tuple[int, int, int], ...] = (
    (0, 255, 0), (255, 0, 0), (0, 255, 255), (255, 0, 255),
    (0, 165, 255), (255, 255, 0), (147, 20, 255), (50, 205, 50),
)
DIAG_COLOR = (0, 0, 255)


def _diagonal_pairs(box: np.ndarray) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    dists = []
    for a in range(4):
        for b in range(a + 1, 4):
            dists.append((float(np.linalg.norm(box[a] - box[b])), a, b))
    dists.sort(reverse=True)
    _, i1, j1 = dists[0]
    rest = [k for k in range(4) if k not in (i1, j1)]
    return (i1, j1), (rest[0], rest[1])


def draw_detections(img_bgr: np.ndarray, detections: Iterable) -> np.ndarray:
    import cv2

    canvas = img_bgr.copy()
    for idx, det in enumerate(detections, start=1):
        box = np.asarray(det.box).astype(np.int32)
        color = PALETTE[(idx - 1) % len(PALETTE)]
        (i1, j1), (i2, j2) = _diagonal_pairs(box)
        cv2.polylines(canvas, [box.reshape(-1, 1, 2)], True, color, 2)
        cv2.line(canvas, tuple(box[i1]), tuple(box[j1]), DIAG_COLOR, 2)
        cv2.line(canvas, tuple(box[i2]), tuple(box[j2]), DIAG_COLOR, 2)
        cx, cy = int(det.center[0]), int(det.center[1])
        cv2.putText(canvas, f"#{idx} mean={det.d_mean:.1f}px", (cx + 6, cy - 6),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2, cv2.LINE_AA)
    return canvas


def make_overlay(img_bgr: np.ndarray, mask01: np.ndarray,
                 color=(0, 0, 255), alpha: float = 0.35) -> np.ndarray:
    """make_overlay parity (ui_infer_rectangle.py:276-285)."""
    overlay = np.zeros_like(img_bgr)
    overlay[mask01 > 0.5] = color
    return np.clip(
        img_bgr.astype(np.float32) + alpha * overlay.astype(np.float32), 0, 255
    ).astype(np.uint8)


def draw_detections_on_three(img_bgr: np.ndarray, clean_bin: np.ndarray,
                             overlay_bgr: np.ndarray, detections: Sequence
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The three-canvas variant the GUIs use (original / binary / overlay)."""
    import cv2

    vis_b = cv2.cvtColor(clean_bin.astype(np.uint8), cv2.COLOR_GRAY2BGR)
    return (
        draw_detections(img_bgr, detections),
        draw_detections(vis_b, detections),
        draw_detections(overlay_bgr, detections),
    )
