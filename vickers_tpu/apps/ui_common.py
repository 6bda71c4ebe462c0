"""Shared implementation for the two GUI compat entry points.

The reference's ``ui_infer_rectangle.py`` and ``ui_infer_quadrilateral.py``
are ~85% copy-paste of each other (SURVEY §2.1 duplication note); this module
is the single implementation behind both, parameterised by the fit mode —
exactly the refactor the survey prescribes.

Public surface kept from the reference scripts:
- ``letterbox_square`` / ``unletterbox``  (ui_infer_rectangle.py:225-261)
- ``make_overlay``                        (:276-285)
- ``postprocess_minarearect_multi``       (:291-381 / quad :423-530) — same
  signature and return shape (clean uint8 image + list of detection dicts),
  computed by the on-device JAX pipeline.
- ``Segmenter``                           (:453-564) — the JAX engine.
- ``run_headless`` — the GUI flow (open image -> infer -> postprocess ->
  render 2x3 panel -> log timings) without Qt, used when no display exists
  and by tests; ``make_main`` wires the same flow into PySide6 when
  available.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from vickers_tpu.core.config import FitMode, HVConfig, PostprocessConfig
from vickers_tpu.infer.engine import InferenceEngine
from vickers_tpu.apps.render import draw_detections_on_three, make_overlay  # re-export


def letterbox_square(img_bgr: np.ndarray, size: int, pad_value: int = 0):
    """(img_pad, scale, (top, bottom, left, right)) — centered, no upscale
    (ui_infer_rectangle.py:225-246)."""
    import cv2

    h, w = img_bgr.shape[:2]
    scale = min(size / max(h, w), 1.0)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    rs = cv2.resize(img_bgr, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = (size - nh) // 2
    bottom = size - nh - top
    left = (size - nw) // 2
    right = size - nw - left
    out = cv2.copyMakeBorder(rs, top, bottom, left, right,
                             cv2.BORDER_CONSTANT,
                             value=(pad_value, pad_value, pad_value))
    return out, scale, (top, bottom, left, right)


def unletterbox(mask_sq: np.ndarray, scale: float, pad: Tuple[int, int, int, int],
                orig_hw: Tuple[int, int]) -> np.ndarray:
    """Crop pads + LINEAR resize back (ui_infer_rectangle.py:249-261)."""
    import cv2

    top, bottom, left, right = pad
    size = mask_sq.shape[0]
    crop = mask_sq[top:size - bottom, left:size - right]
    oh, ow = orig_hw
    if crop.shape[:2] == (oh, ow):
        return crop
    return cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_LINEAR)


def postprocess_minarearect_multi(
    img_bgr: np.ndarray,
    prob01: np.ndarray,
    bin_thresh: float = 0.5,
    min_area_frac: float = 0.0008,
    morph_kernel: int = 3,
    open_iter: int = 1,
    close_iter: int = 1,
    fit_outset_px: int = 0,
    fit: FitMode = FitMode.RECT,
) -> Tuple[np.ndarray, List[Dict]]:
    """Reference-signature wrapper over the geometry pipeline.

    Returns (clean_bin uint8 0/255 at prob01's resolution, detections as the
    reference's list-of-dicts sorted by area desc).

    Backend selection: the GUI flow calls this at ORIGINAL resolution (up to
    3072x2048) where device CC is wasteful; the native C++ kernels
    (vickers_tpu.native) handle that in tens of ms on host.  Falls back to
    the on-device JAX pipeline when the native lib isn't built."""
    from vickers_tpu import native

    geo = native.geometry()
    if geo is not None:
        clean, dets = geo.postprocess(
            prob01, bin_thresh=bin_thresh, min_area_frac=min_area_frac,
            min_area_floor=200, morph_kernel=morph_kernel,
            open_iter=open_iter, close_iter=close_iter,
            fit_quad=(fit == FitMode.QUAD), fit_outset_px=fit_outset_px,
        )
        for d in dets:
            d["box"] = d["box"].astype("int32")
        return clean, dets

    import jax.numpy as jnp

    from vickers_tpu.ops.postprocess import postprocess

    cfg = PostprocessConfig(
        fit=fit, bin_thresh=bin_thresh, min_area_frac=min_area_frac,
        morph_kernel=morph_kernel, open_iter=open_iter, close_iter=close_iter,
        fit_outset_px=fit_outset_px,
    )
    res = postprocess(jnp.asarray(prob01, jnp.float32), cfg, HVConfig())
    clean = (np.asarray(res.clean) > 0.5).astype(np.uint8) * 255
    det = res.detections
    valid = np.asarray(det.valid)
    out: List[Dict] = []
    for i in range(valid.shape[0]):
        if not valid[i]:
            continue
        box = np.asarray(det.box[i]).astype(np.int32)
        out.append({
            "label": i + 1,
            "area": int(det.area[i]),
            "box": box,
            "center": (float(det.center[i][0]), float(det.center[i][1])),
            "d1": float(det.d1[i]),
            "d2": float(det.d2[i]),
            "d_mean": float(det.d_mean[i]),
        })
    return clean, out


# Reference alias: the GUI scripts construct Segmenter(model_dir, img_size)
from vickers_tpu.infer.engine import Segmenter  # noqa: E402


def run_headless(model_dir: str, image_paths: List[str], out_dir: Optional[str],
                 img_size: int = 512, fit: FitMode = FitMode.RECT,
                 bin_thresh: float = 0.5, fit_outset_px: int = 0) -> List[Dict]:
    """The MainWindow.on_open flow (ui_infer_rectangle.py:684-765) without Qt:
    for each image — infer, postprocess, render the six panels, log stage
    timings and per-detection geometry.  Returns the log records."""
    import cv2

    seg = Segmenter(model_dir, img_size)
    if not seg.ok():
        raise FileNotFoundError(f"no model under {model_dir}")
    records: List[Dict] = []
    for p in image_paths:
        t0 = time.perf_counter()
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            continue
        t_io = time.perf_counter()
        prob = seg.infer(img)
        t_inf = time.perf_counter()
        clean, dets = postprocess_minarearect_multi(
            img, prob, bin_thresh=bin_thresh, fit=fit,
            fit_outset_px=fit_outset_px,
        )
        t_post = time.perf_counter()

        overlay = make_overlay(img, prob)
        vis_o, vis_b, vis_v = draw_detections_on_three(img, clean, overlay, _D(dets))
        rec = {
            "image": p,
            "ms_io": (t_io - t0) * 1e3,
            "ms_infer": (t_inf - t_io) * 1e3,
            "ms_post": (t_post - t_inf) * 1e3,
            "detections": dets,
        }
        records.append(rec)
        print(f"{Path(p).name}: io {rec['ms_io']:.1f}ms | infer "
              f"{rec['ms_infer']:.1f}ms | post {rec['ms_post']:.1f}ms | "
              f"{len(dets)} det")
        for d in dets:
            print(f"  #{d['label']} d1={d['d1']:.1f} d2={d['d2']:.1f} "
                  f"mean={d['d_mean']:.1f}px center=({d['center'][0]:.1f},"
                  f"{d['center'][1]:.1f}) area={d['area']}")
        if out_dir:
            od = Path(out_dir)
            od.mkdir(parents=True, exist_ok=True)
            stem = Path(p).stem
            grid = np.vstack([
                np.hstack([img, _gray3(prob), overlay]),
                np.hstack([vis_o, vis_b, vis_v]),
            ])
            cv2.imwrite(str(od / f"{stem}_panel.jpg"), grid)
    return records


def _gray3(prob: np.ndarray) -> np.ndarray:
    import cv2

    g = (np.clip(prob, 0, 1) * 255).astype(np.uint8)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


class _DetView:
    """Adapter: dict detection -> attribute access for the renderer."""

    def __init__(self, d: Dict):
        self.box = d["box"]
        self.center = d["center"]
        self.d_mean = d["d_mean"]


def _D(dets: List[Dict]) -> List[_DetView]:
    return [_DetView(d) for d in dets]


def make_main(fit: FitMode, bin_thresh: float, fit_outset_px: int = 0,
              default_model_dir: str = "runs/unet_r34_512"):
    """Returns the script ``main()``: PySide6 window when a display + Qt are
    available, headless CLI otherwise."""

    def main(argv: Optional[List[str]] = None) -> int:
        import os

        argv = list(sys.argv[1:] if argv is None else argv)
        model_dir = default_model_dir
        if argv and Path(argv[0]).is_dir():
            model_dir = argv.pop(0)
        has_display = bool(os.environ.get("DISPLAY"))
        if not has_display or argv:
            if not argv:
                print("headless: usage <model_dir> <image...> [--out DIR]",
                      file=sys.stderr)
                return 2
            out = None
            if "--out" in argv:
                i = argv.index("--out")
                out = argv[i + 1]
                del argv[i:i + 2]
            run_headless(model_dir, argv, out, fit=fit, bin_thresh=bin_thresh,
                         fit_outset_px=fit_outset_px)
            return 0
        return _qt_main(model_dir, fit, bin_thresh, fit_outset_px)  # pragma: no cover

    return main


def _qt_main(model_dir: str, fit: FitMode, bin_thresh: float,
             fit_outset_px: int) -> int:  # pragma: no cover - needs display
    try:
        from PySide6 import QtWidgets
    except ImportError:
        print("PySide6 not available; run headless with image paths",
              file=sys.stderr)
        return 2
    from vickers_tpu.apps.qt_ui import MainWindow

    app = QtWidgets.QApplication([])
    win = MainWindow(model_dir, 512, fit=fit, bin_thresh=bin_thresh,
                     fit_outset_px=fit_outset_px)
    win.show()
    return app.exec()
