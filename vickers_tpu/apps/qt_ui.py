"""PySide6 GUI: 2x3 result grid, zoomable previews, timestamped log pane.

Functional parity with the reference GUIs' presentation layer
(ui_infer_rectangle.py:55-219 preview widgets, :570-765 MainWindow): row 1 =
original / prob-mask grayscale / overlay, row 2 = detections drawn on
original / binary / overlay; a top bar with the open button + model info and
a bottom timestamped log showing per-stage timings and per-detection
geometry.  Click any thumbnail for a non-modal zoom dialog (wheel-zoom
anchored under the cursor, clamped to [0.05, 50]; drag-pan; double-click
fits).

This module imports PySide6 lazily — the environment used for CI/TPU pods is
headless, where ``apps.ui_common.run_headless`` provides the same flow.
Clean-room implementation against the documented behavior; rendering and
geometry all come from the shared framework modules.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import numpy as np

from vickers_tpu.core.config import FitMode
from vickers_tpu.apps.render import draw_detections_on_three, make_overlay
from vickers_tpu.apps.ui_common import postprocess_minarearect_multi, _D

try:  # pragma: no cover - GUI not importable headless
    from PySide6 import QtCore, QtGui, QtWidgets

    HAVE_QT = True
except ImportError:  # pragma: no cover
    HAVE_QT = False


if HAVE_QT:  # pragma: no cover - requires a display to exercise

    def to_qpixmap_from_bgr(img_bgr: np.ndarray) -> "QtGui.QPixmap":
        import cv2

        rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]
        qimg = QtGui.QImage(rgb.data, w, h, 3 * w, QtGui.QImage.Format.Format_RGB888)
        return QtGui.QPixmap.fromImage(qimg.copy())

    class _GraphicsView(QtWidgets.QGraphicsView):
        """Wheel-zoom under the cursor, drag-pan, double-click fit."""

        ZMIN, ZMAX = 0.05, 50.0

        def __init__(self, scene):
            super().__init__(scene)
            self._zoom = 1.0
            self.setDragMode(QtWidgets.QGraphicsView.DragMode.ScrollHandDrag)
            self.setTransformationAnchor(
                QtWidgets.QGraphicsView.ViewportAnchor.AnchorUnderMouse)

        def wheelEvent(self, ev):
            factor = 1.25 if ev.angleDelta().y() > 0 else 0.8
            new = self._zoom * factor
            if self.ZMIN <= new <= self.ZMAX:
                self._zoom = new
                self.scale(factor, factor)

        def mouseDoubleClickEvent(self, ev):
            self.fitInView(self.scene().itemsBoundingRect(),
                           QtCore.Qt.AspectRatioMode.KeepAspectRatio)
            self._zoom = 1.0

    class ZoomImageDialog(QtWidgets.QDialog):
        """Non-modal zoomable preview of one pixmap."""

        def __init__(self, pixmap, title: str, parent=None):
            super().__init__(parent)
            self.setWindowTitle(title)
            self.setModal(False)
            scene = QtWidgets.QGraphicsScene(self)
            scene.addPixmap(pixmap)
            view = _GraphicsView(scene)
            lay = QtWidgets.QVBoxLayout(self)
            lay.addWidget(view)
            self.resize(900, 700)
            view.fitInView(scene.itemsBoundingRect(),
                           QtCore.Qt.AspectRatioMode.KeepAspectRatio)

    class ScaledLabel(QtWidgets.QLabel):
        """Thumbnail that keeps aspect on resize and opens a zoom dialog."""

        clicked = QtCore.Signal()

        def __init__(self, title: str):
            super().__init__()
            self._title = title
            self._pix: Optional[QtGui.QPixmap] = None
            self.setMinimumSize(200, 160)
            self.setAlignment(QtCore.Qt.AlignmentFlag.AlignCenter)
            self.setFrameShape(QtWidgets.QFrame.Shape.StyledPanel)

        def set_image(self, img_bgr: np.ndarray):
            self._pix = to_qpixmap_from_bgr(img_bgr)
            self._rescale()

        def _rescale(self):
            if self._pix is not None:
                self.setPixmap(self._pix.scaled(
                    self.size(), QtCore.Qt.AspectRatioMode.KeepAspectRatio,
                    QtCore.Qt.TransformationMode.SmoothTransformation))

        def resizeEvent(self, ev):
            self._rescale()
            super().resizeEvent(ev)

        def mousePressEvent(self, ev):
            if self._pix is not None:
                ZoomImageDialog(self._pix, self._title, self).show()
            super().mousePressEvent(ev)

    class MainWindow(QtWidgets.QMainWindow):
        def __init__(self, model_dir: str, img_size: int = 512,
                     fit: FitMode = FitMode.RECT, bin_thresh: float = 0.5,
                     fit_outset_px: int = 0):
            super().__init__()
            from vickers_tpu.infer.engine import Segmenter

            self.fit = fit
            self.bin_thresh = bin_thresh
            self.fit_outset_px = fit_outset_px
            self.segmenter = Segmenter(model_dir, img_size)
            self.setWindowTitle("Vickers indentation measurement (TPU)")

            central = QtWidgets.QWidget()
            v = QtWidgets.QVBoxLayout(central)

            bar = QtWidgets.QHBoxLayout()
            self.btn_open = QtWidgets.QPushButton("Open image…")
            self.btn_open.clicked.connect(self.on_open)
            bar.addWidget(self.btn_open)
            bar.addWidget(QtWidgets.QLabel(self.segmenter.info()))
            bar.addStretch(1)
            v.addLayout(bar)

            grid = QtWidgets.QGridLayout()
            titles = ["original", "probability", "overlay",
                      "detections", "binary", "detections+overlay"]
            self.panels = [ScaledLabel(t) for t in titles]
            for i, p in enumerate(self.panels):
                grid.addWidget(p, i // 3, i % 3)
            v.addLayout(grid, stretch=1)

            self.log = QtWidgets.QPlainTextEdit()
            self.log.setReadOnly(True)
            self.log.setMaximumHeight(160)
            v.addWidget(self.log)
            self.setCentralWidget(central)
            self.resize(1280, 900)

        def append_log(self, msg: str):
            self.log.appendPlainText(f"[{time.strftime('%H:%M:%S')}] {msg}")

        def on_open(self):
            import cv2

            path, _ = QtWidgets.QFileDialog.getOpenFileName(
                self, "choose image", "",
                "Images (*.png *.jpg *.jpeg *.bmp *.tif *.tiff)")
            if not path:
                return
            t0 = time.perf_counter()
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                self.append_log(f"cannot read {path}")
                return
            t1 = time.perf_counter()
            prob = self.segmenter.infer(img)
            t2 = time.perf_counter()
            clean, dets = postprocess_minarearect_multi(
                img, prob, bin_thresh=self.bin_thresh, fit=self.fit,
                fit_outset_px=self.fit_outset_px)
            t3 = time.perf_counter()

            overlay = make_overlay(img, prob)
            vis_o, vis_b, vis_v = draw_detections_on_three(
                img, clean, overlay, _D(dets))
            gray = (np.clip(prob, 0, 1) * 255).astype(np.uint8)
            gray3 = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
            for panel, im in zip(self.panels,
                                 [img, gray3, overlay, vis_o, vis_b, vis_v]):
                panel.set_image(im)

            self.append_log(
                f"{Path(path).name}: io {1e3*(t1-t0):.1f}ms | "
                f"infer {1e3*(t2-t1):.1f}ms | post {1e3*(t3-t2):.1f}ms")
            for d in dets:
                self.append_log(
                    f"  #{d['label']} d1={d['d1']:.1f}px d2={d['d2']:.1f}px "
                    f"mean={d['d_mean']:.1f}px "
                    f"center=({d['center'][0]:.1f},{d['center'][1]:.1f})")
