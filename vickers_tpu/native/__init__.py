"""ctypes bindings for the native runtime (geometry kernels + data loader).

Builds the shared libraries on first import with g++ (cached by source
mtime under ``native/_build``); everything degrades gracefully to the
cv2/JAX paths when the toolchain or image libraries are unavailable, so the
framework never hard-depends on the native layer.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_BUILD = _DIR / "_build"

_LETTERBOX_MODE = {"center_no_upscale": 0, "center_upscale": 1, "corner_upscale": 2}


def _build_lib(name: str, sources: List[str], libs: List[str]) -> Optional[Path]:
    _BUILD.mkdir(exist_ok=True)
    out = _BUILD / f"lib{name}.so"
    srcs = [_DIR / s for s in sources]
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(out)]
    cmd += [str(s) for s in srcs]
    cmd += [f"-l{l}" for l in libs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:
        log.warning("native build of %s failed: %s", name, e)
        return None


class _Geometry:
    def __init__(self, lib: ctypes.CDLL):
        self.lib = lib
        f = lib.vk_postprocess
        f.restype = ctypes.c_int
        f.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.vk_hv.restype = ctypes.c_float
        lib.vk_hv.argtypes = [ctypes.c_float, ctypes.c_float, ctypes.c_float]

    def postprocess(self, prob: np.ndarray, bin_thresh: float = 0.5,
                    min_area_frac: float = 0.0008, min_area_floor: int = 200,
                    morph_kernel: int = 3, open_iter: int = 1,
                    close_iter: int = 1, fit_quad: bool = False,
                    fit_outset_px: int = 0, max_det: int = 8):
        """-> (clean uint8 (H,W) 0/255, list of detection dicts)."""
        prob = np.ascontiguousarray(prob, np.float32)
        h, w = prob.shape
        clean = np.zeros((h, w), np.uint8)
        areas = np.zeros(max_det, np.int32)
        boxes = np.zeros((max_det, 4, 2), np.float32)
        centers = np.zeros((max_det, 2), np.float32)
        ds = np.zeros((max_det, 3), np.float32)
        n = self.lib.vk_postprocess(
            prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
            bin_thresh, min_area_frac, min_area_floor, morph_kernel,
            open_iter, close_iter, int(fit_quad), fit_outset_px,
            clean.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_det,
        )
        dets = []
        for i in range(n):
            dets.append({
                "label": i + 1,
                "area": int(areas[i]),
                "box": boxes[i].copy(),
                "center": (float(centers[i, 0]), float(centers[i, 1])),
                "d1": float(ds[i, 0]), "d2": float(ds[i, 1]),
                "d_mean": float(ds[i, 2]),
            })
        return clean, dets

    def hv(self, d_px: float, um_per_px: float, force_kgf: float) -> float:
        return float(self.lib.vk_hv(d_px, um_per_px, force_kgf))


class _Decoder:
    def __init__(self, lib: ctypes.CDLL):
        self.lib = lib
        lib.vk_decode_letterbox.restype = ctypes.c_int
        lib.vk_decode_letterbox.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vk_decode_batch.restype = ctypes.c_int
        lib.vk_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]

    def decode_letterbox(self, path: str, size: int,
                         mode: str = "center_upscale"
                         ) -> Tuple[np.ndarray, Tuple[int, int]]:
        out = np.zeros((size, size, 3), np.uint8)
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self.lib.vk_decode_letterbox(
            path.encode(), size, _LETTERBOX_MODE[mode],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(h), ctypes.byref(w),
        )
        if rc != 0:
            raise IOError(f"native decode failed: {path}")
        return out, (h.value, w.value)

    def decode_batch(self, paths: List[str], size: int,
                     mode: str = "center_upscale", threads: int = 8
                     ) -> Tuple[np.ndarray, np.ndarray, int]:
        n = len(paths)
        out = np.zeros((n, size, size, 3), np.uint8)
        hw = np.zeros((n, 2), np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self.lib.vk_decode_batch(
            arr, n, size, _LETTERBOX_MODE[mode],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads,
        )
        return out, hw, int(failures)


_geometry: Optional[_Geometry] = None
_decoder: Optional[_Decoder] = None
_tried = False


def _ensure_built() -> None:
    global _geometry, _decoder, _tried
    if _tried:
        return
    _tried = True
    g = _build_lib("vkgeometry", ["geometry.cpp"], [])
    if g is not None:
        try:
            _geometry = _Geometry(ctypes.CDLL(str(g)))
        except OSError as e:
            log.warning("cannot load %s: %s", g, e)
    d = _build_lib("vkdecoder", ["decoder.cpp"], ["jpeg", "png"])
    if d is not None:
        try:
            _decoder = _Decoder(ctypes.CDLL(str(d)))
        except OSError as e:
            log.warning("cannot load %s: %s", d, e)


def geometry() -> Optional[_Geometry]:
    _ensure_built()
    return _geometry


def decoder() -> Optional[_Decoder]:
    _ensure_built()
    return _decoder


def available() -> dict:
    _ensure_built()
    return {"geometry": _geometry is not None, "decoder": _decoder is not None}
