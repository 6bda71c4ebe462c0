"""The inference engine (L6) — jitted whole-graph image -> prob + detections.

Replaces the reference's ``Segmenter`` (ui_infer_rectangle.py:453-564, and
its byte-identical twin in ui_infer_quadrilateral.py:591-711):

- model autoselect from a run directory: native checkpoints (best.ckpt /
  last.ckpt) first, then the reference's torch formats in the reference's
  own order (last.pth before best.pth, ui_infer_rectangle.py:489-499);
  the ONNX branch (:474-487) has no TPU counterpart — the jitted XLA graph
  *is* the deployment format.
- ``infer(bgr)``: the compat API — (H, W) float32 prob in [0, 1] at the
  ORIGINAL resolution (letterbox -> normalize -> forward -> sigmoid ->
  unletterbox), one fused XLA program per input shape.
- ``detect(bgr)``: the TPU-native full path — geometry runs at model
  resolution on device and only the (tiny) detection tensors come back,
  rescaled to original pixel coordinates.  No full-res prob transfer, no
  host geometry: this is what the ≥5000 img/s/chip north star rides on.
- ``infer_batch`` / ``detect_batch``: the batched serving path for
  same-shape inputs.

Per-shape compiled programs are cached; compile happens once per (H, W).
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.core.config import (
    FitMode,
    HVConfig,
    InferConfig,
    LetterboxMode,
    PostprocessConfig,
)
from vickers_tpu.models.unet import VickersUNet, build_model, init_model
from vickers_tpu.ops import image as I
from vickers_tpu.ops.postprocess import Detections, postprocess

log = logging.getLogger(__name__)


class Detection(NamedTuple):
    """One detection in ORIGINAL image coordinates (host-side view of the
    fixed-size device Detections), field-compatible with the reference's
    detection dicts (ui_infer_rectangle.py:371-381) plus HV."""

    label: int
    area: float
    box: np.ndarray      # (4, 2) float32
    center: Tuple[float, float]
    d1: float
    d2: float
    d_mean: float
    hv: float
    quality: float


def _rescale_detections(det: Detections, geom: I.LetterboxGeometry,
                        hv_cfg: HVConfig) -> List[Detection]:
    """Device detections (mask coords) -> host list in original pixels."""
    v = np.asarray(det.valid)
    out: List[Detection] = []
    s = geom.scale
    off = np.array([geom.pad_left, geom.pad_top], np.float32)
    for i in range(v.shape[0]):
        if not v[i]:
            continue
        box = (np.asarray(det.box[i]) - off) / s
        center = (np.asarray(det.center[i]) - off) / s
        d_mean = float(det.d_mean[i]) / s
        d_mm = d_mean * hv_cfg.um_per_px / 1000.0
        hv = 1.8544 * hv_cfg.force_kgf / max(d_mm * d_mm, 1e-12)
        out.append(Detection(
            label=i + 1,
            area=float(det.area[i]) / (s * s),
            box=box.astype(np.float32),
            center=(float(center[0]), float(center[1])),
            d1=float(det.d1[i]) / s,
            d2=float(det.d2[i]) / s,
            d_mean=d_mean,
            hv=hv,
            quality=float(det.quality[i]),
        ))
    return out


class InferenceEngine:
    """``Segmenter`` equivalent with a TPU-native fast path."""

    def __init__(
        self,
        model_dir: Optional[str] = None,
        img_size: int = 512,
        config: Optional[InferConfig] = None,
        params=None,
        batch_stats=None,
        dtype=jnp.float32,
    ):
        # f32 is the default full-precision serving dtype (round-5 change):
        # on the current relay, XLA's bf16 conv lowering is ~10x slower than
        # f32 (BENCH.md r4: 10.9 vs 110.5 img/s batch-256), so bf16 is
        # opt-in (dtype=jnp.bfloat16) until that lowering is fixed.  int8
        # serving (enable_quant + quantized=True) is unaffected.
        from vickers_tpu.core.cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = config or InferConfig(img_size=img_size)
        self.img_size = self.cfg.img_size
        # per-instance compiled-fn cache (an lru_cache on bound methods would
        # key on self and pin every engine + its params for process lifetime)
        self._fns: Dict = {}
        self.model: VickersUNet = build_model(dtype=dtype)
        self.backend = "none"
        self._info = "no model"
        if params is not None:
            self.params, self.batch_stats = params, batch_stats
            self.backend = "params"
            self._info = "in-memory params"
        elif model_dir is not None:
            p = Path(model_dir)
            if p.is_file():
                # a specific checkpoint file (e.g. a mixed run's final.ckpt,
                # which the best-by-letterbox-Dice selection would never pick)
                from vickers_tpu.train import checkpoint as ckpt

                tree = ckpt.load_native(p)
                self.params, self.batch_stats = tree["params"], tree["batch_stats"]
                self.backend = "native"
                self._info = f"native:{p}"
            else:
                self._load_from_dir(p)
        else:
            self.params = self.batch_stats = None

    # -- model loading (reference fallback chain) --------------------------
    def _load_from_dir(self, d: Path) -> None:
        from vickers_tpu.train import checkpoint as ckpt

        candidates = [
            ("native", d / "best.ckpt"), ("native", d / "last.ckpt"),
            ("onnx", d / "unet.onnx"),   # the reference's preferred artifact
            ("pth", d / "last.pth"), ("pth", d / "best.pth"),
        ]
        for kind, p in candidates:
            if not p.exists():
                continue
            try:
                if kind == "native":
                    tree = ckpt.load_native(p)
                    self.params = tree["params"]
                    self.batch_stats = tree["batch_stats"]
                elif kind == "onnx":
                    from vickers_tpu.compat.onnx_ingest import load_onnx_params

                    self.params, self.batch_stats = load_onnx_params(str(p))
                else:
                    from vickers_tpu.compat.convert import load_pth_params

                    self.params, self.batch_stats = load_pth_params(str(p))
                self.backend = kind
                self._info = f"{kind}:{p.name} @ {d}"
                log.info("loaded model: %s", self._info)
                return
            except Exception as e:  # keep falling back like the reference
                log.warning("failed to load %s: %s", p, e)
        self.params = self.batch_stats = None
        log.warning("no usable checkpoint under %s", d)

    def ok(self) -> bool:
        return self.params is not None

    def info(self) -> str:
        return self._info

    # -- jitted pipelines (cached per input geometry) ----------------------
    def _cached(self, key, build):
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = build()
        return fn

    def _prob_fn(self, geom: I.LetterboxGeometry):
        model = self.model

        @jax.jit
        def fn(variables, img_rgb_f32):
            sq = I.letterbox_apply(img_rgb_f32, geom)
            x = I.normalize_imagenet(sq)
            logits = model.apply(variables, x[None], train=False)[0, :, :, 0]
            prob = jax.nn.sigmoid(logits)
            return jnp.clip(I.unletterbox(prob, geom), 0.0, 1.0)

        return self._cached(("prob", geom), lambda: fn)

    def _prob_square_fn(self, geom: I.LetterboxGeometry):
        """prob map at the SQUARE (model) resolution — the quick-viewer path
        thresholds before unletterboxing (infer_pth_gui.py:45-53)."""
        model = self.model

        @jax.jit
        def fn(variables, img_rgb_f32):
            sq = I.letterbox_apply(img_rgb_f32, geom)
            x = I.normalize_imagenet(sq)
            logits = model.apply(variables, x[None], train=False)[0, :, :, 0]
            return jax.nn.sigmoid(logits)

        return self._cached(("prob_sq", geom), lambda: fn)

    def infer_square(self, img_bgr: np.ndarray,
                     letterbox: Optional[LetterboxMode] = None) -> np.ndarray:
        """(S, S) prob map before unletterboxing."""
        h, w = img_bgr.shape[:2]
        geom = I.letterbox_geometry(
            h, w, self.img_size, letterbox or self.cfg.letterbox)
        rgb = jnp.asarray(img_bgr[:, :, ::-1], jnp.float32)
        return np.asarray(self._prob_square_fn(geom)(self._variables(), rgb))

    def _detect_fn(self, geom: I.LetterboxGeometry, post: PostprocessConfig,
                   hv: HVConfig):
        model = self.model

        @jax.jit
        def fn(variables, img_rgb_f32):
            sq = I.letterbox_apply(img_rgb_f32, geom)
            x = I.normalize_imagenet(sq)
            logits = model.apply(variables, x[None], train=False)[0, :, :, 0]
            prob = jax.nn.sigmoid(logits)
            res = postprocess(prob, post, hv)
            return prob, res

        return self._cached(("detect", geom, post, hv), lambda: fn)

    def _batch_fn(self, size: int, post: PostprocessConfig, hv: HVConfig):
        model = self.model

        @jax.jit
        def fn(variables, imgs_u8):
            x = I.normalize_imagenet(imgs_u8.astype(jnp.float32))
            logits = model.apply(variables, x, train=False)[..., 0]
            probs = jax.nn.sigmoid(logits)
            res = jax.vmap(lambda p: postprocess(p, post, hv))(probs)
            return probs, res

        return self._cached(("batch", size, post, hv), lambda: fn)

    # -- int8 quantized serving (see vickers_tpu.quant) ---------------------
    def enable_quant(self, calib_imgs_u8: np.ndarray) -> None:
        """Calibrate + quantize from (N, S, S, 3) uint8 RGB samples.
        Subsequent ``detect_batch(..., quantized=True)`` runs int8 convs."""
        from vickers_tpu.quant import calibrate, quantize

        calib = I.normalize_imagenet(jnp.asarray(calib_imgs_u8, jnp.float32))
        folded, absmax = calibrate(self.params, self.batch_stats, calib)
        self.qparams = quantize(folded, absmax)

    def _batch_fn_quant(self, size: int, post: PostprocessConfig, hv: HVConfig):
        # the XLA int8 requant path is the one production int8 forward (the
        # Pallas fused and s2d variants measured slower on-chip and were
        # deleted; BENCH.md records the numbers)
        from vickers_tpu.quant import quant_forward

        fwd = quant_forward

        @jax.jit
        def fn(qparams, imgs_u8):
            x = I.normalize_imagenet(imgs_u8.astype(jnp.float32))
            logits = fwd(qparams, x)[..., 0]
            probs = jax.nn.sigmoid(logits)
            res = jax.vmap(lambda p: postprocess(p, post, hv))(probs)
            return probs, res

        return self._cached(("batch_q", size, post, hv), lambda: fn)

    def _variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    # -- public API --------------------------------------------------------
    def infer(self, img_bgr: np.ndarray) -> np.ndarray:
        """Compat API (Segmenter.infer, ui_infer_rectangle.py:537-564):
        BGR uint8 -> prob map float32 [0, 1] at original resolution."""
        h, w = img_bgr.shape[:2]
        geom = I.letterbox_geometry(h, w, self.img_size, self.cfg.letterbox)
        rgb = jnp.asarray(img_bgr[:, :, ::-1], jnp.float32)
        return np.asarray(self._prob_fn(geom)(self._variables(), rgb))

    def detect(self, img_bgr: np.ndarray
               ) -> Tuple[np.ndarray, List[Detection]]:
        """TPU-native path: (prob at MODEL resolution, detections in
        original pixel coordinates)."""
        h, w = img_bgr.shape[:2]
        geom = I.letterbox_geometry(h, w, self.img_size, self.cfg.letterbox)
        rgb = jnp.asarray(img_bgr[:, :, ::-1], jnp.float32)
        prob, res = self._detect_fn(geom, self.cfg.post, self.cfg.hv)(
            self._variables(), rgb
        )
        if bool(res.overflow):
            # run-CC row-run table overflowed on this image (pathological
            # run count per row) — redo with the exact pixel labeler so no
            # detection is silently dropped (ops.components exactness bound)
            import dataclasses

            exact = dataclasses.replace(self.cfg.post, cc_impl="pixel")
            prob, res = self._detect_fn(geom, exact, self.cfg.hv)(
                self._variables(), rgb
            )
        return np.asarray(prob), _rescale_detections(res.detections, geom, self.cfg.hv)

    def detect_batch(self, imgs_rgb_u8: np.ndarray, quantized: bool = False):
        """Serving path: (B, S, S, 3) uint8 RGB already letterboxed ->
        (probs (B, S, S), device PostprocessResult with leading batch axis).
        ``quantized=True`` requires a prior ``enable_quant`` call.

        The result's ``overflow`` field is a (B,) bool: True marks images
        whose run-table bound was exceeded (possible dropped detections).
        This hot path stays sync-free; callers wanting exactness on flagged
        images re-run those through ``detect`` (which auto-reroutes to the
        exact pixel labeler)."""
        if quantized:
            if getattr(self, "qparams", None) is None:
                raise RuntimeError("call enable_quant(calib_images) first")
            fn = self._batch_fn_quant(imgs_rgb_u8.shape[1], self.cfg.post,
                                      self.cfg.hv)
            return fn(self.qparams, jnp.asarray(imgs_rgb_u8))
        fn = self._batch_fn(imgs_rgb_u8.shape[1], self.cfg.post, self.cfg.hv)
        return fn(self._variables(), jnp.asarray(imgs_rgb_u8))


# Reference-compatible alias (ui_infer_* construct Segmenter(model_dir, size))
class Segmenter(InferenceEngine):
    def __init__(self, model_dir: str, img_size: int = 512, **kw):
        super().__init__(model_dir=model_dir, img_size=img_size, **kw)
