"""The full geometry post-processing pipeline as one jittable device program.

Equivalent of ``postprocess_minarearect_multi`` in both reference GUIs
(ui_infer_rectangle.py:291-381 rect variant; ui_infer_quadrilateral.py:423-530
quad variant) — prob map → binary → open/close → connected components →
per-component rect/quad fit → diagonals → HV — with static shapes and no host
sync.  Detections come back as fixed-size (K,) arrays with a validity mask
instead of a Python list.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vickers_tpu.core.config import FitMode, HVConfig, PostprocessConfig
from vickers_tpu.ops import geometry as G
from vickers_tpu.ops import morphology as M
from vickers_tpu.ops.components import (Components, extract_components,
                                        extract_components_runs)


class Detections(NamedTuple):
    """Fixed-size detection set in *mask* coordinates (see
    ``infer.engine`` for the rescale to original image pixels).

    All arrays lead with the K = max_components axis; ``valid`` masks real
    detections, which are sorted by area descending (reference sorts the same
    way, ui_infer_rectangle.py:381)."""

    valid: jax.Array    # (K,) bool
    area: jax.Array     # (K,) float32 — component pixel area
    box: jax.Array      # (K, 4, 2) float32 — rect/quad corners (x, y)
    center: jax.Array   # (K, 2) float32
    d1: jax.Array       # (K,) float32 — longest diagonal
    d2: jax.Array       # (K,) float32
    d_mean: jax.Array   # (K,) float32
    hv: jax.Array       # (K,) float32 — Vickers hardness from d_mean
    quality: jax.Array  # (K,) float32 — quad shape quality (1.0 for rect fit)


class PostprocessResult(NamedTuple):
    clean: jax.Array        # (H, W) float32 0/1 — reference's clean_bin
    detections: Detections
    # () bool — run-CC row-run table overflowed (some row had more than
    # cfg.max_runs_per_row runs, results may have dropped components);
    # always False on the exact pixel path.  InferenceEngine.detect
    # auto-reroutes flagged images through the pixel labeler.
    overflow: jax.Array


@functools.partial(jax.jit, static_argnames=("cfg", "hv"))
def postprocess(
    prob: jax.Array,
    cfg: PostprocessConfig,
    hv: HVConfig,
) -> PostprocessResult:
    """prob: (H, W) float32 in [0, 1] at mask resolution."""
    h, w = prob.shape
    min_area = jnp.maximum(
        cfg.min_area_floor, jnp.int32(cfg.min_area_frac * h * w)
    )

    mask = M.clean_binary(
        prob, cfg.bin_thresh, cfg.morph_kernel, cfg.open_iter, cfg.close_iter
    )
    if cfg.cc_impl == "runs":
        # fast path: row-run compression + run-graph fixpoint (see
        # ops.components docstring for the exactness bound)
        rc = extract_components_runs(
            mask, min_area, max_components=cfg.max_components,
            max_runs=cfg.max_runs_per_row, max_sweeps=cfg.cc_max_iters,
        )
        areas, valid, clean = rc.areas, rc.valid, rc.clean
        ext = G.RowExtents(xmin=rc.xmin, xmax=rc.xmax, any_row=rc.any_row)
        fit_ext = None   # Minkowski outset replaces the dilation pass
        overflow = rc.overflow
    else:
        comps: Components = extract_components(
            mask, min_area, max_components=cfg.max_components,
            max_iters=cfg.cc_max_iters,
        )
        areas, valid, clean = comps.areas, comps.valid, comps.clean
        ext = G.row_extents(comps.masks)
        fit_ext = None
        overflow = jnp.bool_(False)
        if cfg.fit == FitMode.QUAD and cfg.fit_outset_px > 0:
            # fit-only dilation (ui_infer_quadrilateral.py:478-481): enlarges
            # the boundary used for fitting without touching area stats.
            ksz = max(3, cfg.fit_outset_px * 2 + 1)
            fit_masks = jax.vmap(lambda m: M.dilate(m, ksz, 1))(
                comps.masks.astype(jnp.float32))
            fit_ext = G.row_extents(fit_masks > 0.5)

    rect = G.min_area_rect(ext, cfg.rect_coarse_angles, cfg.rect_refine_angles)

    if cfg.fit == FitMode.RECT:
        box = jax.vmap(G.order_quad_cw)(rect.box)
        center = rect.center
        quality = jnp.ones((cfg.max_components,), jnp.float32)
    else:
        ksz = max(3, cfg.fit_outset_px * 2 + 1) if cfg.fit_outset_px > 0 else 0
        if fit_ext is not None:
            box = G.quad_corners(fit_ext, rect.theta)
        else:
            box = G.quad_corners(ext, rect.theta, outset_ksize=ksz)
        center = jnp.mean(box, axis=1)   # vertex mean (ui_infer_quadrilateral.py:506)
        quality = jax.vmap(G.quad_quality)(box)

    d1, d2 = jax.vmap(G.diagonals_from_box)(box)
    d_mean = 0.5 * (d1 + d2)
    hv_vals = G.vickers_hv(d_mean, hv.um_per_px, hv.force_kgf)

    v = valid
    det = Detections(
        valid=v,
        area=jnp.where(v, areas.astype(jnp.float32), 0.0),
        box=jnp.where(v[:, None, None], box, 0.0),
        center=jnp.where(v[:, None], center, 0.0),
        d1=jnp.where(v, d1, 0.0),
        d2=jnp.where(v, d2, 0.0),
        d_mean=jnp.where(v, d_mean, 0.0),
        hv=jnp.where(v, hv_vals, 0.0),
        quality=jnp.where(v, quality, 0.0),
    )
    return PostprocessResult(clean=clean, detections=det, overflow=overflow)
