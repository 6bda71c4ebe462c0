"""Rotated-rectangle / quadrilateral fitting and Vickers measurement, on device.

TPU-native replacement for the reference's OpenCV geometry chain:

- ``min_area_rect``: cv2.minAreaRect (ui_infer_rectangle.py:346-354) recast as
  a support-function angle scan.  For a fixed direction θ the extreme of
  x·cosθ + y·sinθ over a pixel set depends only on each row's x-extents, so
  one (K, H) min/max pair evaluates every angle exactly in O(H) instead of
  O(H·W).  A coarse scan over [0°, 90°) plus one refinement pass brings the
  angular error below 0.01°, i.e. sub-0.1 px corner error at 1000 px scale.
- ``quad_corners``: the robust quadrilateral fit
  (ui_infer_quadrilateral.py:331-417) re-thought for TPU: the four corners of
  a Vickers indentation are the hull's extreme points along the rect's
  diagonal directions (θ*+45°+k·90°).  This replaces the approxPolyDP epsilon
  binary search with a closed-form, fully-batched extreme-point query and is
  always convex by construction.
- ``diagonals_from_box``: the "two longest segments that don't share an
  endpoint" rule (ui_infer_rectangle.py:356-369).
- ``vickers_hv``: HV = 1.8544·F/d² — the extension the reference never
  implemented (SURVEY §0 scope note).

All shapes static; everything vmaps over the K-component axis.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


class RowExtents(NamedTuple):
    xmin: jax.Array   # (K, H) float32, +BIG on empty rows
    xmax: jax.Array   # (K, H) float32, -BIG on empty rows
    any_row: jax.Array  # (K, H) bool


@jax.jit
def row_extents(masks: jax.Array) -> RowExtents:
    """Per-row x extents for each component mask (K, H, W) bool."""
    k, h, w = masks.shape
    cols = jnp.arange(w, dtype=jnp.float32)
    xmin = jnp.min(jnp.where(masks, cols[None, None, :], _BIG), axis=2)
    xmax = jnp.max(jnp.where(masks, cols[None, None, :], -_BIG), axis=2)
    return RowExtents(xmin=xmin, xmax=xmax, any_row=jnp.any(masks, axis=2))


def _support_minmax(ext: RowExtents, cos_t: jax.Array, sin_t: jax.Array):
    """min/max of x·cosθ + y·sinθ over each component for a batch of angles.

    cos_t/sin_t: (A,).  Returns (K, A) mins and maxs.  Exact for any sign of
    cosθ because the extreme per row is at xmin or xmax (linearity in x).
    """
    rows = jnp.arange(ext.xmin.shape[1], dtype=jnp.float32)  # (H,)
    # (K, H, A)
    lo = ext.xmin[:, :, None] * cos_t[None, None, :]
    hi = ext.xmax[:, :, None] * cos_t[None, None, :]
    ybit = rows[None, :, None] * sin_t[None, None, :]
    per_row_max = jnp.maximum(lo, hi) + ybit
    per_row_min = jnp.minimum(lo, hi) + ybit
    valid = ext.any_row[:, :, None]
    mx = jnp.max(jnp.where(valid, per_row_max, -_BIG), axis=1)
    mn = jnp.min(jnp.where(valid, per_row_min, _BIG), axis=1)
    return mn, mx


def _rect_quality(ext: RowExtents, thetas: jax.Array):
    """Bounding-rect area for each angle: (K, A)."""
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    umin, umax = _support_minmax(ext, c, s)
    vmin, vmax = _support_minmax(ext, -s, c)
    return (umax - umin) * (vmax - vmin), (umin, umax, vmin, vmax)


class RectFit(NamedTuple):
    theta: jax.Array    # (K,) radians in [0, pi/2)
    box: jax.Array      # (K, 4, 2) float32 corner xy
    center: jax.Array   # (K, 2)
    size: jax.Array     # (K, 2) (w, h) along (u, v)


@functools.partial(jax.jit, static_argnames=("coarse", "refine"))
def min_area_rect(ext: RowExtents, coarse: int = 192, refine: int = 64) -> RectFit:
    """Minimum-area bounding rectangle over each component's pixel set."""
    k = ext.xmin.shape[0]
    t0 = jnp.linspace(0.0, math.pi / 2.0, coarse, endpoint=False)
    areas, _ = _rect_quality(ext, t0)
    best = jnp.argmin(areas, axis=1)                     # (K,)
    step = (math.pi / 2.0) / coarse

    # refinement window ±step around the coarse best, per component
    offs = jnp.linspace(-step, step, refine)             # (R,)
    # evaluate per-component angle sets: vmap over K with its own angles
    def refine_one(ext_k: RowExtents, center_theta):
        ts = center_theta + offs
        areas, (umin, umax, vmin, vmax) = _rect_quality(
            RowExtents(ext_k.xmin[None], ext_k.xmax[None], ext_k.any_row[None]), ts
        )
        i = jnp.argmin(areas[0])
        return ts[i], umin[0, i], umax[0, i], vmin[0, i], vmax[0, i]

    theta_c = t0[best]
    theta, umin, umax, vmin, vmax = jax.vmap(refine_one)(
        RowExtents(ext.xmin, ext.xmax, ext.any_row), theta_c
    )

    c, s = jnp.cos(theta), jnp.sin(theta)
    # corners in (u, v), mapped back via [x; y] = [[c, -s], [s, c]] @ [u; v]
    uu = jnp.stack([umin, umax, umax, umin], axis=1)     # (K, 4)
    vv = jnp.stack([vmin, vmin, vmax, vmax], axis=1)
    bx = uu * c[:, None] - vv * s[:, None]
    by = uu * s[:, None] + vv * c[:, None]
    box = jnp.stack([bx, by], axis=2)
    uc, vc = (umin + umax) / 2, (vmin + vmax) / 2
    center = jnp.stack([uc * c - vc * s, uc * s + vc * c], axis=1)
    size = jnp.stack([umax - umin, vmax - vmin], axis=1)
    return RectFit(theta=theta, box=box, center=center, size=size)


def _extreme_point(ext: RowExtents, cos_t: jax.Array, sin_t: jax.Array) -> jax.Array:
    """argmax of x·cosθ + y·sinθ per component: (K, A) angles -> (K, A, 2) xy."""
    rows = jnp.arange(ext.xmin.shape[1], dtype=jnp.float32)
    lo = ext.xmin[:, :, None] * cos_t[None, None, :]
    hi = ext.xmax[:, :, None] * cos_t[None, None, :]
    use_min = lo >= hi
    per_row_val = jnp.where(use_min, lo, hi) + rows[None, :, None] * sin_t[None, None, :]
    per_row_val = jnp.where(ext.any_row[:, :, None], per_row_val, -_BIG)
    r_star = jnp.argmax(per_row_val, axis=1)             # (K, A)
    x_of = jnp.where(use_min, ext.xmin[:, :, None], ext.xmax[:, :, None])  # (K, H, A)
    x_star = jnp.take_along_axis(x_of, r_star[:, None, :], axis=1)[:, 0, :]
    return jnp.stack([x_star, r_star.astype(jnp.float32)], axis=2)


def order_quad_cw(quad: jax.Array) -> jax.Array:
    """CW vertex order, starting at (min-y, tie min-x) — parity with
    _order_quad_cw (ui_infer_quadrilateral.py:262-274)."""
    c = jnp.mean(quad, axis=0)
    ang = jnp.arctan2(quad[:, 1] - c[1], quad[:, 0] - c[0])
    idx = jnp.argsort(-ang)                              # descending = CW (y down)
    p = quad[idx]
    key = p[:, 1] * 1e6 + p[:, 0]
    k = jnp.argmin(key)
    return jnp.roll(p, -k, axis=0)


def se_support_offsets(theta: jax.Array, ksize: int) -> jax.Array:
    """Support points of the elliptical SE along the quad-diagonal directions.

    Dilating a pixel set by a structuring element is a Minkowski sum, and the
    support (extreme) point of a Minkowski sum decomposes:
    extreme(A ⊕ SE, d) = extreme(A, d) + extreme(SE, d).  So the reference's
    fit-only dilation (ui_infer_quadrilateral.py:478-481) reduces to adding
    the SE's own extreme offset to each corner — no (K, H, W) dilation pass.
    Returns (K, 4, 2) xy offsets for directions θ+45°+k·90°."""
    from vickers_tpu.ops.morphology import ellipse_kernel

    offs = jnp.asarray(ellipse_kernel(ksize), jnp.float32)       # (M, 2) (dy, dx)
    dirs = theta[:, None] + (math.pi / 4.0) + jnp.arange(4)[None, :] * (math.pi / 2.0)
    c, s = jnp.cos(dirs), jnp.sin(dirs)                          # (K, 4)
    val = offs[None, None, :, 1] * c[..., None] + offs[None, None, :, 0] * s[..., None]
    i = jnp.argmax(val, axis=-1)                                 # (K, 4)
    return jnp.stack([offs[:, 1][i], offs[:, 0][i]], axis=-1)    # (K, 4, 2) xy


@functools.partial(jax.jit, static_argnames=("outset_ksize",))
def quad_corners(ext: RowExtents, theta: jax.Array,
                 outset_ksize: int = 0) -> jax.Array:
    """Four hull extreme points along the rect-diagonal directions.

    ``outset_ksize`` > 0 applies the reference's fit-only dilation
    (ui_infer_quadrilateral.py:478-481) as an exact Minkowski support-point
    adjustment (see ``se_support_offsets``); alternatively pass ext of
    pre-dilated masks with outset_ksize=0.  Returns (K, 4, 2) CW quads."""
    k = ext.xmin.shape[0]
    dirs = theta[:, None] + (math.pi / 4.0) + jnp.arange(4)[None, :] * (math.pi / 2.0)

    def one(ext_k, dirs_k):
        return _extreme_point(
            RowExtents(ext_k.xmin[None], ext_k.xmax[None], ext_k.any_row[None]),
            jnp.cos(dirs_k), jnp.sin(dirs_k),
        )[0]                                             # (4, 2)

    pts = jax.vmap(one)(RowExtents(ext.xmin, ext.xmax, ext.any_row), dirs)
    if outset_ksize > 0:
        pts = pts + se_support_offsets(theta, outset_ksize)
    return jax.vmap(order_quad_cw)(pts)


def is_convex_quad(quad: jax.Array) -> jax.Array:
    """Cross-product sign consistency (ui_infer_quadrilateral.py:277-290)."""
    nxt = jnp.roll(quad, -1, axis=0)
    nxt2 = jnp.roll(quad, -2, axis=0)
    v1 = nxt - quad
    v2 = nxt2 - nxt
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    return jnp.all(cross >= 0) | jnp.all(cross <= 0)


def poly_area(quad: jax.Array) -> jax.Array:
    """Shoelace (ui_infer_quadrilateral.py:293-296)."""
    x, y = quad[:, 0], quad[:, 1]
    return jnp.abs(jnp.dot(x, jnp.roll(y, -1)) - jnp.dot(y, jnp.roll(x, -1))) * 0.5


def quad_quality(quad: jax.Array) -> jax.Array:
    """Shape-quality score (ui_infer_quadrilateral.py:299-325): angle-range
    [15°, 165°] penalty × edge-uniformity penalty × perimeter weight."""
    p = quad
    nxt = jnp.roll(p, -1, axis=0)
    prv = jnp.roll(p, 1, axis=0)
    d = jnp.linalg.norm(nxt - p, axis=1)
    peri = jnp.sum(d) + 1e-6
    v1 = prv - p
    v2 = nxt - p
    cos = jnp.sum(v1 * v2, axis=1) / (
        jnp.linalg.norm(v1, axis=1) * jnp.linalg.norm(v2, axis=1) + 1e-6
    )
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    pen = jnp.where((ang >= 15.0) & (ang <= 165.0), 0.0, 1.0)
    ang_pen = jnp.mean(pen)
    ed_ratio = (jnp.max(d) + 1e-6) / (jnp.min(d) + 1e-6)
    ed_pen = jnp.minimum(1.0, jnp.abs(ed_ratio - 1.0))
    return (1.0 - 0.5 * ang_pen) * (1.0 - 0.5 * ed_pen) * (peri / (peri + 1000.0))


# Lookup tables for the 6 unordered point pairs of a quad.
_PAIR_A = jnp.array([0, 0, 0, 1, 1, 2])
_PAIR_B = jnp.array([1, 2, 3, 2, 3, 3])
# complement pair index: pairs (a,b) and (c,d) with {a,b,c,d} = {0,1,2,3}
_COMPL = jnp.array([5, 4, 3, 2, 1, 0])


def diagonals_from_box(box: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """The reference's rule (ui_infer_rectangle.py:356-369): of all pairwise
    segments take the longest; the second diagonal joins the two remaining
    points.  box: (4, 2).  Returns (d1, d2)."""
    pa = box[_PAIR_A]
    pb = box[_PAIR_B]
    dist = jnp.linalg.norm(pa - pb, axis=1)              # (6,)
    i1 = jnp.argmax(dist)
    i2 = _COMPL[i1]
    return dist[i1], dist[i2]


def vickers_hv(d_px: jax.Array, um_per_px: float, force_kgf: float) -> jax.Array:
    """HV = 1.8544 · F / d² with d in mm (standard Vickers formula)."""
    d_mm = d_px * (um_per_px / 1000.0)
    return 1.8544 * force_kgf / jnp.maximum(d_mm * d_mm, 1e-12)
