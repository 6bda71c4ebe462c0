"""Faithful numpy/cv2 port of the reference's robust quadrilateral pipeline.

Test oracle only — mirrors /root/reference/ui_infer_quadrilateral.py:
- _order_quad_cw            (:262-274)
- _is_convex_quad           (:277-290)
- _poly_area                (:293-296)
- _quad_quality             (:299-325)
- robust_quadrilateral_from_contour (:331-417)
- postprocess_minarearect_multi     (:423-530, quad variant)
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def order_quad_cw(pts: np.ndarray) -> np.ndarray:
    p = pts.astype(np.float32).reshape(-1, 2)
    c = p.mean(axis=0)
    ang = np.arctan2(p[:, 1] - c[1], p[:, 0] - c[0])
    idx = np.argsort(ang)
    p = p[idx[::-1]]
    k = np.lexsort((p[:, 0], p[:, 1]))[0]
    return np.roll(p, -k, axis=0)


def is_convex_quad(p: np.ndarray) -> bool:
    p = p.reshape(4, 2)
    sgn = []
    for i in range(4):
        a, b, c = p[i], p[(i + 1) % 4], p[(i + 2) % 4]
        v1 = b - a
        v2 = c - b
        sgn.append(v1[0] * v2[1] - v1[1] * v2[0])
    return all(x >= 0 for x in sgn) or all(x <= 0 for x in sgn)


def poly_area(p: np.ndarray) -> float:
    x, y = p[:, 0], p[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) * 0.5


def quad_quality(p: np.ndarray) -> float:
    p = p.reshape(4, 2)
    dists = [np.linalg.norm(p[i] - p[(i + 1) % 4]) for i in range(4)]
    peri = sum(dists) + 1e-6
    penalties = []
    for i in range(4):
        a, b, c = p[(i - 1) % 4], p[i], p[(i + 1) % 4]
        v1, v2 = a - b, c - b
        cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2) + 1e-6)
        ang = math.degrees(math.acos(np.clip(cos, -1, 1)))
        penalties.append(0.0 if 15.0 <= ang <= 165.0 else 1.0)
    ang_pen = np.mean(penalties)
    ed_ratio = (max(dists) + 1e-6) / (min(dists) + 1e-6)
    ed_pen = min(1.0, abs(ed_ratio - 1.0))
    return (1.0 - 0.5 * ang_pen) * (1.0 - 0.5 * ed_pen) * (peri / (peri + 1000.0))


def robust_quadrilateral_from_contour(cnt, want_convex=True, max_iter=25):
    pts = cnt.reshape(-1, 2).astype(np.float32)
    if pts.shape[0] < 4:
        return None
    hull = cv2.convexHull(pts).reshape(-1, 2).astype(np.float32)

    def _try_poly_dp(poly):
        peri = cv2.arcLength(poly.reshape(-1, 1, 2), True)
        lo, hi = 0.001 * peri, 0.08 * peri
        best4 = None
        for _ in range(max_iter):
            mid = 0.5 * (lo + hi)
            appr = cv2.approxPolyDP(poly.reshape(-1, 1, 2), epsilon=mid,
                                    closed=True)
            n = len(appr)
            if n == 4:
                cand = order_quad_cw(appr.reshape(-1, 2).astype(np.float32))
                if poly_area(cand) > 10 and (
                        not want_convex or is_convex_quad(cand)):
                    best4 = cand
                    break
                else:
                    lo = mid
            elif n > 4:
                lo = mid
            else:
                hi = mid
            if abs(hi - lo) < 1e-6:
                break
        return best4

    candidates = []
    for poly in (pts, hull):
        got = _try_poly_dp(poly)
        if got is not None:
            candidates.append(got)

    if not candidates:
        for poly in (pts, hull):
            peri = cv2.arcLength(poly.reshape(-1, 1, 2), True)
            eps = 0.01 * peri
            appr = cv2.approxPolyDP(poly.reshape(-1, 1, 2), eps, True
                                    ).reshape(-1, 2).astype(np.float32)
            k = len(appr)
            if k > 4:
                for s in range(0, min(12, k)):
                    idx = np.arange(s, s + 4) % k
                    cand = order_quad_cw(appr[idx])
                    if poly_area(cand) > 10 and (
                            not want_convex or is_convex_quad(cand)):
                        candidates.append(cand)

    if not candidates:
        xs, ys = hull[:, 0], hull[:, 1]
        raw = np.array([hull[int(np.argmin(ys))], hull[int(np.argmax(xs))],
                        hull[int(np.argmax(ys))], hull[int(np.argmin(xs))]],
                       np.float32)
        cand = order_quad_cw(raw)
        if poly_area(cand) > 10:
            candidates.append(cand)

    if not candidates:
        return None
    candidates.sort(key=lambda q: (quad_quality(q), poly_area(q)),
                    reverse=True)
    return candidates[0]


def quad_postprocess_reference(prob01, bin_thresh=0.45, min_area_frac=0.0008,
                               morph_kernel=3, open_iter=1, close_iter=1,
                               fit_outset_px=2):
    """Reference quad postprocess (ui_infer_quadrilateral.py:423-530)."""
    h, w = prob01.shape[:2]
    min_area = max(200, int(min_area_frac * h * w))
    mask = (prob01 >= bin_thresh).astype(np.uint8) * 255
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                  (morph_kernel, morph_kernel))
    if open_iter > 0:
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k, iterations=open_iter)
    if close_iter > 0:
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k,
                                iterations=close_iter)
    num_labels, labels, stats, _ = cv2.connectedComponentsWithStats(
        mask, connectivity=8)
    keep = [(i, int(stats[i, cv2.CC_STAT_AREA])) for i in range(1, num_labels)
            if stats[i, cv2.CC_STAT_AREA] >= min_area]
    k_fit = None
    if fit_outset_px > 0:
        ksz = max(3, fit_outset_px * 2 + 1)
        k_fit = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksz, ksz))
    detections = []
    for i, area in keep:
        mask_i = (labels == i).astype(np.uint8) * 255
        mask_fit = cv2.dilate(mask_i, k_fit, 1) if k_fit is not None else mask_i
        cnts, _ = cv2.findContours(mask_fit, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
        if not cnts:
            continue
        cnt = max(cnts, key=cv2.contourArea)
        quad = robust_quadrilateral_from_contour(cnt, want_convex=True)
        if quad is None:
            continue
        quad = order_quad_cw(quad).astype(np.int32)
        pairs = []
        for a in range(4):
            for b in range(a + 1, 4):
                pairs.append((float(np.linalg.norm(quad[a] - quad[b])), a, b))
        pairs.sort(reverse=True, key=lambda x: x[0])
        _, i1, j1 = pairs[0]
        rest = [kk for kk in range(4) if kk not in (i1, j1)]
        d1 = float(np.linalg.norm(quad[i1] - quad[j1]))
        d2 = float(np.linalg.norm(quad[rest[0]] - quad[rest[1]]))
        detections.append({"label": i, "area": area, "box": quad,
                           "d1": d1, "d2": d2, "d_mean": 0.5 * (d1 + d2)})
    detections.sort(key=lambda x: x["area"], reverse=True)
    return detections
