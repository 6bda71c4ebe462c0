"""Native C++ library parity vs cv2 (geometry + decoder)."""

import numpy as np
import pytest

from vickers_tpu import native


@pytest.fixture(scope="module")
def geom():
    g = native.geometry()
    if g is None:
        pytest.skip("native geometry lib unavailable (no toolchain)")
    return g


@pytest.fixture(scope="module")
def dec():
    d = native.decoder()
    if d is None:
        pytest.skip("native decoder lib unavailable")
    return d


def test_native_hv(geom):
    assert abs(geom.hv(100.0, 2.0, 1.0) - 46.36) < 0.01


def test_native_postprocess_vs_cv2(geom, reference_masks):
    import cv2

    for name, m in reference_masks:
        prob = cv2.resize(m.astype(np.float32), (512, 341),
                          interpolation=cv2.INTER_LINEAR)
        clean, dets = geom.postprocess(prob)

        # cv2 oracle (the reference chain)
        mask = (prob >= 0.5).astype(np.uint8) * 255
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k, 1)
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k, 1)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, 8)
        min_area = max(200, int(0.0008 * prob.size))
        refs = []
        for i in range(1, n):
            area = int(stats[i, cv2.CC_STAT_AREA])
            if area < min_area:
                continue
            mi = (labels == i).astype(np.uint8) * 255
            cnts, _ = cv2.findContours(mi, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
            rect = cv2.minAreaRect(max(cnts, key=cv2.contourArea))
            box = cv2.boxPoints(rect)
            d = sorted(np.linalg.norm(box[a] - box[b])
                       for a in range(4) for b in range(a + 1, 4))
            refs.append({"area": area, "d_mean": 0.5 * (d[-1] + d[-2]),
                         "center": rect[0]})
        refs.sort(key=lambda r: -r["area"])

        assert len(dets) == len(refs), name
        for ours, ref in zip(dets, refs):
            assert abs(ours["area"] - ref["area"]) <= max(3, 0.01 * ref["area"]), name
            assert abs(ours["d_mean"] - ref["d_mean"]) < max(2.0, 0.01 * ref["d_mean"]), name
            assert np.linalg.norm(np.array(ours["center"]) - np.array(ref["center"])) < 3.0, name


def test_native_postprocess_agrees_with_jax(geom, reference_masks):
    """Two independent implementations (C++ host / JAX device) must agree."""
    import cv2
    import jax.numpy as jnp

    from vickers_tpu.core.config import HVConfig, PostprocessConfig
    from vickers_tpu.ops.postprocess import postprocess

    name, m = reference_masks[0]
    prob = cv2.resize(m.astype(np.float32), (512, 341),
                      interpolation=cv2.INTER_LINEAR)
    _, dets_native = geom.postprocess(prob)
    res = postprocess(jnp.asarray(prob), PostprocessConfig(), HVConfig())
    det = res.detections
    nv = int(np.asarray(det.valid).sum())
    assert nv == len(dets_native)
    for i in range(nv):
        assert abs(float(det.d_mean[i]) - dets_native[i]["d_mean"]) < 2.0


def test_native_decode_png_matches_cv2(dec, tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (200, 300, 3), np.uint8)
    p = tmp_path / "t.png"
    cv2.imwrite(str(p), img)

    out, (h, w) = dec.decode_letterbox(str(p), 128, "center_upscale")
    assert (h, w) == (200, 300)

    # cv2 oracle: BGR read -> RGB -> resize -> pad (the loader pipeline)
    ref_rgb = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
    scale = 128 / 300
    nh, nw = int(round(200 * scale)), 128
    rs = cv2.resize(ref_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
    top = (128 - nh) // 2
    ref = np.zeros((128, 128, 3), np.uint8)
    ref[top:top + nh, :nw] = rs
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_native_decode_jpeg(dec, tmp_path):
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    p = tmp_path / "t.jpg"
    cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    out, (h, w) = dec.decode_letterbox(str(p), 128, "center_upscale")
    assert (h, w) == (96, 128)
    ref_rgb = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
    # different IDCT implementations: allow small per-pixel deviation
    # on the resized content region
    nh = int(round(96 * (128 / 128)))
    rs = cv2.resize(ref_rgb, (128, nh), interpolation=cv2.INTER_LINEAR)
    top = (128 - nh) // 2
    region = out[top:top + nh]
    assert np.mean(np.abs(region.astype(int) - rs.astype(int))) < 3.0


def test_native_decode_batch(dec, tmp_path):
    import cv2

    paths = []
    for i in range(5):
        img = np.full((64, 80, 3), i * 40, np.uint8)
        p = tmp_path / f"b{i}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.png"))
    out, hw, failures = dec.decode_batch(paths, 96, threads=4)
    assert failures == 1
    assert out.shape == (6, 96, 96, 3)
    assert np.all(hw[:5] == [64, 80])


def test_native_real_reference_images(dec):
    from pathlib import Path

    imgs = sorted(Path("/root/reference/data/images").glob("*.PNG"))[:2]
    if not imgs:
        pytest.skip("reference data unavailable")
    import cv2

    for p in imgs:
        out, (h, w) = dec.decode_letterbox(str(p), 512, "center_upscale")
        ref = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        assert (h, w) == ref.shape[:2]
        assert out.max() > 0
