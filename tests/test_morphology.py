"""Morphology parity vs cv2.morphologyEx on random and real masks."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from vickers_tpu.ops import morphology as M


@pytest.mark.parametrize("size", [3, 5, 7])
def test_ellipse_kernel_matches_cv2(size):
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
    r = size // 2
    ours = np.zeros((size, size), np.uint8)
    for dy, dx in M.ellipse_kernel(size):
        ours[dy + r, dx + r] = 1
    assert np.array_equal(ours, se)


def _rand_mask(h=128, w=160, seed=0):
    rng = np.random.default_rng(seed)
    m = (rng.random((h, w)) > 0.6).astype(np.uint8)
    # add a blob so the mask isn't pure noise
    cv2.circle(m, (w // 2, h // 2), 30, 1, -1)
    return m


@pytest.mark.parametrize("op,cv2_op", [("open", cv2.MORPH_OPEN), ("close", cv2.MORPH_CLOSE)])
@pytest.mark.parametrize("ksize", [3, 5])
@pytest.mark.parametrize("iters", [1, 2])
def test_open_close_match_cv2(op, cv2_op, ksize, iters):
    m = _rand_mask(seed=ksize * 7 + iters)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    ref = cv2.morphologyEx(m * 255, cv2_op, k, iterations=iters) > 0
    fn = M.morph_open if op == "open" else M.morph_close
    ours = np.asarray(fn(jnp.asarray(m, jnp.float32), ksize, iters)) > 0.5
    assert np.array_equal(ours, ref)


def test_dilate_erode_match_cv2():
    m = _rand_mask(seed=3)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    ref_d = cv2.dilate(m * 255, k, iterations=1) > 0
    ref_e = cv2.erode(m * 255, k, iterations=1) > 0
    ours_d = np.asarray(M.dilate(jnp.asarray(m, jnp.float32), 5)) > 0.5
    ours_e = np.asarray(M.erode(jnp.asarray(m, jnp.float32), 5)) > 0.5
    assert np.array_equal(ours_d, ref_d)
    assert np.array_equal(ours_e, ref_e)


def test_clean_binary_matches_reference_chain(reference_masks):
    """Threshold + open + close on real masks downscaled to 512-letterbox size,
    mirroring postprocess_minarearect_multi steps 1-2
    (ui_infer_rectangle.py:321-328)."""
    for name, m in reference_masks:
        prob = cv2.resize(m.astype(np.float32), (512, 341), interpolation=cv2.INTER_LINEAR)
        ref = (prob >= 0.5).astype(np.uint8) * 255
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        ref = cv2.morphologyEx(ref, cv2.MORPH_OPEN, k, iterations=1)
        ref = cv2.morphologyEx(ref, cv2.MORPH_CLOSE, k, iterations=1) > 0
        ours = np.asarray(M.clean_binary(jnp.asarray(prob), 0.5)) > 0.5
        assert np.array_equal(ours, ref), name
