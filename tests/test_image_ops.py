"""Letterbox / resize / normalize parity vs OpenCV and the reference formulas."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from vickers_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD, LetterboxMode
from vickers_tpu.ops import image as I


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("hw", [(1024, 1280), (2048, 3072), (512, 512), (300, 700)])
def test_geometry_center_no_upscale_matches_reference(hw):
    """letterbox_square arithmetic (ui_infer_rectangle.py:231-238)."""
    h, w = hw
    size = 512
    g = I.letterbox_geometry(h, w, size, LetterboxMode.CENTER_NO_UPSCALE)
    scale = min(size / max(h, w), 1.0)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    assert (g.new_h, g.new_w) == (nh, nw)
    assert g.pad_top == (size - nh) // 2
    assert g.pad_bottom == size - nh - g.pad_top
    assert g.pad_left == (size - nw) // 2
    assert g.pad_right == size - nw - g.pad_left


def test_geometry_corner_upscale_matches_infer_pth_gui():
    """letterbox_pad arithmetic (infer_pth_gui.py:17-24): can upscale,
    pads right/bottom only."""
    h, w, size = 300, 400, 512
    g = I.letterbox_geometry(h, w, size, LetterboxMode.CORNER_UPSCALE)
    scale = min(size / h, size / w)
    assert scale > 1.0
    assert (g.new_h, g.new_w) == (int(round(h * scale)), int(round(w * scale)))
    assert g.pad_top == 0 and g.pad_left == 0


def test_resize_linear_matches_cv2_downscale():
    img = _rand_img(1024, 1280)
    out = np.asarray(I.resize_linear(jnp.asarray(img), 410, 512))
    ref = cv2.resize(img, (512, 410), interpolation=cv2.INTER_LINEAR)
    # identical half-pixel sampling; uint8 rounding can differ by 1 LSB
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 0.2
    assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1


def test_resize_linear_matches_cv2_upscale_float():
    rng = np.random.default_rng(1)
    prob = rng.random((410, 512)).astype(np.float32)
    out = np.asarray(I.resize_linear(jnp.asarray(prob), 1024, 1280))
    ref = cv2.resize(prob, (1280, 1024), interpolation=cv2.INTER_LINEAR)
    assert np.max(np.abs(out - ref)) < 5e-5


def test_resize_nearest_matches_cv2():
    rng = np.random.default_rng(2)
    mask = (rng.random((410, 512)) > 0.5).astype(np.uint8) * 255
    out = np.asarray(I.resize_nearest_cv2(jnp.asarray(mask), 1024, 1280))
    ref = cv2.resize(mask, (1280, 1024), interpolation=cv2.INTER_NEAREST)
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("mode", list(LetterboxMode))
def test_letterbox_apply_shapes_and_roundtrip(mode):
    img = _rand_img(1024, 1280)
    g = I.letterbox_geometry(1024, 1280, 512, mode)
    sq = I.letterbox_apply(jnp.asarray(img, jnp.float32), g)
    assert sq.shape == (512, 512, 3)
    # a synthetic prob map survives unletterbox with the right shape
    prob = jnp.ones((512, 512), jnp.float32) * 0.7
    back = I.unletterbox(prob, g)
    assert back.shape == (1024, 1280)
    np.testing.assert_allclose(np.asarray(back), 0.7, atol=1e-6)


def test_letterbox_apply_matches_cv2_pipeline():
    """Full GUI preprocess parity: cv2 resize + copyMakeBorder."""
    img = _rand_img(1024, 1280)
    g = I.letterbox_geometry(1024, 1280, 512, LetterboxMode.CENTER_NO_UPSCALE)
    ours = np.asarray(I.letterbox_apply(jnp.asarray(img).astype(jnp.float32), g))
    rs = cv2.resize(img, (g.new_w, g.new_h), interpolation=cv2.INTER_LINEAR)
    ref = cv2.copyMakeBorder(
        rs, g.pad_top, g.pad_bottom, g.pad_left, g.pad_right,
        borderType=cv2.BORDER_CONSTANT, value=(0, 0, 0),
    )
    assert np.max(np.abs(ours - ref.astype(np.float32))) <= 1.0


def test_normalize_imagenet_matches_albumentations_formula():
    img = _rand_img(64, 64)
    out = np.asarray(I.normalize_imagenet(jnp.asarray(img)))
    ref = (img.astype(np.float32) / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    back = np.asarray(I.denormalize_imagenet(jnp.asarray(out)))
    assert np.max(np.abs(back.astype(int) - img.astype(int))) <= 1


def test_scale_coords_roundtrip():
    g = I.letterbox_geometry(2048, 3072, 512, LetterboxMode.CENTER_NO_UPSCALE)
    # a point at original (1536, 1024) maps into the square and back
    orig = np.array([1536.0, 1024.0])
    in_sq = orig * g.scale + np.array([g.pad_left, g.pad_top])
    back = np.asarray(I.scale_coords_to_original(jnp.asarray(in_sq, jnp.float32), g))
    np.testing.assert_allclose(back, orig, atol=1e-3)
