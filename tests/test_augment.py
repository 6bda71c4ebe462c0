"""Augmentation parity vs cv2 / albumentations semantics."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vickers_tpu.core.config import AugmentConfig
from vickers_tpu.ops import augment as A


def _img(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.float32)


def test_rotate_matches_cv2_warp():
    img = _img()
    mask = (np.linalg.norm(np.indices((64, 64)) - 32, axis=0) < 20).astype(np.float32)
    for angle in (30.0, -117.5, 90.0):
        out_i, out_m = jax.jit(A.rotate)(jnp.asarray(img), jnp.asarray(mask),
                                         jnp.float32(angle))
        M = cv2.getRotationMatrix2D((31.5, 31.5), angle, 1.0)
        ref_i = cv2.warpAffine(img, M, (64, 64), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        ref_m = cv2.warpAffine(mask, M, (64, 64), flags=cv2.INTER_NEAREST,
                               borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        assert np.mean(np.abs(np.asarray(out_i) - ref_i)) < 1.0, angle
        # nearest-sampled masks may differ on boundary pixels only
        assert np.mean(np.asarray(out_m) != ref_m) < 0.02, angle


def test_brightness_contrast_formula():
    img = _img()
    out = np.asarray(A.brightness_contrast(jnp.asarray(img), jnp.float32(1.1),
                                           jnp.float32(-0.05)))
    ref = np.clip(img * 1.1 + (-0.05) * 255.0, 0, 255)
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("k", [3, 5])
def test_gaussian_blur_matches_cv2(k):
    img = _img(seed=k)
    out = np.asarray(A.gaussian_blur(jnp.asarray(img), jnp.int32(k)))
    ref = cv2.GaussianBlur(img, (k, k), 0)
    assert np.max(np.abs(out - ref)) < 0.5


def test_clahe_gray_close_to_cv2():
    rng = np.random.default_rng(0)
    # smooth-ish image so histograms aren't degenerate
    base = cv2.GaussianBlur(rng.integers(0, 256, (128, 128)).astype(np.float32), (15, 15), 5)
    g = np.clip(base * 2.0, 0, 255)
    out = np.asarray(A.clahe_gray(jnp.asarray(g), jnp.float32(2.0), grid=8))
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    ref = clahe.apply(np.round(g).astype(np.uint8)).astype(np.float32)
    # cv2 rounds LUTs differently; demand close agreement, not bit-equality
    assert np.mean(np.abs(out - ref)) < 3.0
    assert np.max(np.abs(out - ref)) < 40.0


def test_lab_round_trip():
    img = _img(seed=7)
    L, a, b = A._rgb_to_lab_l(jnp.asarray(img))
    back = np.asarray(A._lab_to_rgb(L, a, b))
    assert np.mean(np.abs(back - img)) < 1.5


def test_gauss_noise_statistics():
    img = np.full((64, 64, 3), 128.0, np.float32)
    out = np.asarray(A.gauss_noise(jnp.asarray(img), jax.random.PRNGKey(0),
                                   jnp.float32(25.0)))
    resid = out - img
    assert abs(resid.mean()) < 0.5
    assert abs(resid.std() - 5.0) < 0.5


def test_augment_batch_runs_and_is_random():
    cfg = AugmentConfig()
    imgs = np.stack([_img(seed=i) for i in range(4)])
    masks = (imgs[..., 0] > 128).astype(np.float32)
    out_i, out_m = A.augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                                   jax.random.PRNGKey(0), cfg)
    out_i2, _ = A.augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                                jax.random.PRNGKey(1), cfg)
    assert out_i.shape == imgs.shape and out_m.shape == masks.shape
    assert np.all(np.isfinite(np.asarray(out_i)))
    # masks stay binary under geometric-only transforms
    assert set(np.unique(np.asarray(out_m))) <= {0.0, 1.0}
    # different keys give different outputs
    assert not np.allclose(np.asarray(out_i), np.asarray(out_i2))


def test_augment_probabilities():
    """With p=0 everywhere the pipeline is the identity."""
    cfg = AugmentConfig(orient_p=0.0, rotate_p=0.0, photo_p=0.0, noise_p=0.0)
    imgs = np.stack([_img(seed=9)])
    masks = (imgs[..., 0] > 128).astype(np.float32)
    out_i, out_m = A.augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                                   jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out_i), imgs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_m), masks, atol=1e-6)
