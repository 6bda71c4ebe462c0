"""On-device training augmentations (vmappable, per-sample PRNG).

Faithful re-parameterisation of the reference's albumentations pipeline
(train.py:67-113) with the same probabilities and parameter ranges, executed
on the TPU as part of the training step instead of on the host:

  1. OneOf{HFlip, VFlip, RandomRotate90} p=0.8      (train.py:82-86)
  2. Rotate(limit=±180°, const border) p=0.6         (train.py:90)
  3. OneOf{RandomBrightnessContrast, CLAHE(2.0, 8x8), GaussianBlur(3..5)}
     p=0.8                                           (train.py:97-101)
  4. GaussNoise(var 10..50) p=0.3                    (train.py:105)

Inputs are float32 RGB images in [0, 255] (uint8 scale) and float masks in
{0, 1}, both already letterboxed to the square training size (the geometric
resize lives in ``ops.image``/the data layer, mirroring the reference's
pipeline order).  Geometric transforms are applied to image and mask
simultaneously (bilinear vs nearest, as albumentations does); photometric
transforms touch the image only.

All branches are computed and selected with ``jnp.where`` / ``lax.switch`` —
no data-dependent Python control flow, so one XLA program covers every
random draw.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from vickers_tpu.core.config import AugmentConfig

# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------


def _rot90_k(img: jax.Array, k: jax.Array) -> jax.Array:
    """np.rot90 by dynamic k in {0,1,2,3} (albumentations RandomRotate90)."""
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1, axes=(0, 1)),
            lambda x: jnp.rot90(x, 2, axes=(0, 1)),
            lambda x: jnp.rot90(x, 3, axes=(0, 1)),
        ],
        img,
    )


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinear sample (H, W[, C]) at float coords, constant-0 outside."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    dy = ys - y0
    dx = xs - x0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        if img.ndim == 3:
            return jnp.where(inb[..., None], v, 0.0)
        return jnp.where(inb, v, 0.0)

    if img.ndim == 3:
        dy = dy[..., None]
        dx = dx[..., None]
    top = gather(y0, x0) * (1 - dx) + gather(y0, x0 + 1) * dx
    bot = gather(y0 + 1, x0) * (1 - dx) + gather(y0 + 1, x0 + 1) * dx
    return top * (1 - dy) + bot * dy


def _nearest_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    h, w = img.shape[0], img.shape[1]
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(inb, v, 0.0)


def rotate(img: jax.Array, mask: jax.Array, angle_deg: jax.Array,
           scale=1.0) -> Tuple[jax.Array, jax.Array]:
    """A.Rotate parity: rotate about the image center, keep size, constant-0
    border; bilinear for the image, nearest for the mask.  ``scale`` > 1
    zooms in (the scale_jitter extension; 1.0 == exact A.Rotate)."""
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    # source coords = inverse of cv2.getRotationMatrix2D's forward rotation:
    # src = center + [[c, -s], [s, c]] @ (dst - center) / scale, c/s of +angle
    th = angle_deg * math.pi / 180.0
    inv = 1.0 / jnp.asarray(scale, jnp.float32)
    c, s = jnp.cos(th) * inv, jnp.sin(th) * inv
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xr = (xx - cx) * c - (yy - cy) * s + cx
    yr = (xx - cx) * s + (yy - cy) * c + cy
    return _bilinear_sample(img, yr, xr), _nearest_sample(mask, yr, xr)


# ---------------------------------------------------------------------------
# photometric ops (image only, [0, 255] float)
# ---------------------------------------------------------------------------


def brightness_contrast(img: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """A.RandomBrightnessContrast(brightness_by_max=True):
    img * (1 + contrast) + brightness * 255."""
    return jnp.clip(img * alpha + beta * 255.0, 0.0, 255.0)


def gaussian_blur(img: jax.Array, ksize: jax.Array) -> jax.Array:
    """A.GaussianBlur(blur_limit=(3,5)): random odd kernel (3 or 5) with
    sigma=0, for which cv2.getGaussianKernel returns its FIXED small-kernel
    tables ([1,2,1]/4 and [1,4,6,4,1]/16), not the sigma formula.

    Both kernel sizes are computed; the draw selects one (static shapes)."""

    _TAPS = {3: (0.25, 0.5, 0.25), 5: (0.0625, 0.25, 0.375, 0.25, 0.0625)}

    def blur_with(k: int):
        r = k // 2
        g = jnp.asarray(_TAPS[k], jnp.float32)
        # separable depthwise conv with REFLECT_101 border (cv2 default)
        def conv1d(x, axis):
            pads = [(0, 0)] * x.ndim
            pads[axis] = (r, r)
            xp = jnp.pad(x, pads, mode="reflect")
            out = jnp.zeros_like(x)
            for i in range(k):
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(i, i + x.shape[axis])
                out = out + g[i] * xp[tuple(sl)]
            return out

        return conv1d(conv1d(img, 0), 1)

    return jnp.where(ksize == 3, blur_with(3), blur_with(5))


# ---- CLAHE ---------------------------------------------------------------

_LAB_XN, _LAB_YN, _LAB_ZN = 0.950456, 1.0, 1.088754


def _rgb_to_lab_l(img: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """cv2 8U RGB->LAB (D65): returns (L8, a8, b8) each in [0, 255] float."""
    rgb = img / 255.0
    # sRGB linearization (cv2 uses the gamma path for Lab)
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    x = (0.412453 * r + 0.357580 * g + 0.180423 * b) / _LAB_XN
    y = (0.212671 * r + 0.715160 * g + 0.072169 * b) / _LAB_YN
    z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / _LAB_ZN

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0
    return L * 255.0 / 100.0, a, bb


def _lab_to_rgb(L8: jax.Array, a8: jax.Array, b8: jax.Array) -> jax.Array:
    L = L8 * 100.0 / 255.0
    a = a8 - 128.0
    b = b8 - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return jnp.where(t ** 3 > 0.008856, t ** 3, (t - 16.0 / 116.0) / 7.787)

    x = finv(fx) * _LAB_XN
    y = jnp.where(L > 903.3 * 0.008856, fy ** 3, L / 903.3) * _LAB_YN
    z = finv(fz) * _LAB_ZN
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875991 * y + 0.041556 * z
    bl = 0.055648 * x - 0.204043 * y + 1.057311 * z
    lin = jnp.stack([r, g, bl], axis=-1)
    srgb = jnp.where(lin > 0.0031308, 1.055 * jnp.clip(lin, 1e-8) ** (1 / 2.4) - 0.055,
                     12.92 * lin)
    return jnp.clip(srgb * 255.0, 0.0, 255.0)


def clahe_gray(l8: jax.Array, clip_limit: jax.Array, grid: int = 8) -> jax.Array:
    """cv2.createCLAHE parity on one [0,255] channel.

    Per-tile 256-bin histogram -> clip at clip_limit*tile_area/256 with
    uniform redistribution -> CDF LUT -> bilinear interpolation of the 4
    neighbouring tile LUTs (tile centers, clamped at borders)."""
    h, w = l8.shape
    th, tw = h // grid, w // grid
    area = th * tw
    vals = jnp.clip(jnp.round(l8), 0, 255).astype(jnp.int32)

    tiles = vals[: grid * th, : grid * tw].reshape(grid, th, grid, tw)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(grid * grid, area)

    hist = jax.vmap(lambda t: jnp.zeros(256, jnp.float32).at[t].add(1.0))(tiles)

    # cv2 clip + redistribution: integer limit, whole batches to every bin,
    # the residual to bins {0, step, 2*step, ...} (NOT uniform — this shapes
    # the low end of the CDF noticeably when clipping is heavy).
    limit = jnp.maximum(1.0, jnp.floor(clip_limit * area / 256.0))
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)       # integer-valued
    batch = jnp.floor(excess / 256.0)
    resid = excess - batch * 256.0
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(resid, 1.0)), 1.0)
    idx = jnp.arange(256, dtype=jnp.float32)[None, :]
    hit = (jnp.mod(idx, step) == 0) & (idx / step < resid) & (resid > 0)
    clipped = clipped + batch + hit.astype(jnp.float32)

    cdf = jnp.cumsum(clipped, axis=1)
    lut_scale = 255.0 / area
    luts = jnp.clip(jnp.floor(cdf * lut_scale + 0.5), 0, 255)     # (G*G, 256)
    luts = luts.reshape(grid, grid, 256)

    # bilinear interpolation between tile LUTs
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ty = yy / th - 0.5
    tx = xx / tw - 0.5
    ty0 = jnp.clip(jnp.floor(ty), 0, grid - 1).astype(jnp.int32)
    tx0 = jnp.clip(jnp.floor(tx), 0, grid - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty0 + 1, 0, grid - 1)
    tx1 = jnp.clip(tx0 + 1, 0, grid - 1)
    fy = jnp.clip(ty - ty0, 0.0, 1.0)
    fx = jnp.clip(tx - tx0, 0.0, 1.0)

    def lut_at(tyi, txi):
        return luts[tyi, txi, vals]

    v00 = lut_at(ty0, tx0)
    v01 = lut_at(ty0, tx1)
    v10 = lut_at(ty1, tx0)
    v11 = lut_at(ty1, tx1)
    out = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
           + v10 * fy * (1 - fx) + v11 * fy * fx)
    return out


def clahe_rgb(img: jax.Array, clip_limit: jax.Array, grid: int = 8) -> jax.Array:
    """A.CLAHE on RGB: convert to LAB, equalize L, convert back."""
    L, a, b = _rgb_to_lab_l(img)
    L2 = clahe_gray(L, clip_limit, grid)
    return _lab_to_rgb(L2, a, b)


def gauss_noise(img: jax.Array, key: jax.Array, var: jax.Array) -> jax.Array:
    """A.GaussNoise: additive N(0, sqrt(var)) per pixel/channel on 0-255."""
    sigma = jnp.sqrt(var)
    noise = sigma * jax.random.normal(key, img.shape, jnp.float32)
    return jnp.clip(img + noise, 0.0, 255.0)


# ---------------------------------------------------------------------------
# the composed pipeline
# ---------------------------------------------------------------------------


def augment_sample(
    img255: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """One sample through the full random pipeline. img255: (S, S, 3) float32
    [0,255]; mask: (S, S) float32 {0,1}.  Returns transformed pair (same
    scale; normalization happens downstream like A.Normalize)."""
    keys = jax.random.split(key, 16)

    # -- 1. orientation OneOf (p=0.8, three equal choices)
    do_orient = jax.random.uniform(keys[0]) < cfg.orient_p
    choice = jax.random.randint(keys[1], (), 0, 3)
    k90 = jax.random.randint(keys[2], (), 0, 4)

    def orient(pair):
        im, mk = pair
        hflip = lambda x: x[:, ::-1]
        vflip = lambda x: x[::-1, :]
        im2 = jax.lax.switch(choice, [hflip, vflip, lambda x: _rot90_k(x, k90)], im)
        mk2 = jax.lax.switch(choice, [hflip, vflip, lambda x: _rot90_k(x, k90)], mk)
        return im2, mk2

    img255, mask = jax.lax.cond(do_orient, orient, lambda p: p, (img255, mask))

    # -- 2. arbitrary-angle rotation (p=0.6), optionally fused with the
    #       scale-jitter extension (one shared resample, like A.Affine)
    do_rot = jax.random.uniform(keys[3]) < cfg.rotate_p
    angle = jax.random.uniform(keys[4], (), minval=-cfg.rotate_limit_deg,
                               maxval=cfg.rotate_limit_deg)
    angle = jnp.where(do_rot, angle, 0.0)
    if cfg.scale_p > 0.0:
        do_scale = jax.random.uniform(keys[14]) < cfg.scale_p
        scale = 1.0 + jax.random.uniform(keys[15], (), minval=-cfg.scale_limit,
                                         maxval=cfg.scale_limit)
        scale = jnp.where(do_scale, scale, 1.0)
        need_affine = do_rot | do_scale
    else:
        scale = jnp.float32(1.0)
        need_affine = do_rot
    img255, mask = jax.lax.cond(
        need_affine, lambda p: rotate(p[0], p[1], angle, scale),
        lambda p: p, (img255, mask)
    )

    # -- 3. photometric OneOf (p=0.8)
    do_photo = jax.random.uniform(keys[5]) < cfg.photo_p
    pchoice = jax.random.randint(keys[6], (), 0, 3)
    # independent draws per parameter, matching albumentations' sampling
    # (each transform calls random.uniform separately; round 1 reused keys
    # here, perfectly correlating brightness with contrast etc.)
    alpha = 1.0 + jax.random.uniform(keys[7], (), minval=-cfg.contrast_limit,
                                     maxval=cfg.contrast_limit)
    beta = jax.random.uniform(keys[10], (), minval=-cfg.brightness_limit,
                              maxval=cfg.brightness_limit)
    clip = jax.random.uniform(keys[8], (), minval=1.0, maxval=cfg.clahe_clip_limit)
    kchoice = jnp.where(jax.random.randint(keys[11], (), 0, 2) == 0, 3, 5)

    def photo(im):
        return jax.lax.switch(
            pchoice,
            [
                lambda x: brightness_contrast(x, alpha, beta),
                lambda x: clahe_rgb(x, clip, cfg.clahe_grid),
                lambda x: gaussian_blur(x, kchoice),
            ],
            im,
        )

    img255 = jax.lax.cond(do_photo, photo, lambda x: x, img255)

    # -- 4. gaussian noise (p=0.3)
    do_noise = jax.random.uniform(keys[9]) < cfg.noise_p
    var = jax.random.uniform(keys[12], (), minval=cfg.noise_var_limit[0],
                             maxval=cfg.noise_var_limit[1])
    img255 = jax.lax.cond(
        do_noise, lambda x: gauss_noise(x, keys[13], var), lambda x: x, img255
    )
    return img255, mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(imgs255: jax.Array, masks: jax.Array, key: jax.Array,
                  cfg: AugmentConfig = AugmentConfig()):
    """vmapped pipeline over the batch with independent per-sample keys."""
    keys = jax.random.split(key, imgs255.shape[0])
    return jax.vmap(lambda i, m, k: augment_sample(i, m, k, cfg))(imgs255, masks, keys)
