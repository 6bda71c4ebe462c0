"""Pallas TPU kernels for the bandwidth-bound stages of the pipeline.

XLA already fuses most elementwise work into the convs; what it cannot do is
keep a whole multi-stage *stencil chain* resident in VMEM.  These kernels do
that for the two hottest non-conv stages:

- ``normalize_u8``: uint8 RGB -> ImageNet-normalized activation dtype in a
  single VMEM pass (dequant + scale + cast fused; one HBM read of 1 byte/px
  instead of XLA's u8->f32 convert materializing 4 bytes/px before the
  subtract).
- ``threshold_morph``: probability map -> threshold -> elliptical 3x3 open
  -> close, all four erosion/dilation stencils applied in VMEM without
  writing intermediates back to HBM (5 stencil passes, 1 HBM read + 1 HBM
  write total).

Both fall back to the pure-XLA implementations (`ops.image` /
`ops.morphology`) off-TPU — same numerics, so tests compare the two paths
directly on the CPU interpreter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vickers_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD

_MEAN = np.asarray(IMAGENET_MEAN, np.float32) * 255.0
_STD = np.asarray(IMAGENET_STD, np.float32) * 255.0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# normalize_u8
# ---------------------------------------------------------------------------


def _normalize_kernel(inv_std_ref, neg_mean_ref, x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    o_ref[...] = ((x + neg_mean_ref[...]) * inv_std_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def normalize_u8(imgs_u8: jax.Array, out_dtype=jnp.bfloat16,
                 interpret: bool = False) -> jax.Array:
    """(N, H, W, 3) uint8 -> normalized (N, H, W, 3) out_dtype."""
    n, h, w, c = imgs_u8.shape
    neg_mean = jnp.broadcast_to(jnp.asarray(-_MEAN, jnp.float32), (h, w, c))
    inv_std = jnp.broadcast_to(jnp.asarray(1.0 / _STD, jnp.float32), (h, w, c))
    kernel = pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w, c), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return jax.vmap(lambda x: kernel(inv_std, neg_mean, x))(imgs_u8)


# ---------------------------------------------------------------------------
# threshold + open + close (ellipse 3x3 == the 4-neighbour cross)
# ---------------------------------------------------------------------------


def _shift_or(x, init):
    """3x3-cross max via row/col shifts inside VMEM (binary dilate)."""
    up = jnp.concatenate([x[1:], jnp.full_like(x[:1], init)], axis=0)
    dn = jnp.concatenate([jnp.full_like(x[:1], init), x[:-1]], axis=0)
    lf = jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], init)], axis=1)
    rt = jnp.concatenate([jnp.full_like(x[:, :1], init), x[:, :-1]], axis=1)
    return jnp.maximum(jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt)), x)


def _threshold_morph_kernel(p_ref, t_ref, o_ref):
    m = (p_ref[...] >= t_ref[0, 0]).astype(jnp.float32)
    # open: erode (via 1 - dilate(1 - m)) then dilate
    inv = 1.0 - m
    inv = _shift_or(inv, 0.0)
    m = 1.0 - inv
    m = _shift_or(m, 0.0)
    # close: dilate then erode
    m = _shift_or(m, 0.0)
    inv = 1.0 - m
    inv = _shift_or(inv, 0.0)
    o_ref[...] = 1.0 - inv


@functools.partial(jax.jit, static_argnames=("interpret",))
def threshold_morph(prob: jax.Array, bin_thresh, interpret: bool = False) -> jax.Array:
    """(H, W) prob -> cleaned binary mask; equals
    ``morphology.clean_binary(prob, t, 3, 1, 1)``, one VMEM-resident pass."""
    h, w = prob.shape
    t = jnp.asarray(bin_thresh, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        _threshold_morph_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(prob.astype(jnp.float32), t)


def clean_binary_fast(prob: jax.Array, bin_thresh) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere.  Only valid
    for the default (kernel=3, open=1, close=1) compat configuration."""
    if _on_tpu():
        return threshold_morph(prob, bin_thresh)
    from vickers_tpu.ops.morphology import clean_binary

    return clean_binary(prob, bin_thresh, 3, 1, 1)
