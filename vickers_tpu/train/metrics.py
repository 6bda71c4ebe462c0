"""Evaluation metrics: thresholded per-image Dice and IoU.

Parity with train.py:230-281: probabilities thresholded at 0.5, per-image
intersection/union over (C, H, W), eps=1e-7, mean over the batch.  Computed
entirely on device; the loop accumulates weighted sums so padded batch tails
don't bias epoch means.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _per_image_sums(prob: jax.Array, target: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    pred = (prob > 0.5).astype(jnp.float32)
    y = target.astype(jnp.float32)
    axes = tuple(range(1, prob.ndim))
    inter = jnp.sum(pred * y, axis=axes)
    psum = jnp.sum(pred, axis=axes)
    ysum = jnp.sum(y, axis=axes)
    return inter, psum, ysum


@jax.jit
def dice_per_image(prob: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    inter, psum, ysum = _per_image_sums(prob, target)
    return (2.0 * inter + eps) / (psum + ysum + eps)


@jax.jit
def iou_per_image(prob: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    inter, psum, ysum = _per_image_sums(prob, target)
    union = psum + ysum - inter
    return (inter + eps) / (union + eps)


@jax.jit
def batch_dice(prob: jax.Array, target: jax.Array) -> jax.Array:
    """train.py dice_coef: mean of per-image dice over the batch."""
    return jnp.mean(dice_per_image(prob, target))


@jax.jit
def batch_iou(prob: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(iou_per_image(prob, target))
