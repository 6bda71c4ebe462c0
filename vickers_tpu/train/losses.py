"""Training losses: BCE-with-logits + soft Dice.

Semantics match the reference's ``loss = BCEWithLogitsLoss()(logits, y) +
smp.losses.DiceLoss(mode='binary')(logits, y)`` (train.py:600-601, :438):

- BCE: elementwise stable formulation, mean over every pixel of the batch.
- Dice (smp binary mode): probabilities via sigmoid, intersection and
  cardinality aggregated over the WHOLE batch and all pixels (smp uses
  dims=(0, 2) on (N, 1, -1) views — one dice score per channel, not
  per-image), smooth=0, eps=1e-7, and the loss is zeroed when the batch has
  no positive ground-truth pixels (smp's y_true.sum() > 0 mask).

``weights`` (per-sample 0/1) supports padded final batches: padded samples
contribute nothing to either term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _maybe_jit(fn):
    # public losses are also called standalone (tests, eval tooling); eager
    # dispatch on this build is pathologically slow, so jit at the boundary.
    return jax.jit(fn)


@_maybe_jit
def bce_with_logits(logits: jax.Array, targets: jax.Array,
                    weights: jax.Array | None = None) -> jax.Array:
    """Numerically-stable BCEWithLogits, mean over all (weighted) pixels."""
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    per_px = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weights is None:
        return jnp.mean(per_px)
    w = weights.reshape((-1,) + (1,) * (per_px.ndim - 1))
    denom = jnp.sum(w) * (per_px.size / per_px.shape[0])
    return jnp.sum(per_px * w) / jnp.maximum(denom, 1.0)


@_maybe_jit
def soft_dice_loss(logits: jax.Array, targets: jax.Array,
                   weights: jax.Array | None = None,
                   smooth: float = 0.0, eps: float = 1e-7) -> jax.Array:
    """smp.losses.DiceLoss(mode='binary', from_logits=True) parity."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    y = targets.astype(jnp.float32)
    if weights is not None:
        w = weights.reshape((-1,) + (1,) * (p.ndim - 1))
        p = p * w
        y = y * w
    inter = jnp.sum(p * y)
    card = jnp.sum(p) + jnp.sum(y)
    score = (2.0 * inter + smooth) / jnp.maximum(card + smooth, eps)
    loss = 1.0 - score
    has_pos = jnp.sum(y) > 0
    return jnp.where(has_pos, loss, 0.0)


@_maybe_jit
def bce_dice_loss(logits: jax.Array, targets: jax.Array,
                  weights: jax.Array | None = None) -> jax.Array:
    """The reference's total loss (train.py:438)."""
    return bce_with_logits(logits, targets, weights) + soft_dice_loss(
        logits, targets, weights
    )


def bce_dice_loss_sharded(logits: jax.Array, targets: jax.Array,
                          weights: jax.Array | None, axis_name: str,
                          eps: float = 1e-7) -> jax.Array:
    """Data-parallel variant with GLOBAL-batch semantics.

    BCE is the pmean of shard means (== global mean for equal shards); the
    dice intersection/cardinality sums are psum-reduced over the mesh axis
    before forming the score, so the loss (and its gradient) is bit-level
    equivalent to the single-device loss on the concatenated batch — unlike
    torch DDP, whose per-replica dice silently changes the objective."""
    bce = jax.lax.pmean(bce_with_logits(logits, targets, weights), axis_name)
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    y = targets.astype(jnp.float32)
    if weights is not None:
        w = weights.reshape((-1,) + (1,) * (p.ndim - 1))
        p = p * w
        y = y * w
    inter = jax.lax.psum(jnp.sum(p * y), axis_name)
    card = jax.lax.psum(jnp.sum(p) + jnp.sum(y), axis_name)
    ysum = jax.lax.psum(jnp.sum(y), axis_name)
    dice = 1.0 - (2.0 * inter) / jnp.maximum(card, eps)
    return bce + jnp.where(ysum > 0, dice, 0.0)
