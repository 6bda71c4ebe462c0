"""Loss/metric parity vs torch reference formulas."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vickers_tpu.train.losses import bce_dice_loss, bce_with_logits, soft_dice_loss
from vickers_tpu.train.metrics import batch_dice, batch_iou, dice_per_image


def _rand(shape, seed=0, scale=3.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def test_bce_matches_torch():
    logits = _rand((2, 32, 32, 1))
    targets = (_rand((2, 32, 32, 1), seed=1) > 0).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    assert abs(ours - ref) < 1e-6


def test_soft_dice_matches_smp_binary_semantics():
    """smp DiceLoss(binary): one dice over batch+space, smooth=0, eps=1e-7."""
    logits = _rand((3, 16, 16, 1))
    targets = (_rand((3, 16, 16, 1), seed=2) > 0.5).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    inter = (p * targets).sum()
    card = p.sum() + targets.sum()
    ref = 1.0 - (2 * inter) / max(card, 1e-7)
    ours = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(ours - ref) < 1e-6


def test_soft_dice_zero_when_no_positives():
    logits = _rand((2, 8, 8, 1))
    targets = np.zeros((2, 8, 8, 1), np.float32)
    assert float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets))) == 0.0


def test_weighted_losses_ignore_padding():
    logits = _rand((4, 8, 8, 1))
    targets = (_rand((4, 8, 8, 1), seed=3) > 0).astype(np.float32)
    w_full = np.ones(4, np.float32)
    # padding the batch with garbage + zero weight must not change the loss
    logits_pad = np.concatenate([logits, 100 * np.ones((2, 8, 8, 1), np.float32)])
    targets_pad = np.concatenate([targets, np.zeros((2, 8, 8, 1), np.float32)])
    w_pad = np.concatenate([w_full, np.zeros(2, np.float32)])
    a = float(bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w_full)))
    b = float(bce_dice_loss(jnp.asarray(logits_pad), jnp.asarray(targets_pad), jnp.asarray(w_pad)))
    assert abs(a - b) < 1e-6


def test_dice_iou_match_reference_formulas():
    """train.py:230-281: threshold 0.5, per-image, eps=1e-7, batch mean."""
    prob = (1 / (1 + np.exp(-_rand((4, 16, 16, 1), seed=4)))).astype(np.float32)
    target = (_rand((4, 16, 16, 1), seed=5) > 0).astype(np.float32)

    pred = (prob > 0.5).astype(np.float32)
    inter = (pred * target).sum(axis=(1, 2, 3))
    union = pred.sum(axis=(1, 2, 3)) + target.sum(axis=(1, 2, 3))
    ref_dice = ((2 * inter + 1e-7) / (union + 1e-7)).mean()
    ref_iou = ((inter + 1e-7) / (union - inter + 1e-7)).mean()

    assert abs(float(batch_dice(jnp.asarray(prob), jnp.asarray(target))) - ref_dice) < 1e-6
    assert abs(float(batch_iou(jnp.asarray(prob), jnp.asarray(target))) - ref_iou) < 1e-6


def test_dice_perfect_and_empty():
    t = np.zeros((1, 8, 8, 1), np.float32)
    t[0, 2:6, 2:6, 0] = 1
    assert abs(float(batch_dice(jnp.asarray(t), jnp.asarray(t))) - 1.0) < 1e-6
    z = np.zeros_like(t)
    # both empty -> eps/eps = 1 (reference behavior with eps in num+den)
    assert abs(float(batch_dice(jnp.asarray(z), jnp.asarray(z))) - 1.0) < 1e-6
