"""Jitted train/eval steps and the optimizer (the L5 training engine).

Replaces the reference's torch loop (train.py:381-529) with donated,
fully-fused XLA programs:

- ``make_optimizer``: AdamW(wd=1e-4) + per-epoch cosine annealing to zero
  over ``epochs`` (torch CosineAnnealingLR(T_max=epochs) parity,
  train.py:606-607 — the schedule is a function of the *epoch* index, held
  constant within an epoch).
- ``train_step``: uint8 batch -> on-device augmentation (ops.augment) ->
  ImageNet normalize -> bf16 forward/backward -> f32 AdamW update + BN
  running-stat update.  No GradScaler: bf16 has fp32 range, so the torch
  fp16 AMP machinery (train.py:431-445, :610-611) has no TPU equivalent by
  design.
- ``eval_step``: forward + loss + per-image Dice/IoU sums, returning the
  probability maps for optional visual dumps.

Both steps donate the state/batch buffers so XLA updates parameters in place
(no HBM traffic for a second copy).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.models.unet import VickersUNet
from vickers_tpu.ops.augment import augment_sample
from vickers_tpu.ops.image import normalize_imagenet
from vickers_tpu.train.losses import bce_dice_loss
from vickers_tpu.train.metrics import dice_per_image, iou_per_image


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # Exponential moving average of {params, batch_stats} (None when off).
    # EMA weights generalize better on this 183-image dataset and are what
    # get validated/exported when TrainConfig.ema_decay > 0.
    ema: Any = None


def cosine_epoch_lr(base_lr: float, epochs: int):
    """lr used during epoch e (0-indexed): base * (1 + cos(pi*e/T)) / 2."""

    def schedule(epoch: jax.Array) -> jax.Array:
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with torch-parity hyperparameters; the learning rate is injected
    per-epoch via ``inject_hyperparams`` so the loop can set the cosine value
    exactly once per epoch (matching scheduler.step() granularity)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.lr, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay,
    )


def create_train_state(model: VickersUNet, params, batch_stats,
                       tx: optax.GradientTransformation,
                       ema_decay: float = 0.0) -> TrainState:
    ema = None
    if ema_decay > 0.0:
        # real copies: aliasing the live buffers would make the donated
        # train_step pass the same buffer twice (donation error)
        ema = jax.tree.map(
            lambda x: jnp.array(x, copy=True),
            {"params": params, "batch_stats": batch_stats})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema,
    )


def set_lr(state: TrainState, lr: float) -> TrainState:
    """Write the epoch's learning rate into the injected hyperparams."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def _prepare_batch(imgs_u8, masks_u8, key, aug: Optional[AugmentConfig]):
    imgs = imgs_u8.astype(jnp.float32)
    masks = masks_u8.astype(jnp.float32)
    if aug is not None:
        keys = jax.random.split(key, imgs.shape[0])
        imgs, masks = jax.vmap(
            lambda i, m, k: augment_sample(i, m, k, aug)
        )(imgs, masks, keys)
    x = normalize_imagenet(imgs)
    y = masks[..., None]
    return x, y


def make_train_step(model: VickersUNet, tx: optax.GradientTransformation,
                    aug: Optional[AugmentConfig], ema_decay: float = 0.0):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, imgs_u8, masks_u8, weights, key):
        x, y = _prepare_batch(imgs_u8, masks_u8, key, aug)

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            loss = bce_dice_loss(logits, y, weights)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema
        if ema_decay > 0.0 and state.ema is not None:
            # warmup-corrected decay (min(d, (1+t)/(10+t))) so early steps
            # track the raw weights instead of the random init
            step = state.step.astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
            live = {"params": new_params, "batch_stats": new_stats}
            new_ema = jax.tree.map(
                lambda e, v: e * d + v.astype(e.dtype) * (1.0 - d),
                state.ema, live,
            )
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt, ema=new_ema,
        )
        return new_state, loss

    return train_step


class EvalOut(NamedTuple):
    loss_sum: jax.Array     # sum of per-sample loss * weight (batch-mean x n)
    dice_sum: jax.Array     # weighted batch-mean dice (see loop for epoch agg)
    iou_sum: jax.Array
    n: jax.Array
    prob: jax.Array         # (B, S, S, 1) f32 probabilities


def make_eval_step(model: VickersUNet):
    @jax.jit
    def eval_step(state: TrainState, imgs_u8, masks_u8, weights) -> EvalOut:
        x, y = _prepare_batch(imgs_u8, masks_u8, None, None)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        loss = bce_dice_loss(logits, y, weights)
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))
        d = dice_per_image(prob, y)
        i = iou_per_image(prob, y)
        n = jnp.sum(weights)
        return EvalOut(
            loss_sum=loss * n,
            dice_sum=jnp.sum(d * weights),
            iou_sum=jnp.sum(i * weights),
            n=n,
            prob=prob,
        )

    return eval_step


def make_indexed_train_step(model: VickersUNet,
                            tx: optax.GradientTransformation,
                            aug: Optional[AugmentConfig],
                            ema_decay: float = 0.0):
    """Train step that gathers its batch ON DEVICE from a device-resident
    dataset: ``step(state, imgs_all, masks_all, idx, weights, key)``.

    The reference dataset is ~170 MB as uint8 — it lives in HBM for the
    whole run and each step transfers only a (B,) index vector.  Besides
    removing the per-step H2D input stream entirely, this sidesteps a host
    memory leak in the axon TPU relay, which pins staging memory for every
    host->device transfer (~220 MB/epoch measured — an OOM kill around
    epoch 600 of a batch-8 run)."""
    base = make_train_step(model, tx, aug, ema_decay)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, imgs_all, masks_all, idx, weights, key):
        return base.__wrapped__(state, imgs_all[idx], masks_all[idx],
                                weights, key)

    return step


def make_indexed_eval_step(model: VickersUNet):
    base = make_eval_step(model)

    @jax.jit
    def step(state: TrainState, imgs_all, masks_all, idx, weights) -> EvalOut:
        return base.__wrapped__(state, imgs_all[idx], masks_all[idx], weights)

    return step
