"""Native-resolution crop training — the trainer behind tiled inference.

Reuses the letterbox trainer's engine (same losses, optimizer, augmentation,
checkpoint formats); only the data source differs: random foreground-biased
512 crops at native microscope resolution (data.crops).  The resulting
checkpoints are what ``infer.tiled`` needs to segment full-resolution images
(BASELINE config 4); the reference has no counterpart (it never trains or
infers at native scale).

Operational caveat (round 5): this trainer streams a fresh host batch per
step, which the axon relay client leaks (~12 MB/step — see train/ssl.py,
which was converted to a device-resident image bank + coordinate feeding
after a 130 GB OOM).  Crop/mixed schedules here are short enough
(~40 steps/epoch) that the leak stays bounded; port the bank pattern from
ssl.py before running multi-thousand-step crop schedules on the relay.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.core.config import IMG_EXTS, TrainConfig
from vickers_tpu.data.crops import CropDataset
from vickers_tpu.data.manifest import scan, split_manifest
from vickers_tpu.models.unet import build_model, init_model
from vickers_tpu.train import checkpoint as ckpt
from vickers_tpu.train.engine import (
    cosine_epoch_lr,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_lr,
)
from vickers_tpu.train.loop import set_seed

log = logging.getLogger(__name__)


def run_crop_training(cfg: TrainConfig, steps_per_epoch: int = 40,
                      fg_bias: float = 0.7, val_crops_per_image: int = 4
                      ) -> List[Dict]:
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    root_key = set_seed(cfg.seed)

    man = scan(cfg.data, require_masks=True, drop_orphans=True)
    full_paths = sorted(
        str(p) for p in (Path(cfg.data) / "images").glob("*")
        if p.suffix.lower() in IMG_EXTS
    )
    train_man, val_man = split_manifest(man, cfg.seed, cfg.val_ratio, full_paths)
    train_ds = CropDataset(train_man, tile=cfg.img_size, fg_bias=fg_bias)
    val_ds = CropDataset(val_man, tile=cfg.img_size, fg_bias=1.0)

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.encoder, dtype=dtype)
    init_key, _ = jax.random.split(root_key)
    params, batch_stats = init_model(model, init_key, cfg.img_size)
    tx = make_optimizer(cfg)
    state = create_train_state(model, params, batch_stats, tx, cfg.ema_decay)
    train_step = make_train_step(model, tx, cfg.augment, cfg.ema_decay)
    eval_step = make_eval_step(model)
    lr_of = cosine_epoch_lr(cfg.lr, cfg.epochs)

    out_dir = Path(cfg.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    log.info("crop training: %d train / %d val full-res images, tile %d",
             len(train_ds), len(val_ds), cfg.img_size)

    # fixed (seeded) validation crop set so epochs are comparable
    val_rng = np.random.default_rng(cfg.seed + 777)
    val_batches = [
        val_ds.sample_batch(cfg.batch, val_rng)
        for _ in range(max(1, len(val_ds) * val_crops_per_image // cfg.batch))
    ]

    history: List[Dict] = []
    best_dice = -1.0
    data_rng = np.random.default_rng(cfg.seed)
    aug_key = jax.random.fold_in(root_key, 2)

    for ep in range(1, cfg.epochs + 1):
        t0 = time.time()
        state = set_lr(state, float(lr_of(jnp.asarray(ep - 1))))
        losses = []
        for imgs, masks, w, _ in train_ds.epoch_batches(cfg.batch, steps_per_epoch, data_rng):
            aug_key, sk = jax.random.split(aug_key)
            state, loss = train_step(state, imgs, masks, w, sk)
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses)))

        eval_state = state if state.ema is None else state.replace(
            params=state.ema["params"], batch_stats=state.ema["batch_stats"])
        evs = [eval_step(eval_state, i, m, w) for i, m, w, _ in val_batches]
        n = float(np.sum([float(e.n) for e in evs]))
        val_loss = float(np.sum([float(e.loss_sum) for e in evs]) / max(1.0, n))
        val_dice = float(np.sum([float(e.dice_sum) for e in evs]) / max(1.0, n))
        val_iou = float(np.sum([float(e.iou_sum) for e in evs]) / max(1.0, n))

        rec = {"epoch": ep, "train_loss": train_loss, "val_loss": val_loss,
               "val_dice": val_dice, "val_iou": val_iou,
               "lr": float(lr_of(jnp.asarray(ep))),
               "time": round(time.time() - t0, 2)}
        history.append(rec)
        log.info("Ep %03d | train %.4f | val %.4f | Dice %.4f | IoU %.4f | %ss",
                 ep, train_loss, val_loss, val_dice, val_iou, rec["time"])

        if val_dice > best_dice:
            best_dice = val_dice
            ckpt.save_native(out_dir / "best.ckpt", {
                "params": eval_state.params,
                "batch_stats": eval_state.batch_stats})
            ckpt.export_pth(out_dir / "best.pth", eval_state.params,
                            eval_state.batch_stats)
        if ep % max(1, cfg.checkpoint_every) == 0 or ep == cfg.epochs:
            ckpt.save_native(out_dir / "last.ckpt", {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": ep, "best_dice": best_dice})
        with open(out_dir / "history.json", "w") as f:
            json.dump(history, f, indent=2)
    return history
