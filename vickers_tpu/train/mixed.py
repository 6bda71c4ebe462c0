"""Mixed-scale training: letterbox-512 batches + native-resolution crops.

One checkpoint that serves BOTH inference paths (SURVEY §5 long-context
note, BASELINE config 4): reference-parity letterbox batches keep the
512-scale val Dice competitive while interleaved foreground-biased native
crops teach the model native microscope scale, which tiled full-resolution
inference (infer.tiled) requires.  The reference has no counterpart — it
only ever sees 6x-downscaled images.

Validation tracks letterbox val Dice on the reference's exact split (the
compat headline metric); tiled accuracy is measured end-to-end by
scripts/eval_tiled.py against the cv2 GT oracle.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.core.config import IMG_EXTS, TrainConfig
from vickers_tpu.data.crops import CropDataset
from vickers_tpu.data.loader import CachedDataset
from vickers_tpu.data.manifest import scan, split_manifest
from vickers_tpu.models.unet import build_model, init_model
from vickers_tpu.train import checkpoint as ckpt
from vickers_tpu.train.engine import (
    cosine_epoch_lr,
    create_train_state,
    make_indexed_eval_step,
    make_indexed_train_step,
    make_optimizer,
    make_train_step,
    set_lr,
)
from vickers_tpu.train.loop import set_seed

log = logging.getLogger(__name__)


def run_mixed_training(cfg: TrainConfig, crop_batches_per_epoch: int = 12,
                       fg_bias: float = 0.65) -> List[Dict]:
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    root_key = set_seed(cfg.seed)

    man = scan(cfg.data, require_masks=True, drop_orphans=True)
    full_paths = sorted(str(p) for p in (Path(cfg.data) / "images").glob("*")
                        if p.suffix.lower() in IMG_EXTS)
    train_man, val_man = split_manifest(man, cfg.seed, cfg.val_ratio, full_paths)
    train_ds = CachedDataset(train_man, cfg.img_size)
    val_ds = CachedDataset(val_man, cfg.img_size)
    crop_ds = CropDataset(train_man, tile=cfg.img_size, fg_bias=fg_bias)
    log.info("mixed: %d letterbox + %d crop batches/epoch from %d images, "
             "val %d", (len(train_ds) + cfg.batch - 1) // cfg.batch,
             crop_batches_per_epoch, len(crop_ds), len(val_ds))

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.encoder, dtype=dtype)
    params, stats = init_model(model, jax.random.PRNGKey(0), cfg.img_size)
    if cfg.encoder_weights and cfg.encoder_weights not in ("imagenet", "none"):
        # warm start (typically the letterbox-trained best.pth): mixed
        # training then only needs to ADD native-scale competence instead of
        # learning segmentation from scratch
        from vickers_tpu.compat.convert import load_pth_params

        params, stats = load_pth_params(cfg.encoder_weights)
        log.info("mixed: warm start from %s", cfg.encoder_weights)
    tx = make_optimizer(cfg)
    state = create_train_state(model, params, stats, tx, cfg.ema_decay)
    # letterbox batches gather on device (no per-step H2D; see
    # make_indexed_train_step docstring); crop batches are host-sampled
    train_step_idx = make_indexed_train_step(model, tx, cfg.augment,
                                             cfg.ema_decay)
    train_step = make_train_step(model, tx, cfg.augment, cfg.ema_decay)
    eval_step = make_indexed_eval_step(model)
    lr_of = cosine_epoch_lr(cfg.lr, cfg.epochs)
    dev_imgs = jax.device_put(train_ds.images)
    dev_masks = jax.device_put(train_ds.masks)
    vdev_imgs = jax.device_put(val_ds.images)
    vdev_masks = jax.device_put(val_ds.masks)

    out_dir = Path(cfg.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    start_ep, best_dice = 1, -1.0
    history: List[Dict] = []
    if cfg.resume and (out_dir / "last.ckpt").exists():
        # tolerant of EMA on/off changes between runs (see load_resume_tree)
        tree = ckpt.load_resume_tree(out_dir / "last.ckpt", state)
        state = state.replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"], ema=tree.get("ema", state.ema))
        start_ep = int(tree["epoch"]) + 1
        best_dice = float(tree["best_dice"])
        hist_file = out_dir / "history.json"
        if hist_file.exists():
            history = json.loads(hist_file.read_text())[: start_ep - 1]
        log.info("resumed at epoch %d (best %.4f)", start_ep, best_dice)

    data_rng = np.random.default_rng(cfg.seed + start_ep)
    crop_rng = np.random.default_rng(cfg.seed * 7 + start_ep)
    aug_key = jax.random.fold_in(root_key, start_ep)

    for ep in range(start_ep, cfg.epochs + 1):
        t0 = time.time()
        state = set_lr(state, float(lr_of(jnp.asarray(ep - 1))))
        losses = []

        lbs = [("idx",) + b for b in train_ds.epoch_index_batches(
            cfg.batch, shuffle=True, rng=data_rng, pad_final=True)]
        cbs = [("crop",) + b for b in crop_ds.epoch_batches(
            cfg.batch, crop_batches_per_epoch, crop_rng)]
        mixed = []
        ratio = max(1, len(lbs) // max(1, len(cbs)))
        ci = 0
        for i, b in enumerate(lbs):
            mixed.append(b)
            if (i + 1) % ratio == 0 and ci < len(cbs):
                mixed.append(cbs[ci])
                ci += 1
        mixed.extend(cbs[ci:])

        for b in mixed:
            aug_key, sk = jax.random.split(aug_key)
            if b[0] == "idx":
                _, idx, w, _stems = b
                state, loss = train_step_idx(state, dev_imgs, dev_masks,
                                             idx, w, sk)
            else:
                _, imgs, masks, w, _stems = b
                state, loss = train_step(state, imgs, masks, w, sk)
            losses.append(loss)
        train_loss = float(np.mean(np.asarray(jnp.stack(losses), np.float64)))
        if not np.isfinite(train_loss):
            ckpt.save_native(out_dir / "crash.ckpt", {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": ep,
                "best_dice": best_dice})
            raise FloatingPointError(f"non-finite loss at epoch {ep}")

        eval_state = state if state.ema is None else state.replace(
            params=state.ema["params"], batch_stats=state.ema["batch_stats"])
        # sample-weighted means (matches loop.py) so the padded final batch
        # is not over-weighted and best-checkpoint selection is comparable
        # to the letterbox loop's headline Dice
        ds_sum = iou_sum = loss_sum = n_sum = 0.0
        for idx, w, _ in val_ds.epoch_index_batches(cfg.batch, shuffle=False,
                                                    pad_final=True):
            out = eval_step(eval_state, vdev_imgs, vdev_masks, idx, w)
            ds_sum += float(out.dice_sum)
            iou_sum += float(out.iou_sum)
            loss_sum += float(out.loss_sum)
            n_sum += float(out.n)
        n_sum = max(n_sum, 1.0)
        val_dice, val_iou = ds_sum / n_sum, iou_sum / n_sum

        rec = {"epoch": ep, "train_loss": train_loss,
               "val_loss": loss_sum / n_sum, "val_dice": val_dice,
               "val_iou": val_iou, "lr": float(lr_of(jnp.asarray(ep))),
               "time": round(time.time() - t0, 2)}
        history.append(rec)
        log.info("Ep %03d | train %.4f | Dice %.4f | IoU %.4f | %.2fs",
                 ep, train_loss, val_dice, val_iou, rec["time"])

        if val_dice > best_dice:
            best_dice = val_dice
            ckpt.save_native(out_dir / "best.ckpt", {
                "params": eval_state.params,
                "batch_stats": eval_state.batch_stats})
            ckpt.export_pth(out_dir / "best.pth", eval_state.params,
                            eval_state.batch_stats)
        if ep % max(1, cfg.checkpoint_every) == 0 or ep == cfg.epochs:
            last_tree = {"params": state.params,
                         "batch_stats": state.batch_stats,
                         "opt_state": state.opt_state, "epoch": ep,
                         "best_dice": best_dice}
            if state.ema is not None:
                last_tree["ema"] = state.ema
            ckpt.save_native(out_dir / "last.ckpt", last_tree)
            (out_dir / "history.json").write_text(json.dumps(history, indent=2))

    (out_dir / "history.json").write_text(json.dumps(history, indent=2))
    # The letterbox val Dice that picks best.ckpt does not measure native-
    # scale competence (a warm start can hold "best" forever); tiled
    # inference wants the fully-trained weights, so always save the final
    # (EMA) state as final.ckpt/final.pth for scripts/eval_tiled.py.
    final_state = state if state.ema is None else state.replace(
        params=state.ema["params"], batch_stats=state.ema["batch_stats"])
    ckpt.save_native(out_dir / "final.ckpt", {
        "params": final_state.params,
        "batch_stats": final_state.batch_stats})
    ckpt.export_pth(out_dir / "final.pth", final_state.params,
                    final_state.batch_stats)
    return history
