"""The training orchestrator — ``run(cfg)`` (train.py:536-713 equivalent).

Same contract as the reference run():
  seed -> scan data/images -> reference-parity split -> datasets ->
  model (+optional pretrained .pth) -> BCE+Dice -> AdamW + cosine ->
  epoch loop {train, validate (+visual dumps), lr step, history.json with
  the exact 7-key schema, best/last checkpoints, early stop} -> final export.

TPU-native differences (all capability-positive):
- data decoded/letterboxed ONCE and cached; per-epoch randomness (augs) runs
  on device inside the jitted train step;
- checkpoints carry full train state (crash-safe resume — the reference
  loses everything on restart, SURVEY §5) AND are exported as best.pth /
  last.pth for reference tooling;
- the final artifact export is StableHLO of the jitted forward instead of
  ONNX (train.py:702-713), same best-effort try/except contract;
- val metrics are accumulated per-image (exact) while the history file also
  reproduces the reference's mean-of-batch-means aggregation
  (train.py:521-529) so curves are comparable.
"""

from __future__ import annotations

import json
import logging
import random
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.core.config import IMG_EXTS, TrainConfig
from vickers_tpu.data.loader import CachedDataset
from vickers_tpu.data.manifest import Manifest, scan, split_manifest
from vickers_tpu.models.unet import build_model, init_model
from vickers_tpu.train import checkpoint as ckpt
from vickers_tpu.train.engine import (
    EvalOut,
    cosine_epoch_lr,
    create_train_state,
    make_indexed_eval_step,
    make_indexed_train_step,
    make_optimizer,
    set_lr,
)
from vickers_tpu.train.visuals import save_batch_visuals
from vickers_tpu.utils.profiling import trace
from vickers_tpu.ops.image import normalize_imagenet

log = logging.getLogger(__name__)


def set_seed(seed: int = 42) -> jax.Array:
    """Seed python/numpy RNGs and derive the root JAX key (train.py:207-226
    equivalent — torch CPU/CUDA seeding maps to the JAX PRNG key)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def run(cfg: TrainConfig, max_epochs: Optional[int] = None) -> List[Dict]:
    """Train; returns the history list (same records as history.json)."""
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    root_key = set_seed(cfg.seed)

    # -- data ---------------------------------------------------------------
    man = scan(cfg.data, require_masks=True, drop_orphans=True)
    full_paths = sorted(
        str(p) for p in (Path(cfg.data) / "images").glob("*")
        if p.suffix.lower() in IMG_EXTS
    )
    train_man, val_man = split_manifest(man, cfg.seed, cfg.val_ratio, full_paths)
    train_ds = CachedDataset(train_man, cfg.img_size)
    val_ds = CachedDataset(val_man, cfg.img_size)

    # -- model / optimizer --------------------------------------------------
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model = build_model(cfg.encoder, dtype=dtype)
    init_key, _ = jax.random.split(root_key)
    params, batch_stats = init_model(model, init_key, cfg.img_size)
    if cfg.encoder_weights and cfg.encoder_weights not in ("imagenet", "none"):
        from vickers_tpu.compat.convert import load_pth_params

        params, batch_stats = load_pth_params(cfg.encoder_weights)
        log.info("loaded pretrained weights from %s", cfg.encoder_weights)
    elif cfg.encoder_weights == "imagenet":
        log.warning(
            "encoder_weights='imagenet': no torchvision download path in this "
            "environment; using random init (pass a .pth path for pretrained)"
        )

    tx = make_optimizer(cfg)
    state = create_train_state(model, params, batch_stats, tx, cfg.ema_decay)
    train_step = make_indexed_train_step(model, tx, cfg.augment, cfg.ema_decay)
    eval_step = make_indexed_eval_step(model)
    lr_of = cosine_epoch_lr(cfg.lr, cfg.epochs)

    # the whole (tiny) dataset lives in HBM for the run; steps gather their
    # batches on device from an index vector (no per-step input stream)
    dev_imgs = jax.device_put(train_ds.images)
    dev_masks = jax.device_put(train_ds.masks)
    vdev_imgs = jax.device_put(val_ds.images)
    vdev_masks = jax.device_put(val_ds.masks)

    out_dir = Path(cfg.out)
    (out_dir / "val_vis").mkdir(parents=True, exist_ok=True)
    log.info("Train: %d  Val: %d  Devices: %s", len(train_ds), len(val_ds), jax.devices())

    history: List[Dict] = []
    best_dice = -1.0
    no_improve = 0
    start_ep = 1
    patience = cfg.early_stop_patience
    epochs = min(cfg.epochs, max_epochs) if max_epochs else cfg.epochs

    # true crash-safe resume (no reference equivalent, SURVEY §5): restore
    # params, optimizer state, epoch counter, best metric and history
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
        log.info("resumed from epoch %d (best dice %.4f)", start_ep - 1, best_dice)

    data_rng = np.random.default_rng(cfg.seed + start_ep - 1)
    aug_key = jax.random.fold_in(root_key, start_ep)

    # hard-example oversampling (TrainConfig.oversample): extra index
    # repeats appended to every epoch's train stream
    extra_idx = None
    if cfg.oversample:
        extra = []
        for pat, rep in cfg.oversample:
            hits = [i for i, s in enumerate(train_ds.stems) if pat in s]
            extra.extend(hits * int(rep))
        if extra:
            extra_idx = np.asarray(extra, np.int64)
            log.info("oversampling %d extra samples/epoch (%s)",
                     len(extra), dict(cfg.oversample))

    # Checkpoint cost fix (round-4 profile finding: improving-phase epochs
    # ran ~2x steady wall clock).  Two layers:
    #  - the ~100 MB device->host fetch per improvement is replaced by an
    #    on-device copy (one jitted program, HBM-to-HBM, ~free) — best
    #    weights are only FETCHED and exported at checkpoint_every
    #    boundaries and at run end, always consistently with last.ckpt;
    #  - serialization + file IO run on a background writer thread.
    # Writes are atomic (tmp + os.replace), so a crash mid-write cannot
    # corrupt already-exported checkpoints.
    writer = ckpt.AsyncWriter()
    # fresh buffers are required (eval_state aliases donated train-state
    # buffers); jnp.copy under jit materializes them in one dispatch
    snapshot = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    best_dev = None      # device-resident copy of the best epoch's weights
    best_dirty = False   # best_dev newer than best.ckpt/best.pth on disk

    def flush_best():
        nonlocal best_dirty
        if best_dev is None or not best_dirty:
            return
        best_np = ckpt._as_numpy(best_dev)
        writer.submit(ckpt.save_native, out_dir / "best.ckpt", best_np)
        writer.submit(ckpt.export_pth, out_dir / "best.pth",
                      best_np["params"], best_np["batch_stats"])
        best_dirty = False

    for ep in range(start_ep, epochs + 1):
        t0 = time.time()
        # cosine lr for this epoch (torch steps the scheduler after the
        # epoch, so epoch e trains at eta(e-1); history records eta(e))
        state = set_lr(state, float(lr_of(jnp.asarray(ep - 1))))

        # ---- train ----
        # losses stay on device; ONE host fetch per epoch (each float() is a
        # full round trip through the TPU tunnel)
        losses, counts = [], []
        with trace(cfg.profile_dir if ep == 1 else None):
            for idx, w, _ in train_ds.epoch_index_batches(
                cfg.batch, shuffle=True, rng=data_rng, pad_final=True,
                extra_indices=extra_idx,
            ):
                aug_key, sk = jax.random.split(aug_key)
                state, loss = train_step(state, dev_imgs, dev_masks, idx, w, sk)
                losses.append(loss)
                counts.append(w.sum())
        counts = np.asarray(counts, np.float64)
        train_loss = float(np.dot(np.asarray(jnp.stack(losses), np.float64), counts)
                           / max(1.0, counts.sum()))

        # failure detection (SURVEY §5: the reference has none): a NaN/Inf
        # loss aborts with a crash checkpoint instead of silently poisoning
        # the remaining epochs
        if not np.isfinite(train_loss):
            ckpt.save_native(out_dir / "crash.ckpt", {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": ep, "best_dice": best_dice,
            })
            flush_best()     # don't lose the best weights on a NaN abort
            writer.drain()
            raise FloatingPointError(
                f"non-finite train loss {train_loss} at epoch {ep}; "
                f"state saved to {out_dir / 'crash.ckpt'}")

        # ---- validate ----
        # With EMA enabled, validation/checkpointing run on the averaged
        # weights (they're the exported model); raw weights keep training.
        eval_state = state
        if state.ema is not None:
            eval_state = state.replace(
                params=state.ema["params"], batch_stats=state.ema["batch_stats"])
        ep_vis_dir = out_dir / "val_vis" / f"ep_{ep:03d}"
        evals = []
        for idx, w, stems in val_ds.epoch_index_batches(
            cfg.batch, shuffle=False, pad_final=True
        ):
            out: EvalOut = eval_step(eval_state, vdev_imgs, vdev_masks, idx, w)
            evals.append(out)
            if cfg.dump_all_val:
                k = len(stems)
                imgs_np = val_ds.images[idx[:k]]
                x = np.asarray(normalize_imagenet(jnp.asarray(imgs_np, jnp.float32)))
                save_batch_visuals(
                    x, val_ds.masks[idx[:k]].astype(np.float32),
                    np.asarray(out.prob)[:k, :, :, 0], stems, ep_vis_dir,
                )
        ls = np.asarray(jnp.stack([e.loss_sum for e in evals]), np.float64)
        ds = np.asarray(jnp.stack([e.dice_sum for e in evals]), np.float64)
        is_ = np.asarray(jnp.stack([e.iou_sum for e in evals]), np.float64)
        ns = np.asarray(jnp.stack([e.n for e in evals]), np.float64)
        val_loss = float(ls.sum() / max(1.0, ns.sum()))
        # reference aggregation: mean over batches of batch means
        # (train.py:521-529)
        val_dice = float(np.mean(ds / np.maximum(ns, 1.0)))
        val_iou = float(np.mean(is_ / np.maximum(ns, 1.0)))

        rec = {
            "epoch": ep,
            "train_loss": float(train_loss),
            "val_loss": float(val_loss),
            "val_dice": float(val_dice),
            "val_iou": float(val_iou),
            "lr": float(lr_of(jnp.asarray(ep))),
            "time": round(time.time() - t0, 2),
        }
        history.append(rec)
        log.info(
            "Ep %03d | train %.4f | val %.4f | Dice %.4f | IoU %.4f | lr %.2e | %ss",
            ep, train_loss, val_loss, val_dice, val_iou, rec["lr"], rec["time"],
        )

        # ---- checkpoints (native full-state + reference-format .pth) ----
        # improvements snapshot on device only (no host fetch); disk export
        # batches up at checkpoint_every boundaries + run end (flush_best)
        if val_dice > best_dice:
            best_dice = val_dice
            best_dev = snapshot({"params": eval_state.params,
                                 "batch_stats": eval_state.batch_stats})
            best_dirty = True
            no_improve = 0
        else:
            no_improve += 1
        if ep % max(1, cfg.checkpoint_every) == 0 or ep == epochs:
            last_tree = {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": ep, "best_dice": best_dice,
            }
            if state.ema is not None:
                last_tree["ema"] = state.ema
            last_np = ckpt._as_numpy(last_tree)
            eval_np = ckpt._as_numpy({
                "params": eval_state.params,
                "batch_stats": eval_state.batch_stats})
            writer.submit(ckpt.save_native, out_dir / "last.ckpt", last_np)
            writer.submit(ckpt.export_pth, out_dir / "last.pth",
                          eval_np["params"], eval_np["batch_stats"])
            flush_best()

        with open(out_dir / "history.json", "w", encoding="utf-8") as f:
            json.dump(history, f, ensure_ascii=False, indent=2)

        if cfg.dump_all_train:
            tr_vis = out_dir / "train_vis" / f"ep_{ep:03d}"
            for idx, w, stems in train_ds.epoch_index_batches(
                cfg.batch, shuffle=False, pad_final=True
            ):
                out = eval_step(eval_state, dev_imgs, dev_masks, idx, w)
                k = len(stems)
                imgs_np = train_ds.images[idx[:k]]
                x = np.asarray(normalize_imagenet(jnp.asarray(imgs_np, jnp.float32)))
                save_batch_visuals(x, train_ds.masks[idx[:k]].astype(np.float32),
                                   np.asarray(out.prob)[:k, :, :, 0], stems, tr_vis)

        if patience is not None and no_improve >= patience:
            log.info("[EARLY STOP] no val_dice improvement for %d epochs "
                     "(stop at epoch %d)", patience, ep)
            break

    # flush the device-resident best snapshot, then let all queued writes
    # land (and any writer error surface) before the final artifacts
    flush_best()
    writer.close()

    # ---- final export: StableHLO of the jitted forward (ONNX analog) ----
    try:
        dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
        final = state if state.ema is None else state.replace(
            params=state.ema["params"], batch_stats=state.ema["batch_stats"])
        lowered = jax.jit(
            lambda x: model.apply(
                {"params": final.params, "batch_stats": final.batch_stats},
                x, train=False)
        ).lower(dummy)
        (out_dir / "unet_stablehlo.mlir").write_text(lowered.as_text())
        log.info("exported StableHLO to %s", out_dir / "unet_stablehlo.mlir")
    except Exception as e:  # same tolerance as the reference's ONNX export
        log.warning("StableHLO export failed: %s", e)

    # ---- unet.onnx: the reference GUIs' preferred artifact ---------------
    # (train.py:702-713 equivalent; ui_infer_rectangle.py:474-487 load path)
    try:
        from vickers_tpu.compat.onnx_export import export_onnx

        final = state if state.ema is None else state.replace(
            params=state.ema["params"], batch_stats=state.ema["batch_stats"])
        export_onnx(out_dir / "unet.onnx", final.params, final.batch_stats,
                    img_size=cfg.img_size)
        log.info("exported ONNX to %s", out_dir / "unet.onnx")
    except Exception as e:
        log.warning("ONNX export failed: %s", e)

    return history
