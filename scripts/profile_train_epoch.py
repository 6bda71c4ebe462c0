"""Where does the 6.0 s training epoch go?  (round-3 verdict weak #2)

Times the training epoch's phases separately with the exact production step
functions and datasets (letterbox recipe, batch 8, 164 train / 18 val):

  train_steps  — the 21 jitted donated train steps, dependency-chained,
                 ONE host fetch at the end (as in train/loop.py)
  eval_steps   — the 3 jitted eval steps + the epoch's host fetches
  ckpt_submit  — what an improving epoch NOW pays for the best.ckpt +
                 best.pth export: device->host fetch + enqueue to the
                 round-5 background writer (train/checkpoint.AsyncWriter)
  ckpt_sync    — the same export done synchronously (the pre-round-5
                 cost, measured once for the A/B)

Writes TRAIN_PROFILE_r05.json.  Compare the sum against the measured epoch
wall time in runs/*/history.json (~6.0-6.3 s steady).

Usage: python scripts/profile_train_epoch.py [--epochs 3]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--json", default="TRAIN_PROFILE_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from vickers_tpu.core.config import IMG_EXTS, AugmentConfig, TrainConfig
    from vickers_tpu.data.loader import CachedDataset
    from vickers_tpu.data.manifest import scan, split_manifest
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.train import checkpoint as ckpt
    from vickers_tpu.train.engine import (create_train_state,
                                          make_indexed_eval_step,
                                          make_indexed_train_step,
                                          make_optimizer)
    from vickers_tpu.train.loop import set_seed
    from pathlib import Path

    cfg = TrainConfig(data="/root/reference/data", epochs=500,
                      dump_all_val=False,
                      augment=AugmentConfig(scale_p=0.3, scale_limit=0.2))
    root_key = set_seed(cfg.seed)
    man = scan(cfg.data, require_masks=True, drop_orphans=True)
    full_paths = sorted(str(p) for p in (Path(cfg.data) / "images").glob("*")
                        if p.suffix.lower() in IMG_EXTS)
    train_man, val_man = split_manifest(man, cfg.seed, cfg.val_ratio, full_paths)
    train_ds, val_ds = CachedDataset(train_man, 512), CachedDataset(val_man, 512)

    model = build_model(dtype=jnp.bfloat16)
    params, stats = init_model(model, jax.random.PRNGKey(0), 512)
    tx = make_optimizer(cfg)
    state = create_train_state(model, params, stats, tx, 0.999)
    train_step = make_indexed_train_step(model, tx, cfg.augment, 0.999)
    eval_step = make_indexed_eval_step(model)

    dev_imgs = jax.device_put(train_ds.images)
    dev_masks = jax.device_put(train_ds.masks)
    vdev_imgs = jax.device_put(val_ds.images)
    vdev_masks = jax.device_put(val_ds.masks)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    writer = ckpt.AsyncWriter()
    snapshot = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    best_dev = None

    def one_epoch():
        nonlocal state, key
        t0 = time.perf_counter()
        losses = []
        for idx, w, _ in train_ds.epoch_index_batches(8, shuffle=True,
                                                      rng=rng, pad_final=True):
            key, sk = jax.random.split(key)
            state, loss = train_step(state, dev_imgs, dev_masks, idx, w, sk)
            losses.append(loss)
        tl = float(np.mean(np.asarray(jnp.stack(losses))))  # host fetch
        t1 = time.perf_counter()
        evals = []
        for idx, w, _ in val_ds.epoch_index_batches(8, shuffle=False,
                                                    pad_final=True):
            evals.append(eval_step(state, vdev_imgs, vdev_masks, idx, w))
        dice = float(np.sum(np.asarray(jnp.stack([e.dice_sum for e in evals]))))
        t2 = time.perf_counter()
        # an improving epoch's checkpoint cost in the round-5 production
        # loop: an on-device snapshot (jitted HBM copy), NO host fetch
        nonlocal best_dev
        best_dev = snapshot({"params": state.params,
                             "batch_stats": state.batch_stats})
        jax.block_until_ready(best_dev)
        t3 = time.perf_counter()
        return {"train_steps_s": round(t1 - t0, 3),
                "eval_steps_s": round(t2 - t1, 3),
                "ckpt_snapshot_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
                "train_loss": round(tl, 4), "dice_sum": round(dice, 3)}

    rows = [one_epoch()]            # compile epoch (excluded from summary)
    rows[0]["note"] = "compile epoch"
    for _ in range(args.epochs):
        rows.append(one_epoch())
        print(json.dumps(rows[-1]), flush=True)
    # boundary flush (the once-per-checkpoint_every cost): fetch the
    # device snapshot + enqueue serialization to the writer
    t0 = time.perf_counter()
    tree = ckpt._as_numpy(best_dev)
    fetch_s = round(time.perf_counter() - t0, 3)
    writer.submit(ckpt.save_native, "/tmp/prof_best.ckpt", tree)
    writer.submit(ckpt.export_pth, "/tmp/prof_best.pth",
                  tree["params"], tree["batch_stats"])
    submit_s = round(time.perf_counter() - t0, 3)
    writer.close()
    # the pre-round-5 synchronous export, once, for the A/B
    t0 = time.perf_counter()
    ckpt.save_native("/tmp/prof_best.ckpt", {
        "params": state.params, "batch_stats": state.batch_stats})
    ckpt.export_pth("/tmp/prof_best.pth", state.params, state.batch_stats)
    sync_s = round(time.perf_counter() - t0, 3)
    steady = rows[1:]
    summary = {k: round(float(np.mean([r[k] for r in steady])), 3)
               for k in ("train_steps_s", "eval_steps_s", "ckpt_snapshot_s",
                         "total_s")}
    summary["flush_fetch_s"] = fetch_s          # paid once per
    summary["flush_submit_s"] = submit_s        # checkpoint_every epochs
    summary["ckpt_sync_legacy_s"] = sync_s      # fetch + serialize inline
    summary["n_train_steps"] = 21
    summary["per_train_step_ms"] = round(
        summary["train_steps_s"] / 21 * 1000, 1)
    out = {"epochs": rows, "steady_mean": summary}
    json.dump(out, open(args.json, "w"), indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
