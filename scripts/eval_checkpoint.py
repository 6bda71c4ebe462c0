"""Standalone re-evaluation of a best.ckpt on the training val protocol.

Usage: python scripts/eval_checkpoint.py runs/unet_r34_512_r5cycle3/best.ckpt

Mirrors train/loop.py's validation (same split_manifest seed/ratio, same
CachedDataset, same make_indexed_eval_step, sample-weighted sums) with the
checkpoint's params/batch_stats in place of the live EMA state.

Round-5 finding recorded in BENCH.md: every round's best.ckpt re-evaluates
here ~0.006-0.008 BELOW the val_dice its history.json logged in-run
(r5cycle3: 0.96195 vs 0.96786; r5long: 0.95401 vs 0.96182; r3ssl: 0.95186
vs 0.95977).  The offset is systematic and ordering-preserving, so
cross-round comparisons hold under either protocol; the in-run numbers are
the like-for-like comparison against the reference's history.json (also an
in-run training-loop metric, train.py:640-663).  Root cause of the offset
(suspects: EMA-state context at snapshot time vs reloaded state, bf16
compute context differences) is an open item for a future session.
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vickers_tpu.core.config import TrainConfig
from vickers_tpu.data.loader import CachedDataset
from vickers_tpu.data.manifest import scan, split_manifest
from vickers_tpu.models.unet import build_model, init_model
from vickers_tpu.train import checkpoint as ckpt
from vickers_tpu.train.engine import (create_train_state, make_optimizer,
                                      make_indexed_eval_step)
import vickers_tpu.train.loop as L


def evaluate(ckpt_path: str, data: str = "/root/reference/data") -> float:
    cfg = TrainConfig(data=data, out="/tmp/evalrun")
    man = scan(cfg.data, require_masks=True, drop_orphans=True)
    full_paths = sorted(str(p) for p in (Path(cfg.data) / "images").glob("*")
                        if p.suffix.lower() in L.IMG_EXTS)
    _, val_man = split_manifest(man, cfg.seed, cfg.val_ratio, full_paths)
    val_ds = CachedDataset(val_man, cfg.img_size)
    dtype = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
             else jnp.float32)
    model = build_model(cfg.encoder, dtype=dtype)
    params, stats = init_model(model, jax.random.PRNGKey(0), cfg.img_size)
    tree = ckpt.load_native(ckpt_path, {"params": params, "batch_stats": stats})
    state = create_train_state(model, tree["params"], tree["batch_stats"],
                               make_optimizer(cfg), 0.0)
    eval_step = make_indexed_eval_step(model)
    vimgs = jax.device_put(val_ds.images)
    vmasks = jax.device_put(val_ds.masks)
    ds_sum = n_sum = 0.0
    for idx, w, _ in val_ds.epoch_index_batches(cfg.batch, shuffle=False,
                                                pad_final=True):
        out = eval_step(state, vimgs, vmasks, idx, w)
        ds_sum += float(out.dice_sum)
        n_sum += float(out.n)
    return ds_sum / n_sum


if __name__ == "__main__":
    path = sys.argv[1]
    print(f"{path}: standalone val_dice = {evaluate(path):.5f}")
