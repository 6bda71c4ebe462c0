"""Round-2 convergence run: from-scratch recipe targeting val Dice >= 0.97.

Reference comparison: runs/unet_r34_512/history.json best Dice 0.97291
(ImageNet-init); this run is from scratch (no ImageNet weights in this
environment) with the round-2 recipe upgrades: decorrelated aug draws,
EMA(0.999) weights for eval/export, mild scale jitter.
"""
import dataclasses
import logging
import sys

sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.train.loop import run

cfg = TrainConfig(
    data="/root/reference/data",
    epochs=1200,
    lr=1e-3,
    out="runs/unet_r34_512_r2",
    dump_all_val=False,
    checkpoint_every=25,
    ema_decay=0.999,
    resume=True,
    augment=AugmentConfig(scale_p=0.3, scale_limit=0.2),
)
hist = run(cfg)
best = max(h["val_dice"] for h in hist)
print(f"DONE best_val_dice={best:.5f}")
