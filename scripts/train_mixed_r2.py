"""Round-2 mixed-scale run: one checkpoint for letterbox AND tiled paths.

Thin wrapper over vickers_tpu.train.mixed.run_mixed_training (also
reachable as `cli train --mode mixed`)."""
import logging
import sys

sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.train.mixed import run_mixed_training

cfg = TrainConfig(
    data="/root/reference/data",
    epochs=300,
    lr=3e-4,
    encoder_weights="runs/unet_r34_512_r2/best.pth",
    out="runs/unet_r34_mixed512_r2",
    ema_decay=0.999,
    resume=True,
    checkpoint_every=25,
    augment=AugmentConfig(scale_p=0.5, scale_limit=0.3),
)
hist = run_mixed_training(cfg, crop_batches_per_epoch=12)
best = max(h["val_dice"] for h in hist)
print(f"DONE best_val_dice={best:.5f}")
