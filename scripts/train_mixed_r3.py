"""Round-3 mixed-scale run for tiled full-resolution acceptance.

Round-2's mixed run warm-started from the letterbox checkpoint and saw only
12 native-crop batches per epoch; its tiled eval failed (corner-vignette
false positives + undersegmentation on two 3072x2048 shots).  This run
starts from the SSL-fine-tuned letterbox model (scripts/train_r3.py), whose
encoder was itself pre-trained on native-resolution crops, and doubles the
native-crop exposure.
"""
import logging
import sys

sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.train.mixed import run_mixed_training

cfg = TrainConfig(
    data="/root/reference/data",
    epochs=300,
    lr=2e-4,
    encoder_weights="runs/unet_r34_512_r3ssl/best.pth",
    out="runs/unet_r34_mixed512_r3",
    ema_decay=0.999,
    resume=True,
    checkpoint_every=25,
    augment=AugmentConfig(scale_p=0.5, scale_limit=0.3),
)
hist = run_mixed_training(cfg, crop_batches_per_epoch=24, fg_bias=0.6)
best = max(h["val_dice"] for h in hist)
print(f"DONE best_val_dice={best:.5f}")
