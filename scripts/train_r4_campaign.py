"""Round-4 Dice campaign: the SSL table the round-3 verdict asked for.

Round-3 delivered one measured SSL configuration (mask, 4000 steps) and a
+0.0008 end-to-end gain (0.95977 vs the reference's ImageNet-initialized
0.97291, /root/reference/runs/unet_r34_512/history.json:1812-1820).  The
verdict asks for the `noise` variant measured end-to-end plus scaled `mask`
schedules — a table of >=3 measured configurations, each with warm-start
loss, ep-2 Dice and best Dice, proving the approach's envelope.

Configs (run sequentially under a wall-clock deadline; each stage sizes its
fine-tune cosine schedule to the time actually left):

  A. ``noise`` denoising-autoencoder SSL, 4000 steps x batch 16
     -> fine-tune with the round-3 recipe (EMA 0.999, scale jitter, lr 2e-4).
  B. ``mask`` SSL at a 2x schedule (8000 steps) -> same fine-tune.
  C. (fallback if B does not fit) second cosine cycle: fine-tune restarted
     from the committed round-3 best checkpoint at lr 5e-5.

Usage: python scripts/train_r4_campaign.py --deadline-epoch <unix-ts>
"""
import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("r4campaign")

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.train.loop import run
from vickers_tpu.train.ssl import run_ssl_pretrain

DATA = "/root/reference/data"
EP_SEC = 8.0          # fine-tune s/epoch estimate (6.3 measured r3 + contention)
SSL_STEP_SEC = 0.34   # SSL s/step estimate (0.283 measured r3 + contention)


def left(deadline):
    return deadline - time.time()


def finetune(out, warm, deadline, lr=2e-4, min_ep=120, max_ep=800,
             share=1.0):
    budget = left(deadline) * share
    epochs = int(budget / EP_SEC)
    if epochs < min_ep:
        log.info("skip ft %s: only %d epochs fit", out, epochs)
        return None
    epochs = min(epochs, max_ep)
    log.info("fine-tune %s: %d epochs (%.0f min budget)", out, epochs,
             budget / 60)
    cfg = TrainConfig(
        data=DATA, epochs=epochs, lr=lr, encoder_weights=warm, out=out,
        dump_all_val=False, checkpoint_every=25, ema_decay=0.999,
        resume=True, augment=AugmentConfig(scale_p=0.3, scale_limit=0.2),
    )
    hist = run(cfg)
    best = max(h["val_dice"] for h in hist)
    ep2 = hist[1]["val_dice"] if len(hist) > 1 else None
    rec = {"out": out, "warm": warm, "epochs": epochs, "lr": lr,
           "ep2_dice": ep2, "best_dice": best}
    log.info("DONE %s", json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-epoch", type=float, required=True,
                    help="unix timestamp to be fully done by")
    args = ap.parse_args()
    deadline = args.deadline_epoch
    results = []
    res_path = Path("runs/r4_campaign.json")

    def record(rec):
        if rec:
            results.append(rec)
            res_path.write_text(json.dumps(results, indent=2))

    # ---- Config A: noise variant, measured end-to-end -------------------
    ssl_out = "runs/ssl_noise_r4"
    if not Path(ssl_out, "ssl_warmstart.pth").exists():
        hist = run_ssl_pretrain(DATA, ssl_out, variant="noise", steps=4000,
                                batch=16, lr=1e-3, tile=512)
        record({"out": ssl_out, "stage": "ssl", "variant": "noise",
                "steps": 4000, "final_loss": hist[-1]["loss"]})
    # A's fine-tune gets 55% of what's left; B needs the rest.
    record(finetune("runs/unet_r34_512_r4noise",
                    f"{ssl_out}/ssl_warmstart.pth", deadline, share=0.55))

    # ---- Config B: mask at 2x schedule (8000 steps) ---------------------
    need_b = 8000 * SSL_STEP_SEC + 120 * EP_SEC
    if left(deadline) > need_b:
        ssl_out = "runs/ssl_mask8k_r4"
        if not Path(ssl_out, "ssl_warmstart.pth").exists():
            hist = run_ssl_pretrain(DATA, ssl_out, variant="mask",
                                    steps=8000, batch=16, lr=1e-3, tile=512)
            record({"out": ssl_out, "stage": "ssl", "variant": "mask",
                    "steps": 8000, "final_loss": hist[-1]["loss"]})
        record(finetune("runs/unet_r34_512_r4mask8k",
                        f"{ssl_out}/ssl_warmstart.pth", deadline))
    else:
        # ---- Config C fallback: second cosine cycle from r3 best --------
        record(finetune("runs/unet_r34_512_r4cycle2",
                        "runs/unet_r34_512_r3ssl/best.pth", deadline,
                        lr=5e-5, min_ep=80))

    log.info("campaign complete: %s", json.dumps(results))


if __name__ == "__main__":
    main()
