"""Round-5b Dice campaign: recover lost warm starts, then spend the chip on
the two configs still open after the relay VM reset.

The first round-5 session measured the named SSL scalings (8k/16k) but its
warm-start .pth files and fine-tuned checkpoints were gitignored and lost
with the VM; only history.json + unet.onnx survive.  Re-running 16k SSL
(~85 min) would eat the whole session, so instead:

  R1. Recover the 16k fine-tuned model's final EMA weights from its
      committed ``unet.onnx`` (compat.onnx_ingest wire-format parser) and
      continue it on a LONG low-lr cosine (the r5 analysis: "schedule
      length, not SSL scale, dominates past ~0.955" — r3ssl gained +0.006
      from ep 185 to 758; this model stopped at 185).
  R2. Multi-crop curriculum 256 -> 384 -> 512 (round-3/4 verdict config C)
      from the only SSL backbone on disk (runs/ssl_mask_r3), compressed to
      the remaining budget.
  R3. (time permitting) opportunistic second cycle from the overall best.

Results append to runs/r5_campaign.json like the first session's rows.

Usage: python scripts/train_r5b.py --deadline-epoch <unix-ts>
"""
import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
log = logging.getLogger("r5b")

from vickers_tpu.core.config import AugmentConfig, TrainConfig
from vickers_tpu.train.loop import run

DATA = "/root/reference/data"
EP_SEC = {256: 2.6, 384: 4.6, 512: 6.7}
OVERSAMPLE = (("image003", 1),)
RES = Path("runs/r5_campaign.json")


def record(rec):
    if rec:
        results = json.loads(RES.read_text()) if RES.exists() else []
        results.append(rec)
        RES.write_text(json.dumps(results, indent=2))


def recover_pth_from_onnx(onnx_path: str, out_pth: str) -> str:
    """unet.onnx (final EMA weights, train/loop.py export) -> reference-format
    .pth consumable by TrainConfig.encoder_weights."""
    import torch

    from vickers_tpu.compat.convert import flax_to_torch_state_dict
    from vickers_tpu.compat.onnx_ingest import load_onnx_params

    if Path(out_pth).exists():
        return out_pth
    params, batch_stats = load_onnx_params(onnx_path)
    sd = {k: torch.from_numpy(v.copy()) if hasattr(v, "copy") else torch.tensor(v)
          for k, v in flax_to_torch_state_dict(params, batch_stats).items()}
    torch.save(sd, out_pth)
    log.info("recovered %s -> %s (%d tensors)", onnx_path, out_pth, len(sd))
    return out_pth


def finetune(out, warm, deadline, lr, max_ep, img_size=512, batch=8,
             min_ep=40, patience=None, note=None):
    budget = deadline - time.time()
    epochs = int(budget / EP_SEC[img_size])
    if epochs < min_ep:
        log.info("skip %s: only %d epochs fit", out, epochs)
        return None
    epochs = min(epochs, max_ep)
    log.info("fine-tune %s: size %d, %d epochs, lr %g (%.0f min left)",
             out, img_size, epochs, lr, budget / 60)
    cfg = TrainConfig(
        data=DATA, epochs=epochs, lr=lr, encoder_weights=warm, out=out,
        img_size=img_size, batch=batch, dump_all_val=False,
        checkpoint_every=25, ema_decay=0.999, resume=True,
        early_stop_patience=patience, oversample=OVERSAMPLE,
        augment=AugmentConfig(scale_p=0.3, scale_limit=0.2),
    )
    hist = run(cfg)
    best = max(h["val_dice"] for h in hist)
    rec = {"out": out, "warm": warm, "img_size": img_size,
           "epochs_run": len(hist), "lr": lr,
           "ep2_dice": hist[1]["val_dice"] if len(hist) > 1 else None,
           "best_dice": best}
    if note:
        rec["note"] = note
    log.info("DONE %s", json.dumps(rec))
    record(rec)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-epoch", type=float, required=True)
    args = ap.parse_args()
    deadline = args.deadline_epoch

    # ---- R1: continue the 16k-SSL fine-tune on a long cosine --------------
    warm = recover_pth_from_onnx("runs/unet_r34_512_r5m16k/unet.onnx",
                                 "runs/unet_r34_512_r5m16k/recovered_ema.pth")
    r1_deadline = min(deadline, time.time() + 0.68 * (deadline - time.time()))
    finetune("runs/unet_r34_512_r5long", warm, r1_deadline, lr=1e-4,
             max_ep=620,
             note="cycle 2 of the 16k-SSL model (185-ep cycle 1 recovered "
                  "from its ONNX EMA export after the VM reset); total "
                  "schedule 185+N epochs")

    # ---- R2: multi-crop curriculum from the r3 SSL backbone ---------------
    c1 = finetune("runs/unet_r34_c256_r5", "runs/ssl_mask_r3/ssl_warmstart.pth",
                  min(deadline, time.time() + 0.14 * (deadline - time.time())),
                  lr=2e-4, img_size=256, batch=32, min_ep=40, max_ep=120,
                  note="curriculum stage 1 (4k mask-SSL backbone; the 16k "
                       "backbone was lost to the VM reset)")
    if c1:
        c2 = finetune("runs/unet_r34_c384_r5", "runs/unet_r34_c256_r5/best.pth",
                      min(deadline, time.time() + 0.22 * (deadline - time.time())),
                      lr=1.5e-4, img_size=384, batch=16, min_ep=30, max_ep=100,
                      note="curriculum stage 2")
        warm512 = ("runs/unet_r34_c384_r5/best.pth" if c2
                   else "runs/unet_r34_c256_r5/best.pth")
        finetune("runs/unet_r34_512_r5curr", warm512, deadline, lr=1e-4,
                 min_ep=40, max_ep=300, note="curriculum stage 3 (512)")

    # ---- R3: opportunistic extra cycle from the overall best --------------
    results = json.loads(RES.read_text()) if RES.exists() else []
    cands = [(r["best_dice"], r["out"]) for r in results
             if "best_dice" in r and r.get("img_size", 512) == 512
             and Path(r["out"], "best.pth").exists()]
    if cands and deadline - time.time() > 60 * EP_SEC[512]:
        best_out = max(cands)[1]
        finetune("runs/unet_r34_512_r5cycle3", f"{best_out}/best.pth",
                 deadline, lr=5e-5, min_ep=60, max_ep=200,
                 note=f"extra low-lr cycle from {best_out}")

    log.info("r5b campaign complete")


if __name__ == "__main__":
    main()
