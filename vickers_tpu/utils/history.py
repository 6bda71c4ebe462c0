"""Training-history loading, CSV export and curve plotting.

Functional parity with plot_history.py (whole file): accepts a history.json
path or a run directory, forward-fills missing keys (:47-61), optional
moving-average smoothing (:21-32), 2x2 plot (losses / dice / iou / lr) to
curves.png (:72-112) and optional CSV (:63-70).
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

KEYS = ("epoch", "train_loss", "val_loss", "val_dice", "val_iou", "lr", "time")


def load_history(path: str | Path) -> List[Dict]:
    p = Path(path)
    if p.is_dir():
        p = p / "history.json"
    if not p.exists():
        raise FileNotFoundError(str(p))
    with open(p, "r", encoding="utf-8") as f:
        hist = json.load(f)
    if not isinstance(hist, list) or not hist:
        raise ValueError(f"empty or malformed history: {p}")
    return hist


def to_series(history: Sequence[Dict]) -> Dict[str, List[float]]:
    """Column-wise series with forward-fill for missing keys."""
    series: Dict[str, List[float]] = {k: [] for k in KEYS}
    last: Dict[str, float] = {}
    for rec in history:
        for k in KEYS:
            v = rec.get(k, last.get(k, 0.0))
            last[k] = v
            series[k].append(v)
    return series


def moving_average(xs: Sequence[float], window: int) -> List[float]:
    if window <= 1:
        return list(xs)
    out: List[float] = []
    acc = 0.0
    from collections import deque

    q: deque = deque()
    for x in xs:
        q.append(x)
        acc += x
        if len(q) > window:
            acc -= q.popleft()
        out.append(acc / len(q))
    return out


def save_csv(history: Sequence[Dict], out_path: str | Path) -> None:
    series = to_series(history)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(KEYS)
        for i in range(len(history)):
            w.writerow([series[k][i] for k in KEYS])


def plot_curves(history: Sequence[Dict], out_path: str | Path = "curves.png",
                smooth: int = 1, show: bool = False) -> None:
    import matplotlib

    matplotlib.use("Agg" if not show else matplotlib.get_backend())
    import matplotlib.pyplot as plt

    s = to_series(history)
    ep = s["epoch"]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))

    ax = axes[0][0]
    ax.plot(ep, moving_average(s["train_loss"], smooth), label="train_loss")
    ax.plot(ep, moving_average(s["val_loss"], smooth), label="val_loss")
    ax.set_title("Loss"); ax.set_xlabel("epoch"); ax.legend(); ax.grid(True)

    ax = axes[0][1]
    ax.plot(ep, moving_average(s["val_dice"], smooth), color="tab:green")
    ax.set_title("Val Dice"); ax.set_xlabel("epoch"); ax.grid(True)

    ax = axes[1][0]
    ax.plot(ep, moving_average(s["val_iou"], smooth), color="tab:orange")
    ax.set_title("Val IoU"); ax.set_xlabel("epoch"); ax.grid(True)

    ax = axes[1][1]
    ax.plot(ep, s["lr"], color="tab:red")
    ax.set_title("Learning rate"); ax.set_xlabel("epoch"); ax.grid(True)

    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    if show:
        plt.show()
    plt.close(fig)


def convergence_summary(history: Sequence[Dict]) -> Dict[str, float]:
    """Convergence envelope of a run: best/final metrics and epochs-to-
    threshold, the comparison basis against the reference's committed curves
    (runs/unet_r34_512/history{,_0}.json — SURVEY §6)."""
    dices = [r.get("val_dice", 0.0) for r in history]
    ious = [r.get("val_iou", 0.0) for r in history]
    best_i = int(max(range(len(dices)), key=lambda i: dices[i]))

    def epochs_to(th: float) -> Optional[int]:
        for i, d in enumerate(dices):
            if d >= th:
                return i + 1
        return None

    return {
        "epochs": len(history),
        "best_val_dice": dices[best_i],
        "best_epoch": best_i + 1,
        "best_val_iou": ious[best_i],
        "final_val_dice": dices[-1],
        "final_val_iou": ious[-1],
        "epochs_to_0.90": epochs_to(0.90),
        "epochs_to_0.95": epochs_to(0.95),
        "epochs_to_0.97": epochs_to(0.97),
        "mean_epoch_time_s": float(sum(r.get("time", 0.0) for r in history))
        / max(1, len(history)),
    }


def compare_runs(ours: Sequence[Dict], reference: Sequence[Dict]) -> Dict:
    return {
        "ours": convergence_summary(ours),
        "reference": convergence_summary(reference),
    }
