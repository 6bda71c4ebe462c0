"""Compat entry point for the reference's plot_history.py CLI.

Same argparse surface (path --smooth --show --csv --out,
plot_history.py:114-141) backed by vickers_tpu.utils.history.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from vickers_tpu.utils.history import load_history, plot_curves, save_csv


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="plot training curves from history.json")
    ap.add_argument("path", help="history.json file or run directory")
    ap.add_argument("--smooth", type=int, default=1)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    hist = load_history(args.path)
    out = args.out
    if out is None:
        p = Path(args.path)
        out = str((p if p.is_dir() else p.parent) / "curves.png")
    if args.csv:
        save_csv(hist, args.csv)
    plot_curves(hist, out, smooth=args.smooth, show=args.show)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
