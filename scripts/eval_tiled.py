"""Tiled full-resolution acceptance evaluation (BASELINE config 4).

For each full-resolution val-split image: run TiledEngine.detect with the
given checkpoint and compare against the cv2 GT-oracle chain (minAreaRect
diagonals on the ground-truth mask at native resolution).  Acceptance per
VERDICT round-1 task 5: d_mean within 1% of the oracle, zero false
positives / missed detections.

Usage: python scripts/eval_tiled.py [model_dir] [--all|--val]
"""
import itertools
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import cv2
import numpy as np


def oracle_detections(mask: np.ndarray):
    h, w = mask.shape
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
    out = []
    for i in range(1, n):
        if stats[i, cv2.CC_STAT_AREA] < max(200, 0.0008 * h * w):
            continue
        cnts, _ = cv2.findContours((labels == i).astype(np.uint8),
                                   cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        c = max(cnts, key=cv2.contourArea)
        box = cv2.boxPoints(cv2.minAreaRect(c))
        pairs = sorted(itertools.combinations(range(4), 2),
                       key=lambda p: -np.linalg.norm(box[p[0]] - box[p[1]]))
        (a, b) = pairs[0]
        (c2, d2) = next(p for p in pairs[1:] if len(set(p) | set(pairs[0])) == 4)
        d1 = np.linalg.norm(box[a] - box[b])
        d2_ = np.linalg.norm(box[c2] - box[d2])
        cx, cy = box.mean(axis=0)
        out.append({"d_mean": (d1 + d2_) / 2, "center": (cx, cy),
                    "area": int(stats[i, cv2.CC_STAT_AREA])})
    return sorted(out, key=lambda d: -d["area"])


def main():
    import jax.numpy as jnp

    from vickers_tpu.core.config import IMG_EXTS
    from vickers_tpu.data.manifest import scan, split_manifest
    from vickers_tpu.infer.engine import InferenceEngine
    from vickers_tpu.infer.tiled import TiledEngine

    model_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/unet_r34_mixed512_r2"
    data = "/root/reference/data"
    man = scan(data, require_masks=True, drop_orphans=True)
    full_paths = sorted(str(p) for p in (Path(data) / "images").glob("*")
                        if p.suffix.lower() in IMG_EXTS)
    _, val_man = split_manifest(man, 42, 0.1, full_paths)
    samples = val_man.samples if "--all" not in sys.argv else man.samples

    eng = InferenceEngine(model_dir=model_dir)
    assert eng.ok(), f"no checkpoint under {model_dir}"
    tiled = TiledEngine(eng, tile=512, overlap=64)

    n_img = n_match = 0
    errs, fps, misses = [], 0, 0
    for s in samples:
        img = cv2.imread(s.image, cv2.IMREAD_COLOR)
        msk = cv2.imread(s.mask, cv2.IMREAD_UNCHANGED)
        if msk.ndim == 3:
            msk = msk[:, :, 0]
        want = oracle_detections((msk > 0).astype(np.uint8))
        prob, dets = tiled.detect(img)
        n_img += 1
        # greedy center matching
        used = set()
        for o in want:
            best, bi = None, None
            for i, d in enumerate(dets):
                if i in used:
                    continue
                dist = np.hypot(d.center[0] - o["center"][0],
                                d.center[1] - o["center"][1])
                if dist < 0.5 * o["d_mean"] and (best is None or dist < best):
                    best, bi = dist, i
            if bi is None:
                misses += 1
                continue
            used.add(bi)
            rel = abs(dets[bi].d_mean - o["d_mean"]) / o["d_mean"]
            errs.append(rel)
            n_match += 1
        fps += len(dets) - len(used)
        print(f"{s.stem}: GT {len(want)} det {len(dets)} "
              f"rel {[round(e, 4) for e in errs[-len(want):]]}", flush=True)

    errs = np.asarray(errs) if errs else np.asarray([np.nan])
    print(f"\nimages {n_img}  matched {n_match}  misses {misses}  FPs {fps}")
    print(f"d_mean rel err: mean {np.nanmean(errs):.4f}  "
          f"max {np.nanmax(errs):.4f}")
    ok = misses == 0 and fps == 0 and np.nanmax(errs) < 0.01
    print("ACCEPTANCE:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
