"""Label audit for the tiled strict-rule FAIL (round-3 verdict item 4).

TILED_ACCEPT_r03.json records 3 tiled FPs + a 10.4% max-error image, with
the defense ("the FPs are real unlabeled indentation marks; the error image
is a label-quality issue") existing only as prose.  This script converts it
into evidence:

for every unmatched detection (FP) and every matched detection with
rel err > 2% on either serving path, write an evidence crop to
``audits/tiled_r4/``:

  * red    — the engine's detection box + diagonals
  * green  — GT mask contours (what the label actually annotates)
  * yellow — the matched GT-oracle minAreaRect box (error cases)

plus a machine-readable ``skeleton.json`` with center/area/d_mean/
center-prob per case.  A human (or the building agent, via image reading)
then classifies each case in ``audit.json`` (kind: waive_fp | waive_error,
verdict + reason); ``scripts/eval_tiled.py --audit=...`` applies the
waivers and reports the strict rule against the audited labels alongside
the raw numbers.

Reference contrast: the reference has no high-res path to audit at all
(6x-downsample letterbox only, ui_infer_rectangle.py:225-261).

Usage: python scripts/audit_tiled.py [tiled_ckpt] [letterbox_model_dir]
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

if os.environ.get("VICKERS_CPU"):
    # run on the CPU backend so the audit can proceed while training owns
    # the TPU relay (two axon processes deadlock — .claude/skills/verify)
    import jax

    jax.config.update("jax_platforms", "cpu")

import cv2
import numpy as np

from eval_tiled import _match, oracle_detections

OUT = Path("audits/tiled_r4")


def _crop_bounds(center, d_mean, shape, pad_scale=1.4, min_half=192):
    h, w = shape[:2]
    half = int(max(min_half, pad_scale * d_mean / 2 + 40))
    cx, cy = int(center[0]), int(center[1])
    x0, x1 = max(0, cx - half), min(w, cx + half)
    y0, y1 = max(0, cy - half), min(h, cy + half)
    return x0, y0, x1, y1


def _draw_det(canvas, det, color, off):
    box = (np.asarray(det.box) - off).astype(np.int32)
    cv2.polylines(canvas, [box], True, color, 3)
    for a, b in ((0, 2), (1, 3)):
        cv2.line(canvas, tuple(box[a]), tuple(box[b]), color, 1)


def _save_case(img, msk, det, oracle_det, stem, path_name, kind, idx,
               center_prob, rel_err=None):
    x0, y0, x1, y1 = _crop_bounds(det.center, det.d_mean, img.shape)
    canvas = img[y0:y1, x0:x1].copy()
    off = np.array([x0, y0], np.float32)
    cnts, _ = cv2.findContours((msk[y0:y1, x0:x1] > 0).astype(np.uint8),
                               cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    cv2.drawContours(canvas, cnts, -1, (0, 255, 0), 2)
    _draw_det(canvas, det, (0, 0, 255), off)
    if oracle_det is not None and "box" in oracle_det:
        obox = (np.asarray(oracle_det["box"]) - off).astype(np.int32)
        cv2.polylines(canvas, [obox], True, (0, 255, 255), 2)
    label = f"{kind} p={center_prob:.2f} d={det.d_mean:.0f}px a={det.area:.0f}"
    if rel_err is not None:
        label += f" err={rel_err * 100:.1f}%"
    cv2.putText(canvas, label, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.6,
                (255, 255, 255), 2)
    name = f"{stem}__{path_name}_{kind}{idx}.jpg"
    cv2.imwrite(str(OUT / name), canvas)
    return {"crop": name, "image": stem, "path": path_name, "kind": kind,
            "center": [round(float(det.center[0]), 1),
                       round(float(det.center[1]), 1)],
            "d_mean": round(float(det.d_mean), 1),
            "area": float(det.area),
            "center_prob": round(float(center_prob), 3),
            "rel_err": None if rel_err is None else round(float(rel_err), 4)}


def center_prob_of(prob, det):
    cx, cy = int(det.center[0]), int(det.center[1])
    r = 8
    h, w = prob.shape
    patch = prob[max(0, cy - r):min(h, cy + r), max(0, cx - r):min(w, cx + r)]
    return float(patch.mean()) if patch.size else 0.0


def main():
    from vickers_tpu.core.config import IMG_EXTS
    from vickers_tpu.data.manifest import scan, split_manifest
    from vickers_tpu.infer.engine import InferenceEngine
    from vickers_tpu.infer.tiled import TiledEngine

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tiled_ckpt = args[0] if args else "runs/unet_r34_mixed512_r3/final.ckpt"
    lb_dir = args[1] if len(args) > 1 else "runs/unet_r34_512_r3ssl"
    data = "/root/reference/data"
    man = scan(data, require_masks=True, drop_orphans=True)
    full_paths = sorted(str(p) for p in (Path(data) / "images").glob("*")
                        if p.suffix.lower() in IMG_EXTS)
    _, val_man = split_manifest(man, 42, 0.1, full_paths)

    lb = InferenceEngine(model_dir=lb_dir)
    tl = TiledEngine(InferenceEngine(model_dir=tiled_ckpt), tile=512,
                     overlap=64)
    assert lb.ok() and tl.engine.ok()
    OUT.mkdir(parents=True, exist_ok=True)

    cases = []
    for s in val_man.samples:
        img = cv2.imread(s.image, cv2.IMREAD_COLOR)
        msk = cv2.imread(s.mask, cv2.IMREAD_UNCHANGED)
        if msk.ndim == 3:
            msk = msk[:, :, 0]
        want = oracle_detections((msk > 0).astype(np.uint8))
        for path_name, eng in (("letterbox", lb), ("tiled", tl)):
            prob, dets = eng.detect(img)
            if prob.shape != img.shape[:2]:  # letterbox prob is full-res
                prob = cv2.resize(prob, (img.shape[1], img.shape[0]))
            # repeat eval_tiled's greedy matching to identify FPs/errors
            used = set()
            matches = {}
            for o in want:
                best, bi = None, None
                for i, d in enumerate(dets):
                    if i in used:
                        continue
                    dist = np.hypot(d.center[0] - o["center"][0],
                                    d.center[1] - o["center"][1])
                    if dist < 0.5 * o["d_mean"] and (best is None
                                                     or dist < best):
                        best, bi = dist, i
                if bi is not None:
                    used.add(bi)
                    matches[bi] = o
            fp_i = err_i = 0
            for i, d in enumerate(dets):
                cp = center_prob_of(prob, d)
                if i not in used:
                    cases.append(_save_case(img, msk, d, None, s.stem,
                                            path_name, "fp", fp_i, cp))
                    fp_i += 1
                else:
                    o = matches[i]
                    rel = abs(d.d_mean - o["d_mean"]) / o["d_mean"]
                    if rel > 0.02:
                        cases.append(_save_case(img, msk, d, o, s.stem,
                                                path_name, "err", err_i, cp,
                                                rel))
                        err_i += 1
        print(f"{s.stem}: done", flush=True)

    (OUT / "skeleton.json").write_text(json.dumps(cases, indent=1))
    print(f"{len(cases)} audit cases -> {OUT}/")


if __name__ == "__main__":
    main()
