"""Out-of-split validation of the tiled-mode detection thresholds.

Round-4 verdict weak #7: TILED_ACCEPT_r04's 0-FP/0-miss claim used
``min_rel_area``/``min_center_prob`` values tuned on the same val split the
acceptance was scored on.  Here the 18 val images are split into two
deterministic folds (sorted stems, alternating); for each fold pair the
thresholds are grid-searched on the TUNE fold (against the audited labels,
audits/tiled_r4/audit.json waivers applied) and then scored frozen on the
TEST fold.  Every scored image therefore never influenced the thresholds
that scored it.

The tiled engine runs ONCE per image with both filters disabled; threshold
application is pure host-side filtering of the cached raw detections, so
the grid search costs nothing beyond the 18 forwards.

Usage: VICKERS_CPU=1 python scripts/tune_tiled_thresholds.py [tiled_ckpt]
Writes TILED_ACCEPT_r05.json.
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

if os.environ.get("VICKERS_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import cv2
import numpy as np

from eval_tiled import _match, oracle_detections

REL_AREAS = (0.0, 0.05, 0.10, 0.15, 0.20, 0.30)
CENTER_PROBS = (0.0, 0.5, 0.6, 0.7, 0.75, 0.8, 0.85)


def main():
    from vickers_tpu.core.config import IMG_EXTS
    from vickers_tpu.data.manifest import scan, split_manifest
    from vickers_tpu.infer.engine import InferenceEngine
    from vickers_tpu.infer.tiled import TiledEngine

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tiled_ckpt = args[0] if args else "runs/unet_r34_mixed512_r3/final.ckpt"
    audit = json.load(open("audits/tiled_r4/audit.json"))
    data = "/root/reference/data"
    man = scan(data, require_masks=True, drop_orphans=True)
    full_paths = sorted(str(p) for p in (Path(data) / "images").glob("*")
                        if p.suffix.lower() in IMG_EXTS)
    _, val_man = split_manifest(man, 42, 0.1, full_paths)
    samples = sorted(val_man.samples, key=lambda s: s.stem)

    # raw detections (filters OFF) + per-detection center_prob, once per image
    tl = TiledEngine(InferenceEngine(model_dir=tiled_ckpt), tile=512,
                     overlap=64, min_rel_area=0.0, min_center_prob=0.0)
    assert tl.engine.ok()
    cases = []
    for s in samples:
        img = cv2.imread(s.image, cv2.IMREAD_COLOR)
        msk = cv2.imread(s.mask, cv2.IMREAD_UNCHANGED)
        if msk.ndim == 3:
            msk = msk[:, :, 0]
        want = oracle_detections((msk > 0).astype(np.uint8))
        prob, dets = tl.detect(img)
        cps = [tl._center_prob(prob, d) for d in dets]
        # waive_fp entries: audited real-but-unlabeled indentations
        waivers = [e for e in audit
                   if e["image"] == s.stem and e["kind"] == "waive_fp"
                   and e["path"] in ("tiled", "both")]
        cases.append({"stem": s.stem, "want": want, "dets": dets, "cps": cps,
                      "waivers": waivers})
        print(f"{s.stem[:30]:30s} raw dets {len(dets)}  "
              f"cps {[round(c, 2) for c in cps]}", flush=True)

    def filtered(case, ra, cp):
        dets = [d for d, c in zip(case["dets"], case["cps"]) if c >= cp]
        if dets and ra > 0.0:
            floor = ra * max(d.area for d in dets)
            dets = [d for d in dets if d.area >= floor]
        # drop audited-real unlabeled detections before FP counting
        out = []
        for d in dets:
            hit = any(np.hypot(d.center[0] - w["center"][0],
                               d.center[1] - w["center"][1]) < 0.5 * w["d_mean"]
                      for w in case["waivers"])
            if not hit:
                out.append(d)
        return out

    def score(fold, ra, cp):
        fp = miss = 0
        for case in fold:
            _, m, f = _match(filtered(case, ra, cp), case["want"])
            miss += m
            fp += f
        return fp, miss

    folds = {"A": cases[0::2], "B": cases[1::2]}
    report = {"tiled_ckpt": tiled_ckpt, "grid": {
        "min_rel_area": REL_AREAS, "min_center_prob": CENTER_PROBS},
        "folds": {k: [c["stem"] for c in v] for k, v in folds.items()},
        "rounds": []}
    total_fp = total_miss = 0
    for tune_k, test_k in (("A", "B"), ("B", "A")):
        best = None
        for ra in REL_AREAS:
            for cp in CENTER_PROBS:
                fp, miss = score(folds[tune_k], ra, cp)
                # minimize FP+miss; tie-break toward the least aggressive
                # filter (smallest thresholds) for generalization margin
                key = (fp + miss, ra, cp)
                if best is None or key < best[0]:
                    best = (key, ra, cp, fp, miss)
        _, ra, cp, tfp, tmiss = best
        sfp, smiss = score(folds[test_k], ra, cp)
        total_fp += sfp
        total_miss += smiss
        report["rounds"].append({
            "tuned_on": tune_k, "scored_on": test_k,
            "chosen": {"min_rel_area": ra, "min_center_prob": cp},
            "tune_fp": tfp, "tune_miss": tmiss,
            "test_fp": sfp, "test_miss": smiss})
        print(f"tune {tune_k} -> (ra={ra}, cp={cp}) fp/miss tune "
              f"{tfp}/{tmiss}  TEST {test_k}: fp {sfp} miss {smiss}",
              flush=True)

    # shipped defaults scored on everything, for reference
    dfp, dmiss = score(cases, 0.15, 0.8)
    report["shipped_defaults"] = {"min_rel_area": 0.15,
                                  "min_center_prob": 0.8,
                                  "fp": dfp, "miss": dmiss}
    report["out_of_split_total"] = {"fp": total_fp, "miss": total_miss}
    report["audited_0fp_0miss_out_of_split"] = (total_fp == 0
                                                and total_miss == 0)
    json.dump(report, open("TILED_ACCEPT_r05.json", "w"), indent=1)
    print(json.dumps({"out_of_split_total": report["out_of_split_total"],
                      "holds": report["audited_0fp_0miss_out_of_split"]}))


if __name__ == "__main__":
    main()
