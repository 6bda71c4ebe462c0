"""Command-line interface: train / infer / plot / bench / devices.

The reference has no CLI framework (config is a dict literal at the bottom
of train.py, constants at the top of each GUI script — SURVEY L8); this is
the framework's single typed front door.

  python -m vickers_tpu.apps.cli train   --data data --out runs/unet_r34_512
  python -m vickers_tpu.apps.cli infer   --model-dir runs/unet_r34_512 IMG...
  python -m vickers_tpu.apps.cli plot    runs/unet_r34_512 --smooth 5
  python -m vickers_tpu.apps.cli bench
  python -m vickers_tpu.apps.cli devices
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
from pathlib import Path


def _add_train(sub):
    p = sub.add_parser("train", help="train U-Net-R34 with the BCE+Dice recipe")
    p.add_argument("--data", default="data")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--encoder", default="resnet34")
    p.add_argument("--encoder-weights", default="imagenet",
                   help="'imagenet', 'none', or a path to a .pth")
    p.add_argument("--val-ratio", type=float, default=0.1)
    p.add_argument("--out", default="runs/unet_r34_512")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dump-all-val", action="store_true", default=True)
    p.add_argument("--no-dump-all-val", dest="dump_all_val", action="store_false")
    p.add_argument("--dump-all-train", action="store_true", default=False)
    p.add_argument("--early-stop-patience", type=int, default=None)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--resume", action="store_true",
                   help="continue from <out>/last.ckpt (full train state)")
    p.add_argument("--mode", choices=["letterbox", "crop", "mixed"],
                   default="letterbox",
                   help="letterbox = reference recipe; crop = native-"
                        "resolution random crops (for tiled inference)")
    p.add_argument("--steps-per-epoch", type=int, default=40,
                   help="crop mode: sampled batches per epoch")
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="EMA of params+BN stats; validated/exported when >0")
    p.add_argument("--scale-p", type=float, default=0.0,
                   help="probability of random scale jitter (aug extension)")
    p.add_argument("--scale-limit", type=float, default=0.0,
                   help="scale jitter range: scale in [1-s, 1+s]")


def _add_ssl(sub):
    p = sub.add_parser(
        "ssl-pretrain",
        help="self-supervised encoder pre-training on native-res crops "
             "(writes <out>/ssl_warmstart.pth for train --encoder-weights)")
    p.add_argument("--data", default="data")
    p.add_argument("--out", default="runs/ssl")
    p.add_argument("--variant", choices=["mask", "noise"], default="mask")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--mask-block", type=int, default=32)
    p.add_argument("--mask-ratio", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=42)


def _cmd_ssl(args) -> int:
    from vickers_tpu.train.ssl import run_ssl_pretrain

    run_ssl_pretrain(args.data, args.out, variant=args.variant,
                     steps=args.steps, batch=args.batch, lr=args.lr,
                     tile=args.tile, block=args.mask_block,
                     ratio=args.mask_ratio, seed=args.seed)
    return 0


def _add_infer(sub):
    p = sub.add_parser("infer", help="run inference + geometry on images")
    p.add_argument("images", nargs="+")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--fit", choices=["rect", "quad"], default="rect")
    p.add_argument("--tiled", action="store_true",
                   help="full-resolution tiled inference with overlap blending")
    p.add_argument("--force-kgf", type=float, default=1.0)
    p.add_argument("--um-per-px", type=float, default=1.0)
    p.add_argument("--save-vis", default=None,
                   help="directory for annotated output images")
    p.add_argument("--json", dest="as_json", action="store_true")
    p.add_argument("--batched", action="store_true",
                   help="serving mode: decode+letterbox all images (native "
                        "C++ loader when built), run one batched TPU pass")
    p.add_argument("--int8", action="store_true",
                   help="with --batched: int8-quantized forward (PTQ, "
                        "calibrated on the inputs)")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="full-precision forward dtype (mirrors cli train). "
                        "float32 is the default serving path: the relay's "
                        "bf16 conv lowering is currently ~10x slower "
                        "(BENCH.md); bf16 stays opt-in until that is fixed")


def _add_plot(sub):
    p = sub.add_parser("plot", help="plot history.json curves")
    p.add_argument("path", help="history.json or a run directory")
    p.add_argument("--smooth", type=int, default=1)
    p.add_argument("--csv", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--show", action="store_true")


def _cmd_train(args) -> int:
    from vickers_tpu.core.config import ModelConfig, TrainConfig
    from vickers_tpu.train.loop import run

    from vickers_tpu.core.config import AugmentConfig

    ew = None if args.encoder_weights in ("none", "None", "") else args.encoder_weights
    cfg = TrainConfig(
        data=args.data, img_size=args.img_size, epochs=args.epochs,
        batch=args.batch, lr=args.lr, encoder=args.encoder,
        encoder_weights=ew, val_ratio=args.val_ratio, out=args.out,
        seed=args.seed, dump_all_val=args.dump_all_val,
        dump_all_train=args.dump_all_train,
        early_stop_patience=args.early_stop_patience,
        model=ModelConfig(encoder=args.encoder, compute_dtype=args.compute_dtype),
        resume=args.resume, checkpoint_every=args.checkpoint_every,
        profile_dir=args.profile_dir, ema_decay=args.ema_decay,
        augment=AugmentConfig(scale_p=args.scale_p,
                              scale_limit=args.scale_limit),
    )
    if args.mode == "crop":
        from vickers_tpu.train.crops import run_crop_training

        run_crop_training(cfg, steps_per_epoch=args.steps_per_epoch)
    elif args.mode == "mixed":
        from vickers_tpu.train.mixed import run_mixed_training

        run_mixed_training(cfg)
    else:
        run(cfg)
    return 0


def _cmd_infer(args) -> int:
    import cv2
    import numpy as np

    from vickers_tpu.core.config import (
        HVConfig,
        InferConfig,
        quad_compat_postprocess,
        rect_compat_postprocess,
    )
    from vickers_tpu.infer.engine import InferenceEngine
    from vickers_tpu.infer.tiled import TiledEngine

    post = rect_compat_postprocess() if args.fit == "rect" else quad_compat_postprocess()
    cfg = InferConfig(
        img_size=args.img_size, post=post,
        hv=HVConfig(force_kgf=args.force_kgf, um_per_px=args.um_per_px),
    )
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    engine = InferenceEngine(model_dir=args.model_dir, config=cfg, dtype=dtype)
    if not engine.ok():
        print(f"error: no usable checkpoint under {args.model_dir}", file=sys.stderr)
        return 2
    tiled = TiledEngine(engine) if args.tiled else None

    if args.batched:
        return _infer_batched(args, engine)

    results = []
    for path in args.images:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            print(f"warning: cannot read {path}", file=sys.stderr)
            continue
        if tiled is not None:
            prob, dets = tiled.detect(img)
        else:
            prob, dets = engine.detect(img)
        rec = {
            "image": path,
            "detections": [
                {
                    "label": d.label, "area": d.area,
                    "box": d.box.tolist(), "center": list(d.center),
                    "d1": d.d1, "d2": d.d2, "d_mean": d.d_mean,
                    "hv": d.hv, "quality": d.quality,
                }
                for d in dets
            ],
        }
        results.append(rec)
        if not args.as_json:
            print(f"{path}: {len(dets)} detection(s)")
            for d in dets:
                print(f"  #{d.label} area={d.area:.0f}px^2 d1={d.d1:.1f} "
                      f"d2={d.d2:.1f} d_mean={d.d_mean:.1f}px HV={d.hv:.1f}")
        if args.save_vis:
            from vickers_tpu.apps.render import draw_detections

            out_dir = Path(args.save_vis)
            out_dir.mkdir(parents=True, exist_ok=True)
            vis = draw_detections(img, dets)
            cv2.imwrite(str(out_dir / (Path(path).stem + "_det.jpg")), vis)
    if args.as_json:
        print(json.dumps(results))
    return 0


def _infer_batched(args, engine) -> int:
    """Directory-scale serving: batch-decode (C++ loader), one jitted TPU
    pass per chunk, detections rescaled per image."""
    import numpy as np

    from vickers_tpu import native
    from vickers_tpu.core.config import LetterboxMode
    from vickers_tpu.data.loader import _decode_image_letterboxed
    from vickers_tpu.infer.engine import _rescale_detections
    from vickers_tpu.ops.image import letterbox_geometry
    from vickers_tpu.ops.postprocess import Detections

    size = args.img_size
    dec = native.decoder()
    paths = list(args.images)
    imgs = np.zeros((len(paths), size, size, 3), np.uint8)
    hw = np.zeros((len(paths), 2), np.int32)
    if dec is not None:
        imgs, hw, failures = dec.decode_batch(paths, size, "center_upscale",
                                              threads=8)
        if failures:
            print(f"warning: {failures} image(s) failed native decode",
                  file=sys.stderr)
    else:
        for i, p in enumerate(paths):
            imgs[i], (hw[i, 0], hw[i, 1]) = _decode_image_letterboxed(p, size)

    if args.int8:
        engine.enable_quant(imgs[: min(8, len(paths))])
    probs, res = engine.detect_batch(imgs, quantized=args.int8)
    # Honor the exactness contract (infer/engine.py detect_batch docstring):
    # images whose run-table bound overflowed may have dropped detections —
    # replay just their geometry through the exact pixel labeler.
    overflow = np.asarray(res.overflow)
    results = []
    for i, p in enumerate(paths):
        geom = letterbox_geometry(int(hw[i, 0]), int(hw[i, 1]), size,
                                  LetterboxMode.CENTER_UPSCALE)
        if bool(overflow[i]):
            import dataclasses as _dc

            import jax.numpy as jnp

            from vickers_tpu.ops.postprocess import postprocess

            exact = _dc.replace(engine.cfg.post, cc_impl="pixel")
            res_i = postprocess(jnp.asarray(probs[i]), exact, engine.cfg.hv)
            det_i = res_i.detections
            print(f"note: {p}: run-table overflow, re-ran exact pixel "
                  f"labeler", file=sys.stderr)
        else:
            det_i = Detections(*[x[i] for x in res.detections])
        dets = _rescale_detections(det_i, geom, engine.cfg.hv)
        results.append({"image": p, "detections": [
            {"label": d.label, "area": d.area, "center": list(d.center),
             "d1": d.d1, "d2": d.d2, "d_mean": d.d_mean, "hv": d.hv}
            for d in dets]})
        if not args.as_json:
            print(f"{p}: {len(dets)} detection(s)" + "".join(
                f"\n  #{d.label} d_mean={d.d_mean:.1f}px HV={d.hv:.1f}"
                for d in dets))
    if args.as_json:
        print(json.dumps(results))
    return 0


def _cmd_plot(args) -> int:
    from vickers_tpu.utils.history import load_history, plot_curves, save_csv

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


def _cmd_bench(_args) -> int:
    import bench

    bench.main()
    return 0


def _cmd_devices(_args) -> int:
    """gpu_check.py equivalent: TPU topology report."""
    import jax

    print(f"backend: {jax.default_backend()}")
    print(f"device_count: {jax.device_count()}")
    for d in jax.devices():
        print(f"  {d.id}: {d.device_kind} (process {d.process_index})")
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser(prog="vickers-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_train(sub)
    _add_ssl(sub)
    _add_infer(sub)
    _add_plot(sub)
    sub.add_parser("bench", help="run the throughput benchmark")
    sub.add_parser("devices", help="report the device topology")
    args = ap.parse_args(argv)
    return {
        "train": _cmd_train, "ssl-pretrain": _cmd_ssl, "infer": _cmd_infer,
        "plot": _cmd_plot, "bench": _cmd_bench, "devices": _cmd_devices,
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
