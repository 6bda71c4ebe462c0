"""Compat entry point for the reference's quick Tk viewer (infer_pth_gui.py).

Keeps the public functions (``letterbox_pad``, ``unpad_and_resize_mask``,
``load_model``, ``predict_mask``, ``compose_canvas``, ``main``) with the
reference's exact semantics — corner-anchored letterbox WITH upscaling and
NEAREST mask resize (SURVEY §3.3 parity trap) — but the model is the JAX
engine.  ``main`` is headless-capable: with a display it opens the Tk
file-picker flow; without, it accepts image paths as argv and writes the
triptychs next to the inputs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import List, Tuple

import numpy as np

from vickers_tpu.core.config import InferConfig, LetterboxMode
from vickers_tpu.infer.engine import InferenceEngine

WEIGHTS = "runs/unet_r34_512/best.pth"
IMG_SIZE = 512
THRESH = 0.5


def letterbox_pad(img: np.ndarray, size: int = IMG_SIZE) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Corner-anchored letterbox, upscaling allowed (infer_pth_gui.py:17-24):
    scale = min(size/h, size/w); pads right/bottom only.
    Returns (padded, scale, (new_h, new_w))."""
    import cv2

    h, w = img.shape[:2]
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    rs = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = cv2.copyMakeBorder(rs, 0, size - nh, 0, size - nw,
                             cv2.BORDER_CONSTANT, value=(0, 0, 0))
    return out, scale, (nh, nw)


def unpad_and_resize_mask(mask: np.ndarray, orig_hw: Tuple[int, int],
                          new_hw: Tuple[int, int]) -> np.ndarray:
    """Crop the padded region, NEAREST-resize back (infer_pth_gui.py:26-29)."""
    import cv2

    nh, nw = new_hw
    oh, ow = orig_hw
    crop = mask[:nh, :nw]
    return cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_NEAREST)


def load_model(weights: str = WEIGHTS, device: str = "tpu") -> InferenceEngine:
    """Returns the engine; ``device`` kept for signature compat (ignored —
    placement is JAX's)."""
    cfg = InferConfig(img_size=IMG_SIZE, letterbox=LetterboxMode.CORNER_UPSCALE)
    model_dir = str(Path(weights).parent)
    eng = InferenceEngine(model_dir=model_dir, config=cfg)
    if not eng.ok():
        raise FileNotFoundError(f"no usable checkpoint near {weights}")
    return eng


def predict_mask(engine: InferenceEngine, img_bgr: np.ndarray) -> np.ndarray:
    """-> uint8 0/255 mask at original resolution (infer_pth_gui.py:45-53):
    corner letterbox -> prob -> threshold -> unpad -> NEAREST resize."""
    h, w = img_bgr.shape[:2]
    from vickers_tpu.ops import image as I
    import jax.numpy as jnp

    geom = I.letterbox_geometry(h, w, engine.img_size, LetterboxMode.CORNER_UPSCALE)
    prob = engine.infer_square(img_bgr, LetterboxMode.CORNER_UPSCALE)
    mask512 = (prob >= THRESH).astype(np.uint8) * 255
    return np.asarray(I.unletterbox(jnp.asarray(mask512), geom, nearest=True))


def compose_canvas(img_bgr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """[original | mask | overlay] triptych (infer_pth_gui.py:55-64)."""
    import cv2

    from vickers_tpu.apps.render import make_overlay

    mask3 = cv2.cvtColor(mask, cv2.COLOR_GRAY2BGR)
    overlay = make_overlay(img_bgr, mask.astype(np.float32) / 255.0)
    return np.hstack([img_bgr, mask3, overlay])


def choose_images() -> List[str]:
    from tkinter import Tk, filedialog

    root = Tk()
    root.withdraw()
    paths = filedialog.askopenfilenames(title="choose images")
    root.destroy()
    return list(paths)


def main() -> int:
    import cv2

    # argv[1] overrides the weights path only when it looks like one
    # (infer_pth_gui.py:94 semantics); otherwise argv holds image paths
    weights = WEIGHTS
    if len(sys.argv) > 1 and sys.argv[1].endswith((".pth", ".ckpt")):
        weights = sys.argv[1]
    engine = load_model(weights)

    headless = not os.environ.get("DISPLAY")
    if headless:
        paths = [a for a in sys.argv[1:] if Path(a).is_file()
                 and Path(a).suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp")]
        if not paths:
            print("headless mode: pass image paths as arguments", file=sys.stderr)
            return 2
    else:
        paths = choose_images()

    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            continue
        mask = predict_mask(engine, img)
        canvas = compose_canvas(img, mask)
        if headless:
            out = str(Path(p).with_suffix("")) + "_pred.jpg"
            cv2.imwrite(out, canvas)
            print(f"wrote {out}")
        else:  # pragma: no cover - needs display
            from PIL import Image, ImageTk
            import tkinter as tk

            win = tk.Toplevel()
            win.title(Path(p).name)
            im = Image.fromarray(canvas[:, :, ::-1])
            tkim = ImageTk.PhotoImage(im)
            lbl = tk.Label(win, image=tkim)
            lbl.image = tkim
            lbl.pack()
            win.mainloop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
