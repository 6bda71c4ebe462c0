"""Compat entry point: robust-quadrilateral measurement app.

Same public surface as the reference's ``ui_infer_quadrilateral.py``
(constants :36-50, fit_outset_px :433) with the JAX engine underneath.
Fit = robust quadrilateral, BIN_THRESH = 0.45, fit-only outset dilation 2px.
"""

from __future__ import annotations

import functools

from vickers_tpu.core.config import FitMode
from vickers_tpu.apps.ui_common import (  # noqa: F401  (public re-exports)
    Segmenter,
    letterbox_square,
    make_main,
    make_overlay,
    postprocess_minarearect_multi as _pp,
    run_headless,
    unletterbox,
)

MODEL_DIR = "runs/unet_r34_512"
IMG_SIZE = 512
BIN_THRESH = 0.45
MIN_AREA_FRAC = 0.0008
MORPH_KERNEL = 3
OPEN_ITER = 1
CLOSE_ITER = 1
FIT_OUTSET_PX = 2

postprocess_minarearect_multi = functools.partial(
    _pp, bin_thresh=BIN_THRESH, min_area_frac=MIN_AREA_FRAC,
    morph_kernel=MORPH_KERNEL, open_iter=OPEN_ITER, close_iter=CLOSE_ITER,
    fit=FitMode.QUAD, fit_outset_px=FIT_OUTSET_PX,
)

main = make_main(FitMode.QUAD, BIN_THRESH, fit_outset_px=FIT_OUTSET_PX,
                 default_model_dir=MODEL_DIR)

if __name__ == "__main__":
    raise SystemExit(main())
