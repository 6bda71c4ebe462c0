from vickers_tpu.quant.fold import conv_bn_pairs, fold_bn
from vickers_tpu.quant.model import (
    QConv,
    QParams,
    calibrate,
    folded_forward,
    quant_forward,
    quantize,
)

__all__ = [
    "conv_bn_pairs", "fold_bn",
    "QConv", "QParams", "calibrate", "folded_forward", "quant_forward",
    "quantize",
]
