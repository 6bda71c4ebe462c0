"""BatchNorm folding for inference/quantization.

Standard conv+BN fold: with BN(y) = scale * (y - mean)/sqrt(var + eps) + bias
applied to y = conv(x, W), the fused conv is

    W' = W * (scale / sqrt(var + eps))   (per output channel)
    b' = bias - mean * scale / sqrt(var + eps)

The result is a flat {name: (kernel HWIO f32, bias (O,) f32)} dict in the
fixed topology order of the R34-UNet (SURVEY §3.4), consumed by
``quant.model``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_EPS = 1e-5

# (name, conv path, bn path or None) in forward order.  Paths are the
# VickersUNet param-tree module names (compat/convert.py mapping).
_STAGE_SIZES = {1: 3, 2: 4, 3: 6, 4: 3}


def conv_bn_pairs():
    pairs = [("enc.conv1", ("encoder", "conv1"), ("encoder", "bn1"))]
    for L, n in _STAGE_SIZES.items():
        for B in range(n):
            mod = f"layer{L}_{B}"
            pairs.append((f"enc.{mod}.conv1", ("encoder", mod, "conv1"),
                          ("encoder", mod, "bn1")))
            pairs.append((f"enc.{mod}.conv2", ("encoder", mod, "conv2"),
                          ("encoder", mod, "bn2")))
            if L > 1 and B == 0:
                pairs.append((f"enc.{mod}.down", ("encoder", mod, "downsample_conv"),
                              ("encoder", mod, "downsample_bn")))
    for I in range(5):
        mod = f"decoder_block{I}"
        pairs.append((f"dec{I}.conv1", (mod, "conv1"), (mod, "bn1")))
        pairs.append((f"dec{I}.conv2", (mod, "conv2"), (mod, "bn2")))
    pairs.append(("head", ("head",), None))
    return pairs


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def fold_bn(params, batch_stats) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """-> {name: (kernel HWIO f32, bias (O,) f32)} with BN folded in."""
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for name, conv_path, bn_path in conv_bn_pairs():
        conv = _get(params, conv_path)
        k = np.asarray(conv["kernel"], np.float32)
        if bn_path is None:
            b = np.asarray(conv.get("bias", np.zeros(k.shape[-1])), np.float32)
            out[name] = (k, b)
            continue
        bn_p = _get(params, bn_path)
        bn_s = _get(batch_stats, bn_path)
        scale = np.asarray(bn_p["scale"], np.float32)
        bias = np.asarray(bn_p["bias"], np.float32)
        mean = np.asarray(bn_s["mean"], np.float32)
        var = np.asarray(bn_s["var"], np.float32)
        mult = scale / np.sqrt(var + _EPS)
        out[name] = (k * mult[None, None, None, :], bias - mean * mult)
    return out
