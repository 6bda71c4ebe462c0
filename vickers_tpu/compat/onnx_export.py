"""Classic ``unet.onnx`` export without the onnx package.

The reference trainer emits ``unet.onnx`` after training (train.py:702-713)
and both PySide6 GUIs PREFER it over the .pth checkpoints
(ui_infer_rectangle.py:474-487) — so this trainer writes the same artifact
next to best/last.pth.  Neither ``onnx`` nor ``onnxruntime`` exists in this
environment, so the ModelProto is emitted directly in protobuf wire format
(the mirror image of ``compat.onnx_ingest``'s reader):

- opset 13, NCHW float32, input "input" (dynamic batch), output "logits"
  (the reference's ONNX path applies sigmoid itself,
  ui_infer_rectangle.py:551-553);
- the graph spells out the exact smp U-Net topology: Conv/BatchNormalization
  /Relu/MaxPool/Add for the ResNet-34 encoder, Resize(nearest, asymmetric,
  floor — bit-exact with torch's nearest upsample)/Concat/Conv+BN+Relu for
  the decoder, Conv(+bias) head;
- initializer names are the smp state-dict keys ("encoder.conv1.weight",
  "decoder.blocks.0.conv1.0.weight", ...), which is what
  ``onnx_ingest.load_onnx_params`` (and any state-dict-keyed tooling)
  expects — the weights remain recoverable even from tools that only read
  initializers.

Validated in tests by round-tripping through ``onnx_ingest`` and comparing
the re-ingested forward against the source model.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, List

import numpy as np

# ---------------------------------------------------------------------------
# minimal protobuf wire-format emitter
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _varint_field(fnum: int, v: int) -> bytes:
    return _tag(fnum, 0) + _varint(v)


def _str_field(fnum: int, s: str) -> bytes:
    return _len_field(fnum, s.encode("utf-8"))


# ---------------------------------------------------------------------------
# ONNX messages (field numbers per onnx.proto3)
# ---------------------------------------------------------------------------

_DT_FLOAT, _DT_INT64 = 1, 7
_AT_FLOAT, _AT_INT, _AT_STRING, _AT_INTS = 1, 2, 3, 7


def _tensor(name: str, arr: np.ndarray) -> bytes:
    dt = {_np_key(np.float32): _DT_FLOAT, _np_key(np.int64): _DT_INT64}[
        _np_key(arr.dtype.type)]
    out = b"".join(_varint_field(1, int(d)) for d in arr.shape)
    out += _varint_field(2, dt)
    out += _str_field(8, name)
    out += _len_field(9, arr.tobytes())
    return out


def _np_key(t):
    return np.dtype(t).name


def _attr(name: str, value) -> bytes:
    out = _str_field(1, name)
    if isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value)
        out += _varint_field(20, _AT_FLOAT)
    elif isinstance(value, int):
        out += _varint_field(3, value)
        out += _varint_field(20, _AT_INT)
    elif isinstance(value, str):
        out += _len_field(4, value.encode("utf-8"))
        out += _varint_field(20, _AT_STRING)
    elif isinstance(value, (list, tuple)):
        for v in value:
            out += _varint_field(8, int(v))
        out += _varint_field(20, _AT_INTS)
    else:
        raise TypeError(type(value))
    return out


def _node(op: str, inputs: List[str], outputs: List[str], **attrs) -> bytes:
    out = b"".join(_str_field(1, i) for i in inputs)
    out += b"".join(_str_field(2, o) for o in outputs)
    out += _str_field(4, op)
    out += b"".join(_len_field(5, _attr(k, v)) for k, v in attrs.items())
    return out


def _value_info(name: str, dims) -> bytes:
    shape = b""
    for d in dims:
        if isinstance(d, str):
            shape += _len_field(1, _str_field(2, d))       # dim_param
        else:
            shape += _len_field(1, _varint_field(1, int(d)))  # dim_value
    tensor_type = _varint_field(1, _DT_FLOAT) + _len_field(2, shape)
    type_proto = _len_field(1, tensor_type)
    return _str_field(1, name) + _len_field(2, type_proto)


# ---------------------------------------------------------------------------
# the U-Net-R34 graph
# ---------------------------------------------------------------------------

_STAGE_SIZES = {1: 3, 2: 4, 3: 6, 4: 3}


def export_onnx(path: str | Path, params, batch_stats,
                img_size: int = 512) -> None:
    """Write ``unet.onnx`` (logits head) from flax params/batch_stats."""
    from vickers_tpu.compat.convert import flax_to_torch_state_dict

    sd = flax_to_torch_state_dict(params, batch_stats)
    weights: Dict[str, np.ndarray] = {
        k: np.ascontiguousarray(v.numpy(), dtype=np.float32)
        for k, v in sd.items() if not k.endswith("num_batches_tracked")
    }

    nodes: List[bytes] = []
    n_tmp = [0]

    def fresh(tag: str) -> str:
        n_tmp[0] += 1
        return f"{tag}_{n_tmp[0]}"

    def conv(x, wkey, stride, pads, bias_key=None) -> str:
        y = fresh("conv")
        ins = [x, wkey] + ([bias_key] if bias_key else [])
        nodes.append(_node(
            "Conv", ins, [y], dilations=[1, 1], group=1,
            kernel_shape=list(weights[wkey].shape[2:]),
            pads=[pads, pads, pads, pads], strides=[stride, stride]))
        return y

    def bn(x, prefix) -> str:
        y = fresh("bn")
        nodes.append(_node(
            "BatchNormalization",
            [x, f"{prefix}.weight", f"{prefix}.bias",
             f"{prefix}.running_mean", f"{prefix}.running_var"],
            [y], epsilon=1e-5, momentum=0.9))
        return y

    def relu(x) -> str:
        y = fresh("relu")
        nodes.append(_node("Relu", [x], [y]))
        return y

    # encoder stem
    x = conv("input", "encoder.conv1.weight", 2, 3)
    f1 = relu(bn(x, "encoder.bn1"))
    y = fresh("maxpool")
    nodes.append(_node("MaxPool", [f1], [y], kernel_shape=[3, 3],
                       pads=[1, 1, 1, 1], strides=[2, 2]))

    feats = []
    for L, n in _STAGE_SIZES.items():
        for B in range(n):
            pre = f"encoder.layer{L}.{B}"
            stride = 2 if (L > 1 and B == 0) else 1
            idn = y
            out = relu(bn(conv(y, f"{pre}.conv1.weight", stride, 1),
                          f"{pre}.bn1"))
            out = bn(conv(out, f"{pre}.conv2.weight", 1, 1), f"{pre}.bn2")
            if f"{pre}.downsample.0.weight" in weights:
                idn = bn(conv(y, f"{pre}.downsample.0.weight", stride, 0),
                         f"{pre}.downsample.1")
            s = fresh("add")
            nodes.append(_node("Add", [out, idn], [s]))
            y = relu(s)
        feats.append(y)
    f2, f3, f4, f5 = feats

    # decoder
    skips = (f4, f3, f2, f1, None)
    y = f5
    for I in range(5):
        up = fresh("up")
        nodes.append(_node(
            "Resize", [y, "", "up2_scales"], [up], mode="nearest",
            nearest_mode="floor",
            coordinate_transformation_mode="asymmetric"))
        y = up
        if skips[I] is not None:
            c = fresh("cat")
            nodes.append(_node("Concat", [y, skips[I]], [c], axis=1))
            y = c
        for N in (1, 2):
            y = relu(bn(conv(y, f"decoder.blocks.{I}.conv{N}.0.weight", 1, 1),
                        f"decoder.blocks.{I}.conv{N}.1"))

    logits = conv(y, "segmentation_head.0.weight", 1, 1,
                  bias_key="segmentation_head.0.bias")
    nodes.append(_node("Identity", [logits], ["logits"]))

    initializers = [_tensor(k, v) for k, v in weights.items()]
    initializers.append(_tensor(
        "up2_scales", np.asarray([1.0, 1.0, 2.0, 2.0], np.float32)))

    graph = b"".join(_len_field(1, n) for n in nodes)
    graph += _str_field(2, "vickers_unet_r34")
    graph += b"".join(_len_field(5, t) for t in initializers)
    graph += _len_field(11, _value_info(
        "input", ["batch", 3, img_size, img_size]))
    graph += _len_field(12, _value_info(
        "logits", ["batch", 1, img_size, img_size]))

    model = _varint_field(1, 8)                      # ir_version 8
    model += _str_field(2, "vickers_tpu")            # producer_name
    model += _len_field(8, _varint_field(2, 13))     # opset_import {version 13}
    model += _len_field(7, graph)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".onnx.tmp")
    tmp.write_bytes(model)
    tmp.replace(path)
