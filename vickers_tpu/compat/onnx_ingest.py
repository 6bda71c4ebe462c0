"""Minimal ONNX ingestion: read ``unet.onnx`` initializers without onnx deps.

The reference GUIs PREFER ``unet.onnx`` over the .pth checkpoints
(ui_infer_rectangle.py:474-487, exported at train.py:702-713), so a user may
arrive with only that artifact.  The ``onnx`` package is not available in
this environment, and serving here is jitted XLA anyway — so ingestion only
needs the *weights*: this module parses the protobuf wire format directly
(ModelProto.graph.initializer -> TensorProto{dims, data_type, name,
raw_data}) and maps the initializer names onto the smp state-dict namespace
consumed by ``compat.convert.torch_state_dict_to_flax``.

Classic ``torch.onnx.export`` keeps parameter names ("encoder.conv1.weight");
dynamo exports may mangle them — in that case we raise a clear error telling
the user to export .pth instead (the trainer always writes best/last.pth).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# protobuf wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5

# ONNX TensorProto.DataType -> numpy
_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
           10: np.float16, 11: np.float64}


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == _VARINT:
            v, i = _read_varint(buf, i)
        elif wt == _LEN:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == _I64:
            v = buf[i:i + 8]
            i += 8
        elif wt == _I32:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw = b""
    floats: List[float] = []
    int64s: List[int] = []
    for fnum, wt, v in _fields(buf):
        if fnum == 1:           # dims (repeated int64, varint or packed)
            if wt == _VARINT:
                dims.append(v)
            else:
                i = 0
                while i < len(v):
                    d, i = _read_varint(v, i)
                    dims.append(d)
        elif fnum == 2 and wt == _VARINT:
            dtype = v
        elif fnum == 4:         # float_data (packed)
            floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
        elif fnum == 7:         # int64_data
            if wt == _VARINT:
                int64s.append(v)
            else:
                i = 0
                while i < len(v):
                    d, i = _read_varint(v, i)
                    int64s.append(d)
        elif fnum == 8:
            name = v.decode("utf-8")
        elif fnum == 9:
            raw = v
    np_dtype = _DTYPES.get(dtype)
    if np_dtype is None:
        raise ValueError(f"initializer {name!r}: unsupported data_type {dtype}")
    if raw:
        arr = np.frombuffer(raw, np_dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif int64s:
        arr = np.asarray(int64s, np.int64)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """{initializer name: array} from an .onnx file (wire-format parse)."""
    buf = open(path, "rb").read()
    graph = None
    for fnum, wt, v in _fields(buf):
        if fnum == 7 and wt == _LEN:      # ModelProto.graph
            graph = v
            break
    if graph is None:
        raise ValueError(f"{path}: no graph found (not an ONNX ModelProto?)")
    out: Dict[str, np.ndarray] = {}
    for fnum, wt, v in _fields(graph):
        if fnum == 5 and wt == _LEN:      # GraphProto.initializer
            name, arr = _parse_tensor(v)
            out[name] = arr
    return out


def load_onnx_params(path: str):
    """unet.onnx -> (params, batch_stats) via the .pth key converter.

    Requires state-dict-style initializer names (classic torch.onnx.export);
    raises with guidance otherwise."""
    from vickers_tpu.compat.convert import torch_state_dict_to_flax

    inits = read_onnx_initializers(path)
    if not inits:
        raise ValueError(f"{path}: no initializers")
    # strip common export prefixes and drop non-parameter tensors
    sd = {}
    for name, arr in inits.items():
        key = name
        for pre in ("model.", "unet."):
            if key.startswith(pre):
                key = key[len(pre):]
        sd[key] = arr
    known = [k for k in sd
             if k.startswith(("encoder.", "decoder.", "segmentation_head."))]
    if len(known) < 10:
        sample = list(inits)[:5]
        raise ValueError(
            f"{path}: initializer names do not follow the smp state-dict "
            f"layout (sample: {sample}). This ONNX was likely produced by a "
            f"dynamo export with mangled names — load the run's best.pth / "
            f"last.pth instead (the trainer always writes them), or convert "
            f"the ONNX to a state-dict .pth with torch and onnx2torch."
        )
    return torch_state_dict_to_flax({k: sd[k] for k in known})
