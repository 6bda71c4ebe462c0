"""Bidirectional ``.pth`` state-dict <-> Flax param-tree converter.

The round-trip guarantee demanded by BASELINE.md ("checkpoints round-trip
from best.pth and match mask IoU to within 1e-3") lives here.  Key mapping
(SURVEY §3.4):

  torch (smp.Unet)                          flax (VickersUNet)
  -----------------------------------------------------------------
  encoder.conv1.weight            (OIHW) -> params.encoder.conv1.kernel (HWIO)
  encoder.bn1.{weight,bias}              -> params.encoder.bn1.{scale,bias}
  encoder.bn1.running_{mean,var}         -> batch_stats.encoder.bn1.{mean,var}
  encoder.layerL.B.convN.weight          -> params.encoder.layerL_B.convN.kernel
  encoder.layerL.B.downsample.{0,1}      -> ...layerL_B.downsample_{conv,bn}
  decoder.blocks.I.convN.0.weight        -> params.decoder_blockI.convN.kernel
  decoder.blocks.I.convN.1.*             -> params/batch_stats decoder_blockI.bnN
  segmentation_head.0.{weight,bias}      -> params.head.{kernel,bias}

torch is used read-only for deserialization; no torch code runs on TPU.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def _flax_paths(torch_key: str) -> Tuple[Tuple[str, ...], str, bool]:
    """Map one torch key -> (module path, leaf name, is_batch_stat)."""
    k = torch_key
    m = re.match(r"encoder\.conv1\.weight$", k)
    if m:
        return ("encoder", "conv1"), "kernel", False
    m = re.match(r"encoder\.bn1\.(\w+)$", k)
    if m:
        return _bn_leaf(("encoder", "bn1"), m.group(1))
    m = re.match(r"encoder\.layer(\d)\.(\d+)\.conv(\d)\.weight$", k)
    if m:
        L, B, N = m.groups()
        return ("encoder", f"layer{L}_{B}", f"conv{N}"), "kernel", False
    m = re.match(r"encoder\.layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", k)
    if m:
        L, B, N, leaf = m.groups()
        return _bn_leaf(("encoder", f"layer{L}_{B}", f"bn{N}"), leaf)
    m = re.match(r"encoder\.layer(\d)\.(\d+)\.downsample\.0\.weight$", k)
    if m:
        L, B = m.groups()
        return ("encoder", f"layer{L}_{B}", "downsample_conv"), "kernel", False
    m = re.match(r"encoder\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", k)
    if m:
        L, B, leaf = m.groups()
        return _bn_leaf(("encoder", f"layer{L}_{B}", "downsample_bn"), leaf)
    m = re.match(r"decoder\.blocks\.(\d)\.conv(\d)\.0\.weight$", k)
    if m:
        I, N = m.groups()
        return (f"decoder_block{I}", f"conv{N}"), "kernel", False
    m = re.match(r"decoder\.blocks\.(\d)\.conv(\d)\.1\.(\w+)$", k)
    if m:
        I, N, leaf = m.groups()
        return _bn_leaf((f"decoder_block{I}", f"bn{N}"), leaf)
    m = re.match(r"segmentation_head\.0\.(weight|bias)$", k)
    if m:
        return ("head",), ("kernel" if m.group(1) == "weight" else "bias"), False
    if k.endswith("num_batches_tracked"):
        return (), "", True  # dropped
    raise KeyError(f"unmapped torch key: {torch_key}")


def _bn_leaf(path, torch_leaf):
    table = {
        "weight": ("scale", False),
        "bias": ("bias", False),
        "running_mean": ("mean", True),
        "running_var": ("var", True),
        "num_batches_tracked": ("", True),
    }
    leaf, is_stat = table[torch_leaf]
    return path, leaf, is_stat


def _set(tree: Dict[str, Any], path, leaf, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def torch_state_dict_to_flax(sd: Dict[str, Any]):
    """-> (params, batch_stats) as nested dicts of np.float32 arrays."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                         np.float32)
        path, leaf, is_stat = _flax_paths(k)
        if leaf == "kernel":
            arr = _oihw_to_hwio(arr)
        _set(stats if is_stat else params, path, leaf, arr)
    return params, stats


def flax_to_torch_state_dict(params, batch_stats):
    """Inverse mapping (for exporting checkpoints back to the reference
    format).  Returns a dict of torch tensors."""
    import torch

    sd: Dict[str, Any] = {}

    def emit(torch_key, arr):
        sd[torch_key] = torch.from_numpy(np.ascontiguousarray(arr))

    def walk_bn(prefix, pnode, snode):
        emit(prefix + ".weight", pnode["scale"])
        emit(prefix + ".bias", pnode["bias"])
        emit(prefix + ".running_mean", snode["mean"])
        emit(prefix + ".running_var", snode["var"])
        sd[prefix + ".num_batches_tracked"] = __import__("torch").tensor(0)

    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    emit("encoder.conv1.weight", _hwio_to_oihw(np.asarray(enc_p["conv1"]["kernel"])))
    walk_bn("encoder.bn1", enc_p["bn1"], enc_s["bn1"])
    stage_sizes = {1: 3, 2: 4, 3: 6, 4: 3}
    for L, n in stage_sizes.items():
        for B in range(n):
            mod = f"layer{L}_{B}"
            tpre = f"encoder.layer{L}.{B}"
            for N in (1, 2):
                emit(f"{tpre}.conv{N}.weight",
                     _hwio_to_oihw(np.asarray(enc_p[mod][f"conv{N}"]["kernel"])))
                walk_bn(f"{tpre}.bn{N}", enc_p[mod][f"bn{N}"], enc_s[mod][f"bn{N}"])
            if "downsample_conv" in enc_p[mod]:
                emit(f"{tpre}.downsample.0.weight",
                     _hwio_to_oihw(np.asarray(enc_p[mod]["downsample_conv"]["kernel"])))
                walk_bn(f"{tpre}.downsample.1",
                        enc_p[mod]["downsample_bn"], enc_s[mod]["downsample_bn"])
    for I in range(5):
        mod = f"decoder_block{I}"
        for N in (1, 2):
            emit(f"decoder.blocks.{I}.conv{N}.0.weight",
                 _hwio_to_oihw(np.asarray(params[mod][f"conv{N}"]["kernel"])))
            walk_bn(f"decoder.blocks.{I}.conv{N}.1",
                    params[mod][f"bn{N}"], batch_stats[mod][f"bn{N}"])
    emit("segmentation_head.0.weight", _hwio_to_oihw(np.asarray(params["head"]["kernel"])))
    emit("segmentation_head.0.bias", np.asarray(params["head"]["bias"]))
    return sd


def load_pth_params(path: str):
    """Read a reference checkpoint file and return (params, batch_stats)
    ready for ``VickersUNet.apply`` (the ``weights_only=True`` fallback chain
    mirrors infer_pth_gui.py:35-43)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_state_dict_to_flax(sd)
