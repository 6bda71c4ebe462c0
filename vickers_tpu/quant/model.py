"""Int8 post-training-quantized U-Net-R34 forward.

The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197 TOPS), and
the reference's headline metric is inference throughput — so the serving
path gets a PTQ mode:

  * BN folded into conv weight/bias (quant.fold),
  * per-output-channel symmetric int8 weights (absmax / 127),
  * per-tensor symmetric int8 activations with scales calibrated from the
    f32 model on sample data (absmax),
  * int32 accumulation, dequant + bias + ReLU fused by XLA between convs,
  * residual adds, maxpool, upsample and concat in f32.

One functional forward serves two modes: ``calibrate`` runs the folded f32
network recording activation absmax per conv; ``quant_forward`` runs the
int8 network.  Parity with the Flax model is tested (mask IoU vs f32).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vickers_tpu.quant.fold import conv_bn_pairs, fold_bn

_STAGE_SIZES = {1: 3, 2: 4, 3: 6, 4: 3}
_DEC_CH = (256, 128, 64, 32, 16)


class QConv(NamedTuple):
    w_int8: jax.Array     # (H, W, I, O) int8
    w_scale: jax.Array    # (O,) f32
    bias: jax.Array       # (O,) f32
    act_scale: jax.Array  # () f32 — input activation scale


class QParams(NamedTuple):
    convs: Dict[str, QConv]


def _conv(x, w, stride, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn,
        preferred_element_type=jnp.int32 if w.dtype == jnp.int8 else jnp.float32,
    )


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _forward(conv_apply, x):
    """Shared topology; ``conv_apply(name, x, stride, pad, relu)`` does one
    (folded) conv + bias (+ReLU)."""
    f1 = conv_apply("enc.conv1", x, 2, 3, True)
    y = _maxpool(f1)
    feats = []
    for L, n in _STAGE_SIZES.items():
        for B in range(n):
            mod = f"layer{L}_{B}"
            stride = 2 if (L > 1 and B == 0) else 1
            idn = y
            out = conv_apply(f"enc.{mod}.conv1", y, stride, 1, True)
            out = conv_apply(f"enc.{mod}.conv2", out, 1, 1, False)
            if L > 1 and B == 0:
                idn = conv_apply(f"enc.{mod}.down", y, stride, 0, False)
            y = jax.nn.relu(out + idn)
        feats.append(y)
    f2, f3, f4, f5 = feats
    skips = (f4, f3, f2, f1, None)
    y = f5
    for I in range(5):
        y = _up2(y)
        if skips[I] is not None:
            y = jnp.concatenate([y, skips[I]], axis=-1)
        y = conv_apply(f"dec{I}.conv1", y, 1, 1, True)
        y = conv_apply(f"dec{I}.conv2", y, 1, 1, True)
    return conv_apply("head", y, 1, 1, False)


def calibrate(params, batch_stats, calib_imgs_norm: jax.Array
              ) -> Tuple[Dict[str, Tuple[np.ndarray, np.ndarray]], Dict[str, float]]:
    """Run the folded f32 net on normalized calibration images; returns
    (folded weights, per-conv input absmax)."""
    folded = fold_bn(params, batch_stats)
    folded_j = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in folded.items()}
    absmax: Dict[str, jax.Array] = {}

    def conv_apply(name, x, stride, pad, relu):
        w, b = folded_j[name]
        absmax[name] = jnp.max(jnp.abs(x))
        y = _conv(x, w, stride, pad) + b
        return jax.nn.relu(y) if relu else y

    @jax.jit
    def run(x):
        _forward(conv_apply, x)
        return dict(absmax)

    scales = run(calib_imgs_norm)
    return folded, {k: float(v) for k, v in scales.items()}


def quantize(folded, act_absmax: Dict[str, float]) -> QParams:
    convs: Dict[str, QConv] = {}
    for name, (w, b) in folded.items():
        w_absmax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8)
        w_scale = (w_absmax / 127.0).astype(np.float32)
        w_q = np.clip(np.round(w / w_scale[None, None, None, :]), -127, 127
                      ).astype(np.int8)
        a = max(act_absmax[name], 1e-8) / 127.0
        convs[name] = QConv(
            w_int8=jnp.asarray(w_q), w_scale=jnp.asarray(w_scale),
            bias=jnp.asarray(b, jnp.float32), act_scale=jnp.float32(a),
        )
    return QParams(convs=convs)


def quant_forward(qp: QParams, x_norm: jax.Array) -> jax.Array:
    """Normalized images -> logits, int8 conv compute.

    Inter-conv activations are STORED in bf16 (halves the HBM traffic of the
    elementwise glue, where the int8 pipeline was losing its MXU win) but
    the requantize/dequantize arithmetic runs in f32 registers — bf16's
    8-bit mantissa would put the rounding step at 0.5 int levels near the
    clip boundary and measurably hurt mask accuracy."""

    def conv_apply(name, x, stride, pad, relu):
        q = qp.convs[name]
        inv = 1.0 / q.act_scale
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                       ).astype(jnp.int8)
        y = _conv(x_q, q.w_int8, stride, pad)
        y = y.astype(jnp.float32) * (q.act_scale * q.w_scale)[None, None, None, :] \
            + q.bias
        return (jax.nn.relu(y) if relu else y).astype(jnp.bfloat16)

    return _forward(conv_apply, x_norm).astype(jnp.float32)


def folded_forward(folded, x_norm: jax.Array) -> jax.Array:
    """f32 forward with folded BN (for fold-correctness tests)."""
    folded_j = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in folded.items()}

    def conv_apply(name, x, stride, pad, relu):
        w, b = folded_j[name]
        y = _conv(x, w, stride, pad) + b
        return jax.nn.relu(y) if relu else y

    return _forward(conv_apply, x_norm)


# ---------------------------------------------------------------------------
# Fused int8 forward: Pallas conv kernels with in-VMEM epilogues.
# ---------------------------------------------------------------------------

# conv1 -> conv2 chains whose intermediate never needs to exist outside int8
_CHAIN_NEXT = {}
for _L, _n in _STAGE_SIZES.items():
    for _B in range(_n):
        _CHAIN_NEXT[f"enc.layer{_L}_{_B}.conv1"] = f"enc.layer{_L}_{_B}.conv2"
for _I in range(5):
    _CHAIN_NEXT[f"dec{_I}.conv1"] = f"dec{_I}.conv2"


def _requant(x, act_scale):
    """bf16/f32 activation -> int8 at the conv's calibrated scale (one fused
    XLA pass: 2 bytes read, 1 byte written per element)."""
    inv = 1.0 / act_scale
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                    ).astype(jnp.int8)


def quant_forward_fused(qp: QParams, x_norm: jax.Array,
                        interpret: bool = False,
                        s2d_tail: bool = True) -> jax.Array:
    """Normalized images -> logits; 3x3 convs via ops.pallas_conv (int8 MXU,
    dequant+bias+relu+requant fused into the conv epilogue), stem/1x1/head
    and elementwise glue in XLA.  Matches ``quant_forward`` numerically
    (same quantization points) while cutting the per-conv HBM glue from
    ~14 bytes/element to 2-4.  ``s2d_tail`` (default) additionally computes
    dec3/dec4 in the space-to-depth domain — bit-identical integer math at
    several times the MXU fill on the low-channel high-res tail."""
    if s2d_tail:
        return quant_forward_fused_s2d(qp, x_norm, interpret=interpret)
    from vickers_tpu.ops.pallas_conv import conv3x3_int8

    def xla_conv(name, x, stride, pad, relu):
        q = qp.convs[name]
        x_q = x if x.dtype == jnp.int8 else _requant(x, q.act_scale)
        y = _conv(x_q, q.w_int8, stride, pad)
        y = y.astype(jnp.float32) * (q.act_scale * q.w_scale)[None, None, None, :] \
            + q.bias
        return (jax.nn.relu(y) if relu else y).astype(jnp.bfloat16)

    def conv_apply(name, x, stride, pad, relu):
        q = qp.convs[name]
        if pad != 1:                       # 7x7 stem, 1x1 downsamples, odd pads
            return xla_conv(name, x, stride, pad, relu)
        if q.w_int8.shape[:2] != (3, 3) or q.w_int8.shape[-1] == 1:
            return xla_conv(name, x, stride, pad, relu)  # head (Co=1)
        x_q = x if x.dtype == jnp.int8 else _requant(x, q.act_scale)
        nxt = _CHAIN_NEXT.get(name)
        if nxt is not None:
            osi = 1.0 / qp.convs[nxt].act_scale
            return conv3x3_int8(
                x_q, q.w_int8, q.act_scale * q.w_scale, q.bias,
                jnp.asarray(osi, jnp.float32), stride=stride, relu=relu,
                out_dtype_name="int8", interpret=interpret)
        return conv3x3_int8(
            x_q, q.w_int8, q.act_scale * q.w_scale, q.bias,
            jnp.float32(1.0), stride=stride, relu=relu,
            out_dtype_name="bfloat16", interpret=interpret)

    return _forward(conv_apply, x_norm).astype(jnp.float32)


def quant_forward_fused_s2d(qp: QParams, x_norm: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """``quant_forward_fused`` with the decoder tail computed in the
    space-to-depth domain (ops.pallas_conv.s2d_conv_weights).

    dec3/dec4 run 3x3 convs with 16/32-wide channels at 256^2-512^2 — a few
    percent MXU fill that dominates the whole forward.  Rewriting them onto
    s2d inputs (4x channels, 1/4 spatial, rearranged kernels with structural
    zeros) is bit-identical integer arithmetic at several times the MXU
    utilization.  Relayouts (space_to_depth2 / depth_to_space2 / the free
    "up2 == channel-tile" identity) are 1-byte int8 passes."""
    from vickers_tpu.ops.pallas_conv import conv3x3_int8, s2d_conv_weights

    def pconv(name, x, stride, relu, out_name=None, s2d_w=False):
        """Pallas conv; ``out_name`` chains int8 at that conv's act scale."""
        q = qp.convs[name]
        x_q = x if x.dtype == jnp.int8 else _requant(x, q.act_scale)
        w = q.w_int8
        scale = q.act_scale * q.w_scale
        bias = q.bias
        if s2d_w:
            w = s2d_conv_weights(w)
            scale = jnp.tile(scale, 4)
            bias = jnp.tile(bias, 4)
        if out_name is not None:
            osi = 1.0 / qp.convs[out_name].act_scale
            return conv3x3_int8(x_q, w, scale, bias,
                                jnp.asarray(osi, jnp.float32), stride=stride,
                                relu=relu, out_dtype_name="int8",
                                interpret=interpret)
        return conv3x3_int8(x_q, w, scale, bias, jnp.float32(1.0),
                            stride=stride, relu=relu,
                            out_dtype_name="bfloat16", interpret=interpret)

    return _s2d_topology(qp, x_norm, pconv)


def quant_forward_s2d(qp: QParams, x_norm: jax.Array) -> jax.Array:
    """The XLA int8 requant path with the same s2d layer1/decoder-tail
    restructure as the fused variant — no Pallas anywhere.

    Rationale (round 3): XLA's own int8 convs beat the first-cut Pallas
    kernels on-chip (BENCH.md), but they still crawl on the 16/32-channel
    high-resolution tail where <=32 of 128 MXU lanes are live.  The s2d
    weight rewrite fixes the *utilization* problem at the graph level and
    lets XLA keep doing the scheduling it already wins at.  Bit-identical
    integer accumulation (structural-zero weights), same calibration."""
    from vickers_tpu.ops.pallas_conv import s2d_conv_weights

    def xconv(name, x, stride, relu, out_name=None, s2d_w=False):
        q = qp.convs[name]
        x_q = x if x.dtype == jnp.int8 else _requant(x, q.act_scale)
        w = q.w_int8
        scale = q.act_scale * q.w_scale
        bias = q.bias
        if s2d_w:
            w = s2d_conv_weights(w)
            scale = jnp.tile(scale, 4)
            bias = jnp.tile(bias, 4)
        y = _conv(x_q, w, stride, 1)
        y = y.astype(jnp.float32) * scale[None, None, None, :] + bias
        y = jax.nn.relu(y) if relu else y
        if out_name is not None:     # chain: emit int8 at the next act scale
            return _requant(y, qp.convs[out_name].act_scale)
        return y.astype(jnp.bfloat16)

    return _s2d_topology(qp, x_norm, xconv)


def _s2d_topology(qp: QParams, x_norm: jax.Array, pconv) -> jax.Array:
    """Shared s2d-domain network topology; ``pconv(name, x, stride, relu,
    out_name=None, s2d_w=False)`` performs one 3x3 conv (+epilogue)."""
    from vickers_tpu.ops.pallas_conv import depth_to_space2, space_to_depth2

    def xla_conv(name, x, stride, pad, relu):
        q = qp.convs[name]
        x_q = x if x.dtype == jnp.int8 else _requant(x, q.act_scale)
        y = _conv(x_q, q.w_int8, stride, pad)
        y = y.astype(jnp.float32) * (q.act_scale * q.w_scale)[None, None, None, :] \
            + q.bias
        return (jax.nn.relu(y) if relu else y).astype(jnp.bfloat16)

    # ---- encoder ----------------------------------------------------------
    f1 = xla_conv("enc.conv1", x_norm, 2, 3, True)
    y = _maxpool(f1)
    feats = []
    for L, n in _STAGE_SIZES.items():
        if L == 1:
            # layer1's six 64-channel convs at the highest encoder
            # resolution also profit from the s2d domain (~2x MXU fill);
            # the residual add/relu are elementwise, so layout-free.
            ys = space_to_depth2(y)
            for B in range(n):
                mod = f"layer1_{B}"
                idn = ys
                out = pconv(f"enc.{mod}.conv1", ys, 1, True,
                            out_name=f"enc.{mod}.conv2", s2d_w=True)
                out = pconv(f"enc.{mod}.conv2", out, 1, False, s2d_w=True)
                ys = jax.nn.relu(out + idn)
            y = depth_to_space2(ys)
            feats.append(y)
            continue
        for B in range(n):
            mod = f"layer{L}_{B}"
            stride = 2 if (L > 1 and B == 0) else 1
            idn = y
            out = pconv(f"enc.{mod}.conv1", y, stride, True,
                        out_name=f"enc.{mod}.conv2")
            out = pconv(f"enc.{mod}.conv2", out, 1, False)
            if L > 1 and B == 0:
                idn = xla_conv(f"enc.{mod}.down", y, stride, 0, False)
            y = jax.nn.relu(out + idn)
        feats.append(y)
    f2, f3, f4, f5 = feats

    # ---- decoder: dec0-dec2 in the normal domain --------------------------
    y = f5
    for I, skip in ((0, f4), (1, f3), (2, f2)):
        y = _up2(y)
        y = jnp.concatenate([y, skip], axis=-1)
        y = pconv(f"dec{I}.conv1", y, 1, True, out_name=f"dec{I}.conv2")
        y = pconv(f"dec{I}.conv2", y, 1, True)

    # ---- dec3 + dec4 in the s2d domain ------------------------------------
    # dec3 input @256^2 = concat(up2(y@128^2), f1@256^2); in s2d @128^2 each
    # group (a, b) is [y, s2d(f1)_group] because s2d(up2(y)) == y in every
    # group.  Requant both at dec3.conv1's (per-tensor) activation scale.
    a3 = qp.convs["dec3.conv1"].act_scale
    y_q = _requant(y, a3)                                  # (B,128,128,64)
    f1s = space_to_depth2(_requant(f1, a3))                # (B,128,128,256)
    c = f1.shape[-1]
    x_s2d = jnp.concatenate(
        [jnp.concatenate([y_q, f1s[..., g * c:(g + 1) * c]], axis=-1)
         for g in range(4)], axis=-1)                      # (B,128,128,512)
    h3 = pconv("dec3.conv1", x_s2d, 1, True, out_name="dec3.conv2", s2d_w=True)
    # conv2 chains straight into dec4.conv1's scale: up2/d2s/tile only move
    # values, so the epilogue requant commutes with them
    y3 = pconv("dec3.conv2", h3, 1, True, out_name="dec4.conv1", s2d_w=True)
    y3 = depth_to_space2(y3)                               # (B,256,256,32) i8
    x4 = jnp.tile(y3, (1, 1, 1, 4))                        # s2d(up2(.)) free
    h4 = pconv("dec4.conv1", x4, 1, True, out_name="dec4.conv2", s2d_w=True)
    y4 = pconv("dec4.conv2", h4, 1, True, s2d_w=True)      # (B,256,256,64) bf16
    y = depth_to_space2(y4)                                # (B,512,512,16)

    return xla_conv("head", y, 1, 1, False).astype(jnp.float32)
