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


def _conv_mm(x, w, stride, pad):
    """Same conv as ``_conv`` but as explicit im2col -> ONE dot_general.

    k*k static slices of the padded input concatenate on the channel axis,
    so the contraction runs at K = k*k*Cin instead of Cin — on the v5e MXU
    (128x128 systolic array) this fills the K dimension for the low-channel
    convs where ``lax.conv``'s lowering underutilizes the array.  Integer
    accumulation is order-independent, so results are bit-exact vs ``_conv``
    (asserted in tests/test_quant.py).
    """
    b, h, ww, ci = x.shape
    k, _, _, co = w.shape
    ho = (h + 2 * pad - k) // stride + 1
    wo = (ww + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [
        jax.lax.slice(
            xp, (0, dy, dx, 0),
            (b, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, ci),
            (1, stride, stride, 1))
        for dy in range(k) for dx in range(k)
    ]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * ho * wo, k * k * ci)
    acc = jnp.int32 if w.dtype == jnp.int8 else jnp.float32
    y = jax.lax.dot_general(
        patches, w.reshape(k * k * ci, co), (((1,), (0,)), ((), ())),
        preferred_element_type=acc)
    return y.reshape(b, ho, wo, co)


def _all_conv_names():
    names = ["enc.conv1", "head"]
    for L, n in _STAGE_SIZES.items():
        for B in range(n):
            names += [f"enc.layer{L}_{B}.conv1", f"enc.layer{L}_{B}.conv2"]
            if L > 1 and B == 0:
                names.append(f"enc.layer{L}_{B}.down")
    for I in range(5):
        names += [f"dec{I}.conv1", f"dec{I}.conv2"]
    return tuple(names)


ALL_CONVS = _all_conv_names()

# Conv names routed through the im2col/matmul lowering instead of lax.conv,
# chosen by on-chip measurement (scripts/bench_fwd_stages.py /
# bench_convs.py, FWD_STAGES_r04_*.json).  Default empty = all lax.
MM_POLICY: frozenset = frozenset()


def _conv_for(name, impl_policy):
    return _conv_mm if (impl_policy and name in impl_policy) else _conv


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


def quant_forward(qp: QParams, x_norm: jax.Array,
                  mm_policy: frozenset | None = None) -> jax.Array:
    """Normalized images -> logits, int8 conv compute.

    Inter-conv activations are STORED in bf16 (halves the HBM traffic of the
    elementwise glue, where the int8 pipeline was losing its MXU win) but
    the requantize/dequantize arithmetic runs in f32 registers — bf16's
    8-bit mantissa would put the rounding step at 0.5 int levels near the
    clip boundary and measurably hurt mask accuracy.

    ``mm_policy`` (default MM_POLICY) names convs lowered via im2col+matmul
    (``_conv_mm``) instead of lax.conv.  Both lowerings are bit-exact;
    routing is chosen by measurement."""
    policy = MM_POLICY if mm_policy is None else mm_policy

    def conv_apply(name, x, stride, pad, relu):
        q = qp.convs[name]
        inv = 1.0 / q.act_scale
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                       ).astype(jnp.int8)
        y = _conv_for(name, policy)(x_q, q.w_int8, stride, pad)
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


# Round-3 note: two further int8 forward variants were built and measured
# on-chip, then deleted per the win-or-delete rule (BENCH.md records the
# numbers): Pallas fused-epilogue convs (serial-DMA 110 ms -> pipelined
# double-buffered DMA 106 ms per batch-64, vs 46.7 ms for this XLA path)
# and an XLA space-to-depth low-channel-tail restructure (60.3 ms).  The
# XLA requant path above is the one production int8 forward.
#
# Round-5 notes, same win-or-delete rule:
# - the round-4 im2col-in-VMEM Pallas decoder-tail kernel
#   (quant/pallas_tail.py, interpret-verified bit-exact) was deleted — the
#   relay's remote Mosaic compiler rejected every pallas_call for a second
#   consecutive round (MM_POLICY_r05.json), so it could never be measured.
# - a 9-shifted-matmul 3x3 lowering (_conv_shift9: per-tap 1x1 dots, no
#   im2col patch blowup) was built, tested bit-exact, raced same-process
#   and deleted: shift9-tail 365.7 / shift9-dec34 330.8 / shift9-3x3 541.1
#   ms/batch-64 vs all-lax 51.6 (MM_POLICY_r05_race.json) — XLA's native
#   conv lowering wins every routing tried on this backend.
# Git history retains both implementations.
