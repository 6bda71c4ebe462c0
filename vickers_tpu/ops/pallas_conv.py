"""Pallas int8 conv kernels with fused epilogues (TPU serving fast path).

Why: the XLA int8 path (quant/model.py round 1) ran each conv as
``conv_general_dilated -> int32 HBM -> fused dequant/bias/relu -> bf16 HBM ->
fused requant -> int8``: ~14 bytes of HBM traffic per activation element of
pure glue, which erased the MXU's 2x int8 rate (BENCH.md round 1: int8 tied
bf16 end-to-end despite a 6.5x conv microbench win).  This kernel keeps the
int32 accumulator in VMEM and applies the whole epilogue —
``y*scale + bias -> relu -> [requant]`` — before anything touches HBM, so a
chain conv costs 1 byte in + 1 byte out per element.

Shapes/stride handling:
- stride-1 3x3 convs run directly: grid over (batch, row-tiles), each program
  DMAs an overlapping (TH+2, W+2, Ci) int8 slab into VMEM (halo rows; manual
  async copy because BlockSpec blocks cannot overlap) and accumulates nine
  shifted (TH*W, Ci) x (Ci, Co) int8 matmuls into an int32 VMEM scratch.
- stride-2 3x3 convs are pre-transformed with space-to-depth (factor 2) in
  XLA (a 1-byte/element relayout) and run through the same kernel with a
  9-tap (dy, dx, channel-group) mapping: out[h,w] = sum_t W_t @
  x_s2d[h+dh_t, w+dw_t, g_t*Ci:(g_t+1)*Ci] — identical FLOPs, stride 1.
- 7x7 stem, 1x1 downsamples, pools/upsamples/adds/concats stay in XLA (tiny
  fraction of FLOPs; elementwise glue fuses well there).

The quantization scheme matches quant.model: symmetric per-output-channel
int8 weights, per-tensor int8 activations, f32 epilogue arithmetic.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Taps for a plain 3x3 stride-1 conv on a (H+2, W+2) zero-padded input:
# (row offset, col offset, channel group 0) for kernel position (dy, dx).
_TAPS_3X3 = tuple((dy, dx, 0, dy, dx) for dy in range(3) for dx in range(3))


def _s2d_taps() -> Tuple[Tuple[int, int, int, int, int], ...]:
    """Taps for 3x3 stride-2 expressed on the space-to-depth(2) input.

    Input index 2h'+dy-1 = 2(h'+qy)+ay with (qy, ay) = divmod(dy-1, 2) —
    so kernel position (dy, dx) reads s2d spatial offset (qy+1, qx+1) (the
    +1 from the one-block zero pad) and channel group ay*2+ax."""
    taps = []
    for dy in range(3):
        for dx in range(3):
            qy, ay = divmod(dy - 1, 2)
            qx, ax = divmod(dx - 1, 2)
            taps.append((qy + 1, qx + 1, ay * 2 + ax, dy, dx))
    return tuple(taps)


_TAPS_S2D = _s2d_taps()


def space_to_depth2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), groups ordered (ay, ax)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _epilogue(acc_f32, scale, bias, relu: bool, out_dtype, out_scale_inv):
    y = acc_f32 * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_dtype == jnp.int8:
        y = jnp.clip(jnp.round(y * out_scale_inv), -127, 127)
    return y.astype(out_dtype)


def _make_kernel(taps, th: int, n_th: int, w_out: int, wp_out: int,
                 ci: int, co: int, relu: bool, out_dtype, n_wc: int, wc: int):
    """Kernel body with a software pipeline over row tiles (round 3).

    One program per batch image; the row-tile loop lives INSIDE the kernel
    with double-buffered input slabs AND output tiles, so the HBM DMA of
    tile r+1 (and the write-back of tile r-1) overlap tile r's nine tap
    matmuls — the round-2 version issued one grid program per tile with a
    serial ``copy.start(); copy.wait()``, leaving the MXU idle for the
    whole slab transfer."""

    def kernel(x_hbm, w_ref, scale_ref, bias_ref, osc_ref, out_hbm,
               xbuf, ybuf, acc, sin, sout):
        b = pl.program_id(0)

        def in_dma(slot, r):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(r * th, th + 2), :, :],
                xbuf.at[slot], sin.at[slot])

        def out_dma(slot, r):
            return pltpu.make_async_copy(
                ybuf.at[slot],
                out_hbm.at[b, pl.ds(r * th, th), :, :], sout.at[slot])

        in_dma(0, 0).start()
        for r in range(n_th):                    # static unroll
            cur = r % 2
            if r + 1 < n_th:
                in_dma((r + 1) % 2, r + 1).start()
            in_dma(cur, r).wait()
            if r >= 2:                           # ybuf slot free again?
                out_dma(cur, r - 2).wait()
            for c_i in range(n_wc):
                w0 = c_i * wc
                first = True
                for t, (oy, ox, grp, dy, dx) in enumerate(taps):
                    # full-channel patch: Mosaic only allows lane slices in
                    # 128-multiples, so channel-group selection lives in the
                    # (zero-padded) weight rows instead of a patch slice
                    patch = xbuf[cur, pl.ds(oy, th), pl.ds(w0 + ox, wc), :]
                    wk = w_ref[pl.ds(t * ci, ci), :]
                    prod = jax.lax.dot_general(
                        patch.reshape(th * wc, ci), wk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    if first:
                        acc[:] = prod
                        first = False
                    else:
                        acc[:] = acc[:] + prod
                y = _epilogue(
                    acc[:].astype(jnp.float32).reshape(th, wc, co),
                    scale_ref[:], bias_ref[:], relu, out_dtype, osc_ref[0, 0],
                )
                ybuf[cur, :, pl.ds(w0, wc), :] = y
            out_dma(cur, r).start()
        for r in range(max(0, n_th - 2), n_th):
            out_dma(r % 2, r).wait()

    return kernel


def _pick_tiles(h_out: int, w_out: int, wp: int, wp_out: int, ci_g: int,
                co: int, out_bytes: int):
    """Choose (row-tile, w-chunk) so the double-buffered slabs + output
    tiles + accumulator fit in ~11 MB of VMEM (16 MB/core total) while
    keeping the in-kernel unrolled tile count modest."""
    vmem = 11 * 1024 * 1024
    best = None
    for th in (64, 32, 16, 8, 4):
        if h_out % th and th != h_out:
            continue
        th_eff = min(th, h_out)
        n_th = h_out // th_eff
        if n_th > 32:
            continue
        slab2 = 2 * (th_eff + 2) * wp * ci_g
        ybuf2 = 2 * th_eff * wp_out * co * out_bytes
        for wc in (w_out, 256, 128, 64):
            if wc > w_out or (w_out % wc):
                continue
            acc = th_eff * wc * co * 4
            if slab2 + ybuf2 + acc < vmem:
                # 4-16 tiles give the pipeline something to overlap without
                # blowing up the unrolled kernel body
                penalty = 0 if 4 <= n_th <= 16 else 1
                cand = (penalty, n_th, -th_eff, wc)
                if best is None or cand < best[0]:
                    best = (cand, th_eff, wc)
                break
    if best is None:  # tiny layers: whole image
        return h_out, w_out
    return best[1], best[2]


@functools.partial(
    jax.jit,
    static_argnames=("stride", "relu", "out_dtype_name", "interpret"))
def conv3x3_int8(
    x: jax.Array,                 # (B, H, W, Ci) int8 (NOT padded)
    w: jax.Array,                 # (3, 3, Ci, Co) int8
    scale: jax.Array,             # (Co,) f32 — act_scale * w_scale
    bias: jax.Array,              # (Co,) f32
    out_scale_inv: jax.Array,     # () f32 — 1/next act_scale (int8 out only)
    stride: int = 1,
    relu: bool = True,
    out_dtype_name: str = "bfloat16",
    interpret: bool = False,
) -> jax.Array:
    """3x3 conv, pad=1, int8 compute, fused epilogue.  Returns (B, Ho, Wo, Co)
    in bf16 (dequantized) or int8 (requantized at 1/out_scale_inv)."""
    b, h, w_in, ci = x.shape
    co = w.shape[-1]
    out_dtype = {"bfloat16": jnp.bfloat16, "int8": jnp.int8,
                 "float32": jnp.float32}[out_dtype_name]

    if stride == 2:
        if h % 2 or w_in % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w_in % 2), (0, 0)))
            h, w_in = x.shape[1], x.shape[2]
        xs = space_to_depth2(x)                     # (B, H/2, W/2, 4Ci)
        h_out, w_out = h // 2, w_in // 2
        base = xs
        taps = _TAPS_S2D
        ci_g = 4 * ci
    elif stride == 1:
        h_out, w_out = h, w_in
        # lane alignment: int8 HBM slices need the channel dim to be <=128
        # or a 128-multiple; pad input channels (and kernel rows) with zeros
        if ci > 128 and ci % 128:
            cp = -(-ci // 128) * 128
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - ci)))
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - ci), (0, 0)))
            ci = cp
        base = x
        taps = _TAPS_3X3
        ci_g = ci
    else:
        raise ValueError(f"stride {stride} unsupported")
    # Mosaic requires memref slices (DMA sources, output blocks) to keep the
    # minor dim a 128-multiple and the second-to-minor a 32-multiple for
    # int8; pad width, input channels and output channels accordingly (the
    # padding is zeros and zero weight rows — exact, just wasted lanes).
    wp = -(-(w_out + 2) // 32) * 32
    ci_gp = max(128, -(-ci_g // 128) * 128)
    co_p = max(128, -(-co // 128) * 128)
    xp = jnp.pad(base, ((0, 0), (1, 1), (1, wp - w_out - 1),
                        (0, ci_gp - ci_g)))

    # per-tap weight blocks over the FULL padded channel width: block t
    # holds w[dy_t, dx_t] at rows [grp_t*ci, (grp_t+1)*ci), zeros elsewhere
    wf = jnp.zeros((9 * ci_gp, co_p), w.dtype)
    for t, (oy, ox, grp, dy, dx) in enumerate(taps):
        wf = wf.at[t * ci_gp + grp * ci:t * ci_gp + (grp + 1) * ci,
                   :co].set(w[dy, dx])
    scale = jnp.pad(scale, (0, co_p - co))
    bias = jnp.pad(bias, (0, co_p - co))

    # output width padded to a DMA-aligned multiple; sliced off at the end
    out_bytes = 1 if out_dtype == jnp.int8 else (2 if out_dtype == jnp.bfloat16 else 4)
    wp_out = -(-w_out // 32) * 32
    th, wc = _pick_tiles(h_out, w_out, wp, wp_out, ci_gp, co_p, out_bytes)
    n_th = h_out // th
    n_wc = w_out // wc
    kernel = _make_kernel(taps, th, n_th, w_out, wp_out, ci_gp, co_p, relu,
                          out_dtype, n_wc, wc)

    grid = (b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),          # scale (1, Co)
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias (1, Co)
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # out_scale_inv
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),        # HBM; DMA'd out
        out_shape=jax.ShapeDtypeStruct((b, h_out, wp_out, co_p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, ci_gp), jnp.int8),
            pltpu.VMEM((2, th, wp_out, co_p), out_dtype),
            pltpu.VMEM((th * wc, co_p), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wf, scale.reshape(1, co_p), bias.reshape(1, co_p),
      out_scale_inv.reshape(1, 1))
    return out[:, :, :w_out, :co]


def depth_to_space2(x: jax.Array) -> jax.Array:
    """Inverse of ``space_to_depth2``: (B, h, w, 4C) -> (B, 2h, 2w, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def s2d_conv_weights(w: jax.Array) -> jax.Array:
    """Rewrite a stride-1 3x3 kernel (Ci -> Co) to act on space-to-depth(2)
    inputs: (3, 3, Ci, Co) -> (3, 3, 4Ci, 4Co).

    Output group (a, b) of the s2d tensor holds original pixels
    (2h'+a, 2w'+b); its value needs original input row 2h'+a+dy-1 =
    2(h'+qy)+ay, i.e. s2d offset qy = (a+dy-1-ay)/2 and input group ay with
    dy = 2qy+ay+1-a.  Invalid (dy, dx) combinations keep zero weights, so
    the integer accumulation is bit-identical to the original conv —
    the point is MXU utilization: low-channel high-res tail convs go from
    Ci/Co lanes to 4Ci/4Co at a quarter of the spatial positions."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for qy in (-1, 0, 1):
        for ay in (0, 1):
            for a in (0, 1):
                dy = 2 * qy + ay + 1 - a
                if not 0 <= dy <= 2:
                    continue
                for qx in (-1, 0, 1):
                    for ax in (0, 1):
                        for b in (0, 1):
                            dx = 2 * qx + ax + 1 - b
                            if not 0 <= dx <= 2:
                                continue
                            g_in = ay * 2 + ax
                            g_out = a * 2 + b
                            out = out.at[
                                qy + 1, qx + 1,
                                g_in * ci:(g_in + 1) * ci,
                                g_out * co:(g_out + 1) * co,
                            ].set(w[dy, dx])
    return out
