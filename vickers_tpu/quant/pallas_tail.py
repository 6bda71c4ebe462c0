"""Pallas im2col-in-VMEM int8 conv for the U-Net's high-resolution tail.

Round-4 forward work.  Per-stage truncation timing (FWD_STAGES_r04_int8.json,
scripts/bench_fwd_stages.py) shows the production int8 forward spends 56% of
its 47.9 ms/batch-64 in the decoder tail (dec2 10.4, dec3 9.6, dec4 5.8 ms)
— the low-channel (Cin 16..192), high-resolution (128²..512²) 3x3 convs
where lax.conv's lowering underfills the 128x128 MXU (contraction depth =
Cin < 128) and the 9-tap structure re-reads the activation map nine times.

The fix the round-3 verdict prescribes: im2col *in VMEM*.  Each grid step
DMAs a (TH+2)-row band of the padded input from HBM into VMEM, builds the
(TH*W, 9*Cin) patch matrix with nine static VMEM slices (never touching
HBM — an XLA-level im2col would materialize gigabytes at these sizes),
runs ONE MXU matmul against the (9*Cin, Cout) flattened weights at
contraction depth 9*Cin (e.g. 288 instead of 32), and applies the requant
epilogue (scale+bias+ReLU -> bf16) in registers.

Bit-exactness: integer accumulation is order-independent, so results equal
lax.conv's exactly (asserted in tests/test_pallas_tail.py, interpret mode).

This kernel differs from the round-2/3 fused-conv kernels (measured losers,
deleted — BENCH.md "Pallas go/no-go") in exactly one way: those kept the
9-tap matmul structure (nine K=Cin dots); this one restructures to a single
K=9*Cin dot.  The loss was attributed to "the kernel's 9-tap matmul
structure + lane padding", which is the thing being removed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, sb_ref, o_ref, xb, sem, *, th, w, ci, co, relu):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = pl.multiple_of(i * th, th)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, th + 2)], xb, sem)
    cp.start()
    cp.wait()
    x = xb[:]                                            # (TH+2, W+2, Ci)
    cols = [x[dy:dy + th, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(th * w, 9 * ci)
    acc = jax.lax.dot_general(
        patches, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                # (TH*W, Co)
    y = acc.astype(jnp.float32) * sb_ref[0:1, :] + sb_ref[1:2, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.reshape(th, w, co).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("relu", "th", "interpret"))
def conv3x3_int8_tail(x_q: jax.Array, w_flat: jax.Array, scale: jax.Array,
                      bias: jax.Array, relu: bool = True, th: int = 32,
                      interpret: bool = False) -> jax.Array:
    """3x3 stride-1 int8 conv + requant epilogue, im2col-in-VMEM.

    x_q    (B, H, W, Ci) int8 — UNpadded activations
    w_flat (9*Ci, Co)    int8 — HWIO weights reshaped row-major (dy, dx, ci)
    scale  (Co,) f32 — act_scale * w_scale (dequant multiplier)
    bias   (Co,) f32
    returns (B, H, W, Co) bf16
    """
    b, h, w, ci = x_q.shape
    co = w_flat.shape[1]
    assert h % th == 0, (h, th)
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sb = jnp.stack([scale, bias]).astype(jnp.float32)    # (2, Co)
    grid = (b, h // th)
    kernel = functools.partial(_kernel, th=th, w=w, ci=ci, co=co, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # x stays in HBM
            pl.BlockSpec((9 * ci, co), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, co), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w + 2, ci), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_flat, sb)


def flatten_hwio(w_hwio: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (9*Ci, Co), matching the kernel's (dy, dx, ci)
    patch concatenation order."""
    k1, k2, ci, co = w_hwio.shape
    return w_hwio.reshape(k1 * k2 * ci, co)
