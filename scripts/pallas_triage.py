"""Bisect the relay's Mosaic remote-compile failure (run FIRST in any
session before writing Pallas code; the kernel this originally triaged,
quant/pallas_tail.py, was deleted in round 5 after two rounds of outage —
see MM_POLICY_r05.json; git history retains it).

Three minimal kernels at a dec4.conv1-like shape, compiled one by one:
  A: manual HBM->VMEM DMA + ONE shifted slice dot (no concat)
  B: DMA + 9-slice jnp.concatenate patches + one dot  (the failing design)
  C: DMA + patches assembled into a VMEM scratch ref by store (no concat)
"""
import functools
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, W, CI, CO = 16, 128, 32, 16
B, H = 2, 64


def make(variant):
    def kernel(x_hbm, w_ref, o_ref, xb, sem, pref=None):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH, TH + 2)], xb, sem)
        cp.start()
        cp.wait()
        x = xb[:]
        if variant == "A":
            sl = x[0:TH, 0:W, :].reshape(TH * W, CI)
            acc = jax.lax.dot_general(sl, w_ref[0:CI, :],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
        elif variant == "B":
            cols = [x[dy:dy + TH, dx:dx + W, :]
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(cols, axis=-1).reshape(TH * W, 9 * CI)
            acc = jax.lax.dot_general(patches, w_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
        else:  # C
            for k, (dy, dx) in enumerate([(a, c) for a in range(3)
                                          for c in range(3)]):
                pref[:, k * CI:(k + 1) * CI] = \
                    x[dy:dy + TH, dx:dx + W, :].reshape(TH * W, CI)
            acc = jax.lax.dot_general(pref[:], w_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
        o_ref[0] = acc.reshape(TH, W, CO).astype(jnp.bfloat16)

    scratch = [pltpu.VMEM((TH + 2, W + 2, CI), jnp.int8),
               pltpu.SemaphoreType.DMA]
    if variant == "C":
        scratch.append(pltpu.VMEM((TH * W, 9 * CI), jnp.int8))

    @jax.jit
    def run(xp, wf):
        return pl.pallas_call(
            functools.partial(kernel),
            grid=(B, H // TH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec((9 * CI, CO), lambda bb, ii: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TH, W, CO),
                                   lambda bb, ii: (bb, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.bfloat16),
            scratch_shapes=scratch,
        )(xp, wf)

    return run


rng = np.random.default_rng(0)
xp = jnp.asarray(rng.integers(-127, 128, (B, H + 2, W + 2, CI), np.int8))
wf = jnp.asarray(rng.integers(-127, 128, (9 * CI, CO), np.int8))
for v in ("A", "B", "C"):
    try:
        out = jax.block_until_ready(make(v)(xp, wf))
        print(f"{v}: OK {out.shape} sum={float(jnp.sum(out.astype(jnp.float32))):.1f}",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{v}: FAIL {type(e).__name__}: {msg}", flush=True)
