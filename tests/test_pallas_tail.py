"""Interpret-mode correctness for the im2col-in-VMEM tail conv kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vickers_tpu.quant.model import _conv
from vickers_tpu.quant.pallas_tail import conv3x3_int8_tail, flatten_hwio


@pytest.mark.parametrize("shape", [(2, 64, 48, 16), (1, 32, 32, 8)])
@pytest.mark.parametrize("relu", [True, False])
def test_tail_conv_bit_exact_vs_lax(shape, relu):
    b, h, w, ci = shape
    co = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (b, h, w, ci), dtype=np.int8))
    wt = jnp.asarray(rng.integers(-127, 128, (3, 3, ci, co), dtype=np.int8))
    scale = jnp.asarray(rng.uniform(1e-4, 1e-2, co), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(co), jnp.float32)

    ref = _conv(x, wt, 1, 1).astype(jnp.float32) * scale + bias
    if relu:
        ref = jnp.maximum(ref, 0.0)
    ref = ref.astype(jnp.bfloat16)

    out = conv3x3_int8_tail(x, flatten_hwio(wt), scale, bias, relu=relu,
                            th=16, interpret=True)
    assert out.shape == ref.shape
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32))
