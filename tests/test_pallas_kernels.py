"""Pallas kernels (interpret mode on CPU) vs the XLA reference ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from vickers_tpu.ops import pallas_kernels as PK
from vickers_tpu.ops.image import normalize_imagenet
from vickers_tpu.ops.morphology import clean_binary


def test_normalize_u8_kernel_matches_xla():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    out = np.asarray(PK.normalize_u8(jnp.asarray(imgs), jnp.float32,
                                     interpret=True))
    ref = np.asarray(normalize_imagenet(jnp.asarray(imgs)))
    assert np.max(np.abs(out - ref)) < 1e-5


def test_threshold_morph_kernel_matches_xla():
    rng = np.random.default_rng(1)
    prob = rng.random((128, 128)).astype(np.float32)
    out = np.asarray(PK.threshold_morph(jnp.asarray(prob), 0.5, interpret=True))
    ref = np.asarray(clean_binary(jnp.asarray(prob), 0.5, 3, 1, 1))
    assert np.array_equal(out > 0.5, ref > 0.5)
