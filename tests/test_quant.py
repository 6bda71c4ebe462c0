"""Quantization subsystem: BN fold correctness + int8 PTQ accuracy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vickers_tpu.models.unet import VickersUNet, build_model, init_model
from vickers_tpu.ops.image import normalize_imagenet
from vickers_tpu.quant import calibrate, fold_bn, folded_forward, quant_forward, quantize


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model(dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=64)
    # randomize BN stats so folding is non-trivial
    stats = jax.tree.map(
        lambda x: x + 0.3 * jax.random.uniform(jax.random.PRNGKey(1), x.shape),
        stats)
    return model, params, stats


def _imgs(n=2, s=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, s, s, 3)).astype(np.uint8)


def test_fold_bn_matches_flax_eval(model_and_vars):
    model, params, stats = model_and_vars
    x = normalize_imagenet(jnp.asarray(_imgs()))
    ref = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    folded = fold_bn(params, stats)
    out = folded_forward(folded, x)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-4


def test_quantized_forward_close_to_f32(model_and_vars):
    model, params, stats = model_and_vars
    calib = normalize_imagenet(jnp.asarray(_imgs(4, seed=1)))
    folded, absmax = calibrate(params, stats, calib)
    qp = quantize(folded, absmax)

    x = normalize_imagenet(jnp.asarray(_imgs(2, seed=2)))
    ref = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 x, train=False))
    out = np.asarray(jax.jit(quant_forward)(qp, x))
    # random-init logits hug the threshold, so raw mask IoU is degenerate
    # (a trained checkpoint measures 0.9985); require agreement wherever the
    # f32 model is confident
    thr = np.quantile(np.abs(ref), 0.75)
    confident = np.abs(ref) > thr
    agree = ((out > 0) == (ref > 0))[confident].mean()
    assert agree > 0.95, agree
    # and logits are in the same ballpark
    assert np.abs(out - ref).mean() < 0.25 * (np.abs(ref).mean() + 1e-3)


def test_quant_weight_ranges(model_and_vars):
    _, params, stats = model_and_vars
    folded = fold_bn(params, stats)
    qp = quantize(folded, {k: 1.0 for k in folded})
    for name, q in qp.convs.items():
        w = np.asarray(q.w_int8)
        assert w.dtype == np.int8
        assert w.min() >= -127 and w.max() <= 127
        # at least one channel saturates (absmax scaling)
        assert np.abs(w).max() == 127, name


def test_engine_quantized_detect_batch(model_and_vars):
    from vickers_tpu.core.config import InferConfig
    from vickers_tpu.infer.engine import InferenceEngine

    model, params, stats = model_and_vars
    eng = InferenceEngine(config=InferConfig(img_size=64), params=params,
                          batch_stats=stats, dtype=jnp.float32)
    imgs = _imgs(4, seed=5)
    eng.enable_quant(imgs)
    probs_q, res_q = eng.detect_batch(imgs, quantized=True)
    probs_f, res_f = eng.detect_batch(imgs)
    pq, pf = np.asarray(probs_q), np.asarray(probs_f)
    thr = np.quantile(np.abs(pf - 0.5), 0.75)
    confident = np.abs(pf - 0.5) > thr
    agree = ((pq > 0.5) == (pf > 0.5))[confident].mean()
    assert agree > 0.95, agree


def test_detect_batch_quant_requires_calibration(model_and_vars):
    from vickers_tpu.core.config import InferConfig
    from vickers_tpu.infer.engine import InferenceEngine

    model, params, stats = model_and_vars
    eng = InferenceEngine(config=InferConfig(img_size=64), params=params,
                          batch_stats=stats, dtype=jnp.float32)
    with pytest.raises(RuntimeError):
        eng.detect_batch(_imgs(1), quantized=True)


def test_mm_policy_bit_exact(model_and_vars):
    """The im2col/matmul conv lowering (_conv_mm) is the SAME integer
    computation as lax.conv — int32 accumulation is order-independent —
    so quant_forward must be bit-exact under any mm_policy."""
    from vickers_tpu.quant.model import ALL_CONVS, quant_forward as qf

    model, params, stats = model_and_vars
    calib = normalize_imagenet(jnp.asarray(_imgs(4, seed=1)))
    folded, absmax = calibrate(params, stats, calib)
    qp = quantize(folded, absmax)
    x = normalize_imagenet(jnp.asarray(_imgs(2, seed=3)))
    base = np.asarray(qf(qp, x, mm_policy=frozenset()))
    allmm = np.asarray(qf(qp, x, mm_policy=frozenset(ALL_CONVS)))
    assert np.array_equal(base, allmm)

