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


class TestFusedInt8:
    """ops.pallas_conv + quant_forward_fused (interpret mode on CPU)."""

    def test_conv3x3_matches_xla_conv(self):
        import jax
        from vickers_tpu.ops.pallas_conv import conv3x3_int8

        rng = np.random.default_rng(0)
        for stride, relu, od in [(1, True, "bfloat16"), (1, False, "int8"),
                                 (2, True, "bfloat16"), (2, True, "int8")]:
            x = rng.integers(-127, 128, (2, 16, 16, 8)).astype(np.int8)
            w = rng.integers(-20, 20, (3, 3, 8, 16)).astype(np.int8)
            scale = (rng.random(16).astype(np.float32) + 0.5) * 1e-3
            bias = rng.standard_normal(16).astype(np.float32) * 0.1
            got = conv3x3_int8(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                jnp.asarray(bias), jnp.float32(9.0), stride=stride,
                relu=relu, out_dtype_name=od, interpret=True)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                jnp.asarray(x, jnp.int32), jnp.asarray(w, jnp.int32),
                (stride, stride), ((1, 1), (1, 1)), dimension_numbers=dn)
            y = np.asarray(y, np.float32) * scale + bias
            if relu:
                y = np.maximum(y, 0)
            if od == "int8":
                want = np.clip(np.round(y * 9.0), -127, 127)
                assert np.max(np.abs(np.asarray(got, np.float32) - want)) <= 1
            else:
                want = y
                tol = 2e-2 * max(1.0, np.abs(want).max())
                assert np.max(np.abs(np.asarray(got, np.float32) - want)) <= tol

    def test_fused_forward_close_to_xla_int8(self, model_and_vars):
        from vickers_tpu.quant.model import quant_forward, quant_forward_fused

        model, params, stats = model_and_vars
        calib = normalize_imagenet(jnp.asarray(_imgs(4, seed=1)))
        folded, absmax = calibrate(params, stats, calib)
        qp = quantize(folded, absmax)
        x = normalize_imagenet(jnp.asarray(_imgs(2, seed=2)))
        ref = np.asarray(quant_forward(qp, x))
        got = np.asarray(quant_forward_fused(qp, x, interpret=True))
        # both are valid int8 networks; they differ only in where rounding
        # happens (bf16 storage vs f32 epilogue), so correlation is the bar
        corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
        assert corr > 0.99, corr

    def test_s2d_weight_transform_exact(self):
        import jax

        from vickers_tpu.ops.pallas_conv import (depth_to_space2,
                                                 s2d_conv_weights,
                                                 space_to_depth2)

        rng = np.random.default_rng(1)
        x = rng.integers(-5, 6, (1, 8, 8, 3)).astype(np.int32)
        w = rng.integers(-3, 4, (3, 3, 3, 5)).astype(np.int32)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)
        ws = s2d_conv_weights(jnp.asarray(w))
        xs = space_to_depth2(jnp.asarray(x))
        dn2 = jax.lax.conv_dimension_numbers(xs.shape, ws.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        got = depth_to_space2(jax.lax.conv_general_dilated(
            xs, ws, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn2))
        assert np.array_equal(np.asarray(ref), np.asarray(got))
        # round-trip of the relayout itself
        assert np.array_equal(np.asarray(depth_to_space2(xs)), x)

    def test_s2d_tail_forward_close(self, model_and_vars):
        from vickers_tpu.quant.model import quant_forward_fused

        model, params, stats = model_and_vars
        calib = normalize_imagenet(jnp.asarray(_imgs(4, seed=1)))
        folded, absmax = calibrate(params, stats, calib)
        qp = quantize(folded, absmax)
        x = normalize_imagenet(jnp.asarray(_imgs(2, seed=2)))
        a = np.asarray(quant_forward_fused(qp, x, interpret=True,
                                           s2d_tail=False))
        b = np.asarray(quant_forward_fused(qp, x, interpret=True,
                                           s2d_tail=True))
        # same int8 network; the s2d tail skips one bf16 storage point
        # (strictly closer to f32), so bit equality is not expected
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995
