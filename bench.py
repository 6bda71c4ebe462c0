"""Benchmark: end-to-end 512x512 image -> HV throughput on one chip.

Measures the full serving path — uint8 batch -> normalize -> U-Net-R34
forward (bf16) -> sigmoid -> threshold/morphology -> connected components ->
min-area-rect -> diagonals -> HV — as one jitted device program,
steady-state, and prints ONE JSON line.

Methodology note: each iteration's input depends on the previous iteration's
output (a scalar "salt" folded into the image bytes) and the final scalar is
fetched to host.  This defeats lazy/async backends that skip executions whose
results are never observed — ``block_until_ready`` alone measures nothing on
the axon relay.

Baseline: the reference's single-stream ONNX GUI inference is ~4.5
512^2-images/sec (226.7 ms for a 3072x2048 image == 512^2 model forward +
CPU geometry; BASELINE.md).  ``vs_baseline`` is the speedup over that.
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    from vickers_tpu.core.config import HVConfig, PostprocessConfig
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.ops.image import normalize_imagenet
    from vickers_tpu.ops.postprocess import postprocess

    batch = 64
    size = 512
    use_int8 = os.environ.get("VICKERS_BENCH_QUANT", "1") not in ("0", "false")
    model = build_model(dtype=jnp.bfloat16)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=size)
    variables = {"params": params, "batch_stats": stats}
    post = PostprocessConfig()
    hv = HVConfig(force_kgf=0.3, um_per_px=2.0)

    qparams = None
    if use_int8:
        from vickers_tpu.quant import calibrate, quantize

        rngq = np.random.default_rng(7)
        calib = normalize_imagenet(jnp.asarray(
            rngq.integers(0, 256, (8, size, size, 3)).astype(np.float32)))
        folded, absmax = calibrate(params, stats, calib)
        qparams = quantize(folded, absmax)

    @jax.jit
    def pipeline(weights, imgs_u8, salt):
        # fold the previous iteration's checksum into the input: builds a
        # serial dependency chain across iterations
        imgs_u8 = imgs_u8 + salt.astype(jnp.uint8)
        x = normalize_imagenet(imgs_u8.astype(jnp.float32), jnp.bfloat16)
        if use_int8:
            from vickers_tpu.quant import quant_forward

            logits = quant_forward(weights, x.astype(jnp.float32))[..., 0]
        else:
            logits = model.apply(weights, x, train=False)[..., 0]
        probs = jax.nn.sigmoid(logits)
        res = jax.vmap(lambda p: postprocess(p, post, hv))(probs)
        d = res.detections
        checksum = jnp.sum(d.d_mean) + jnp.sum(d.valid)
        return d.valid, d.d_mean, d.hv, checksum

    weights = qparams if use_int8 else variables

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, size, size, 3)).astype(np.uint8)
    imgs_dev = jax.device_put(imgs)

    # warmup + compile (fetch forces execution)
    salt = jnp.float32(0.0)
    *_, salt = pipeline(weights, imgs_dev, salt)
    float(salt)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        *_, salt = pipeline(weights, imgs_dev, salt % 3.0)
    final = float(salt)  # host fetch: the whole chain must have executed
    dt = time.perf_counter() - t0
    assert np.isfinite(final)

    ips = batch * iters / dt
    baseline = 4.5  # reference single-stream 512^2-equivalent img/s
    print(json.dumps({
        "metric": "512px_images_per_sec_per_chip_e2e_hv" + ("_int8" if use_int8 else ""),
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 2),
    }))


if __name__ == "__main__":
    main()
