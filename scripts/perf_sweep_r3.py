"""Round-3 on-chip perf sweep: run after training frees the chip.

Times, with the chained-salt methodology on trained weights + real images:
  1. run-CC (sort-free, R=16) at batch 64 and 256
  2. int8 forwards: XLA requant vs pipelined Pallas fused (DMA double buffer)
  3. the full bench pipeline per forward variant
Prints one JSON line per measurement (appended to STAGES_r03.json via
bench_stages.py separately; this is the decision sweep).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _load_images, _load_weights
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from vickers_tpu.core.config import HVConfig, PostprocessConfig
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.ops import morphology as M
    from vickers_tpu.ops.components import extract_components_runs
    from vickers_tpu.ops.image import normalize_imagenet
    from vickers_tpu.ops.postprocess import postprocess
    from vickers_tpu.quant import calibrate, quantize
    from vickers_tpu.quant.model import quant_forward

    iters, size = 20, 512
    post = PostprocessConfig()
    hv = HVConfig(force_kgf=0.3, um_per_px=2.0)
    model = build_model(dtype=jnp.bfloat16)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=size)
    params, stats = _load_weights(params, stats)
    variables = {"params": params, "batch_stats": stats}

    def chained(fn, iters=iters):
        s = jnp.float32(0.0)
        s = fn(s)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(s % 3.0)
        float(s)
        return (time.perf_counter() - t0) / iters * 1000

    def emit(stage, batch, ms):
        print(json.dumps({"stage": stage, "batch": batch, "size": size,
                          "ms_per_batch": round(ms, 2),
                          "images_per_sec": round(batch / ms * 1000, 1)}),
              flush=True)

    for batch in (64, 256):
        imgs = jax.device_put(_load_images(batch, size))

        @jax.jit
        def probs_fn(v, u8):
            x = normalize_imagenet(u8.astype(jnp.float32), jnp.bfloat16)
            return jax.nn.sigmoid(model.apply(v, x, train=False)[..., 0])

        probs = jax.block_until_ready(probs_fn(variables, imgs)).astype(jnp.float32)
        masks = jax.block_until_ready(jax.jit(jax.vmap(
            lambda q: M.clean_binary(q, post.bin_thresh, post.morph_kernel,
                                     1, 1)))(probs))

        @jax.jit
        def cc(m, salt):
            def one(mm):
                rc = extract_components_runs(mm + salt * 1e-9, 200, 8,
                                             post.max_runs_per_row, 16)
                return (jnp.sum(rc.areas) + jnp.sum(rc.xmin[:, ::64])
                        + jnp.sum(rc.overflow))
            return jnp.sum(jax.vmap(one)(m))

        emit("CC sort-free R=16", batch, chained(lambda s: cc(masks, s)))

        @jax.jit
        def geom(p, salt):
            res = jax.vmap(lambda q: postprocess(q + salt * 1e-9, post, hv))(p)
            return jnp.sum(res.detections.d_mean) + jnp.sum(res.detections.valid)

        emit("full geometry half", batch, chained(lambda s: geom(probs, s)))

        if batch == 64:
            calib = normalize_imagenet(
                jnp.asarray(np.asarray(imgs[:8]), jnp.float32))
            folded, absmax = calibrate(params, stats, calib)
            qp = quantize(folded, absmax)

            @jax.jit
            def fwd(u8, salt):
                x = normalize_imagenet(
                    (u8 + salt.astype(jnp.uint8)).astype(jnp.float32))
                return jnp.sum(jax.nn.sigmoid(
                    quant_forward(qp, x)[..., 0])[:, ::64, ::64])

            emit("forward int8 xla", batch, chained(lambda s: fwd(imgs, s)))


if __name__ == "__main__":
    main()
