"""Per-stage timing of the PRODUCTION forward by truncation differencing.

Times quant_forward (int8) and the folded bf16/f32 forward truncated at each
stage boundary; consecutive differences give per-stage cost with the exact
production fusion structure (isolated-conv microbenches mislead — XLA fuses
requant epilogues into neighbors).

Usage: python scripts/bench_fwd_stages.py [--batch 64] [--impl int8|bf16|f32]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impl", default="int8", choices=["int8", "bf16", "f32"])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _load_images, _load_weights
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.ops.image import normalize_imagenet
    from vickers_tpu.quant import calibrate, quantize
    from vickers_tpu.quant.model import _STAGE_SIZES, _conv, _maxpool, _up2

    B, size = args.batch, 512
    model = build_model(dtype=jnp.bfloat16)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=size)
    params, stats = _load_weights(params, stats)
    imgs = jax.device_put(_load_images(B, size))

    calib = normalize_imagenet(jnp.asarray(np.asarray(imgs[:8]), jnp.float32))
    folded, absmax = calibrate(params, stats, calib)
    qp = quantize(folded, absmax)
    folded_j = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in folded.items()}

    def conv_apply_int8(name, x, stride, pad, relu):
        q = qp.convs[name]
        inv = 1.0 / q.act_scale
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                       ).astype(jnp.int8)
        y = _conv(x_q, q.w_int8, stride, pad)
        y = y.astype(jnp.float32) * (q.act_scale * q.w_scale)[None, None, None, :] \
            + q.bias
        return (jax.nn.relu(y) if relu else y).astype(jnp.bfloat16)

    def make_conv_apply_float(dt):
        def conv_apply(name, x, stride, pad, relu):
            w, b = folded_j[name]
            y = _conv(x.astype(dt), w.astype(dt), stride, pad)
            y = y.astype(jnp.float32) + b
            return (jax.nn.relu(y) if relu else y).astype(dt)
        return conv_apply

    conv_apply = {"int8": conv_apply_int8,
                  "bf16": make_conv_apply_float(jnp.bfloat16),
                  "f32": make_conv_apply_float(jnp.float32)}[args.impl]

    # stage boundaries: run the topology up to `stop`, checksum what we have
    STAGES = (["conv1"] + [f"layer{L}" for L in (1, 2, 3, 4)]
              + [f"dec{I}" for I in range(5)] + ["head"])

    def forward_until(stop, x):
        f1 = conv_apply("enc.conv1", x, 2, 3, True)
        if stop == "conv1":
            return f1
        y = _maxpool(f1.astype(jnp.float32)).astype(f1.dtype)
        feats = []
        for L, n in _STAGE_SIZES.items():
            for Bk in range(n):
                mod = f"layer{L}_{Bk}"
                stride = 2 if (L > 1 and Bk == 0) else 1
                idn = y
                out = conv_apply(f"enc.{mod}.conv1", y, stride, 1, True)
                out = conv_apply(f"enc.{mod}.conv2", out, 1, 1, False)
                if L > 1 and Bk == 0:
                    idn = conv_apply(f"enc.{mod}.down", y, stride, 0, False)
                y = jax.nn.relu(out.astype(jnp.float32)
                                + idn.astype(jnp.float32)).astype(out.dtype)
            feats.append(y)
            if stop == f"layer{L}":
                return y
        f2, f3, f4, f5 = feats
        skips = (f4, f3, f2, f1, None)
        y = f5
        for I in range(5):
            y = _up2(y)
            if skips[I] is not None:
                y = jnp.concatenate([y, skips[I]], axis=-1)
            y = conv_apply(f"dec{I}.conv1", y, 1, 1, True)
            y = conv_apply(f"dec{I}.conv2", y, 1, 1, True)
            if stop == f"dec{I}":
                return y
        return conv_apply("head", y, 1, 1, False)

    def chained(fn, iters):
        out = fn(imgs, jnp.float32(0.0))
        jax.block_until_ready(out)
        float(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(imgs, out * 1e-12)
        float(out)
        return (time.perf_counter() - t0) / iters

    rows = []
    prev = 0.0
    for stop in STAGES:
        @jax.jit
        def fn(u8, salt, stop=stop):
            x = normalize_imagenet(u8.astype(jnp.float32) + salt)
            y = forward_until(stop, x)
            return jnp.sum(y[:, ::16, ::16].astype(jnp.float32))

        t0 = time.perf_counter()
        t = chained(fn, args.iters)
        rows.append({"until": stop, "impl": args.impl, "batch": B,
                     "cum_ms": round(t * 1000, 2),
                     "stage_ms": round((t - prev) * 1000, 2),
                     "compile_s": round(time.perf_counter() - t0 - t * args.iters, 1)})
        prev = t
        print(json.dumps(rows[-1]), flush=True)

    if args.json:
        json.dump(rows, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
