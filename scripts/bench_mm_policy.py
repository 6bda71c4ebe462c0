"""Whole-forward A/B of im2col-vs-lax conv lowering policies (round 4).

The round-3 verdict's top item: the int8 forward sits at 46.7 ms/batch-64
(~20% of the MXU int8 roofline); the prescribed design is im2col -> one
large matmul per conv.  ``quant.model._conv_mm`` implements it bit-exactly;
this script times the FULL production forward under several per-conv
routing policies (contrast with bench_convs.py, which times convs in
isolation and misses XLA's cross-conv fusion).

Usage: python scripts/bench_mm_policy.py [--batch 64] [--iters 8] [--json F]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--policies", default=None,
                    help="comma-separated subset of policy names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _load_images, _load_weights
    from bench_convs import conv_table
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.ops.image import normalize_imagenet
    from vickers_tpu.quant import calibrate, quantize
    from vickers_tpu.quant.model import ALL_CONVS, quant_forward

    B, size = args.batch, 512
    model = build_model(dtype=jnp.bfloat16)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=size)
    params, stats = _load_weights(params, stats)
    imgs = jax.device_put(_load_images(B, size))

    calib = normalize_imagenet(jnp.asarray(np.asarray(imgs[:8]), jnp.float32))
    folded, absmax = calibrate(params, stats, calib)
    qp = quantize(folded, absmax)

    cin = {name: Ci for name, _, _, Ci, _, _, _, _ in conv_table(size)}
    k3 = {n for n, _, _, _, _, k, _, _ in conv_table(size) if k == 3}

    E = frozenset()
    # name -> (mm_policy,).  Pallas rows were removed round 5 (the tail
    # kernel was deleted after a second round of Mosaic remote-compile
    # failures, MM_POLICY_r05.json); shift9 rows were raced round 5 and
    # the lowering deleted after losing 7x to all-lax
    # (MM_POLICY_r05_race.json).
    POLICIES = {
        "all-lax": (E,),
        "all-mm": (frozenset(ALL_CONVS),),
        "mm-3x3": (frozenset(n for n in ALL_CONVS if n in k3),),
        "mm-ci<=64": (frozenset(n for n in ALL_CONVS
                                if cin.get(n, 999) <= 64 and n in k3),),
        "mm-conv1": (frozenset({"enc.conv1"}),),
    }
    if args.policies:
        keep = args.policies.split(",")
        POLICIES = {k: v for k, v in POLICIES.items() if k in keep}

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
    for name, (mm_pol,) in POLICIES.items():
        @jax.jit
        def fn(u8, salt, mm_pol=mm_pol):
            x = normalize_imagenet(u8.astype(jnp.float32) + salt)
            y = quant_forward(qp, x, mm_policy=mm_pol)
            return jnp.sum(y[:, ::16, ::16].astype(jnp.float32))

        t0 = time.perf_counter()
        try:
            t = chained(fn, args.iters)
        except Exception as e:
            rows.append({"policy": name, "batch": B,
                         "error": f"{type(e).__name__}: {e}"[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        rows.append({"policy": name, "batch": B,
                     "n_mm": len(mm_pol),
                     "ms": round(t * 1000, 2),
                     "compile_s": round(time.perf_counter() - t0
                                        - t * args.iters, 1)})
        print(json.dumps(rows[-1]), flush=True)

    if args.json:
        json.dump(rows, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
