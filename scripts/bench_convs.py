"""Per-conv diagnostic benchmark: where do the forward milliseconds go?

Times EVERY conv of the serving U-Net in isolation on the chip (chained-salt
methodology, same as bench.py), for several implementations of the same
convolution:

  * ``lax-int8``  — lax.conv_general_dilated s8xs8->s32 (the production path)
  * ``lax-bf16``  — lax.conv in bf16 (the pathological one, per BENCH.md)
  * ``lax-f32``   — lax.conv in f32
  * ``mm-int8``   — im2col-in-XLA: 9 static shifts concat -> ONE dot_general
  * ``mm-bf16``   — same but bf16 x bf16 -> f32
  * ``tap-int8``  — 9 separate 1x1 dots accumulated (tap-sum structure)

Each timing includes the conv's requant epilogue (scale+bias+relu+round) so
implementations are compared as full layer replacements.  Output: a table
sorted by production cost + per-impl totals, JSON to --json.

Usage: python scripts/bench_convs.py [--batch 64] [--iters 10] [--json F]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def conv_table(size=512):
    """(name, H_in, W_in, Cin, Cout, kh, stride, pad) for every conv in the
    serving topology (quant/model.py:_forward)."""
    rows = []
    s = size
    rows.append(("enc.conv1", s, s, 3, 64, 7, 2, 3))
    h = s // 4   # after maxpool
    stage_ch = {1: 64, 2: 128, 3: 256, 4: 512}
    stage_n = {1: 3, 2: 4, 3: 6, 4: 3}
    cin = 64
    for L in (1, 2, 3, 4):
        ch = stage_ch[L]
        for B in range(stage_n[L]):
            stride = 2 if (L > 1 and B == 0) else 1
            rows.append((f"enc.layer{L}_{B}.conv1", h, h, cin if B == 0 else ch,
                         ch, 3, stride, 1))
            if stride == 2:
                h //= 2
            rows.append((f"enc.layer{L}_{B}.conv2", h, h, ch, ch, 3, 1, 1))
            if L > 1 and B == 0:
                rows.append((f"enc.layer{L}_{B}.down", h * 2, h * 2, cin, ch,
                             1, 2, 0))
        cin = ch
    # decoder: (in_after_concat, out) at resolution
    dec = [(512 + 256, 256, s // 16), (256 + 128, 128, s // 8),
           (128 + 64, 64, s // 4), (64 + 64, 32, s // 2), (32, 16, s)]
    for i, (ci, co, hh) in enumerate(dec):
        rows.append((f"dec{i}.conv1", hh, hh, ci, co, 3, 1, 1))
        rows.append((f"dec{i}.conv2", hh, hh, co, co, 3, 1, 1))
    rows.append(("head", s, s, 16, 1, 3, 1, 1))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--impls", default="lax-int8,mm-int8,tap-int8,lax-bf16,mm-bf16")
    ap.add_argument("--only", default=None, help="substring filter on conv name")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    B = args.batch
    impls = args.impls.split(",")
    rows = conv_table(args.size)
    if args.only:
        rows = [r for r in rows if args.only in r[0]]
    rng = np.random.default_rng(0)

    def chained(fn, x0, iters):
        s = jnp.float32(1.0)
        out = fn(x0, s)
        out.block_until_ready()
        float(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(x0, (out % 3.0) + 1.0)
            out = s
        float(out)
        return (time.perf_counter() - t0) / iters

    def make_impl(impl, Hh, Ww, Ci, Co, k, stride, pad):
        w = rng.standard_normal((k, k, Ci, Co), np.float32).astype(np.float32) * 0.05
        wq = np.clip(np.round(w / 0.02), -127, 127).astype(np.int8)
        bias = jnp.asarray(rng.standard_normal(Co), jnp.float32)
        scale = jnp.float32(0.02 * 0.02)
        dn = jax.lax.conv_dimension_numbers((B, Hh, Ww, Ci), (k, k, Ci, Co),
                                            ("NHWC", "HWIO", "NHWC"))

        def epilogue(y):
            y = y.astype(jnp.float32) * scale + bias
            y = jax.nn.relu(y)
            return jnp.sum(y[:, ::32, ::32, 0])

        if impl == "lax-int8":
            wj = jnp.asarray(wq)

            @jax.jit
            def fn(x, salt):
                xq = jnp.clip(jnp.round(x * salt), -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, wj, (stride, stride), ((pad, pad), (pad, pad)),
                    dimension_numbers=dn, preferred_element_type=jnp.int32)
                return epilogue(y)
            return fn
        if impl in ("lax-bf16", "lax-f32"):
            dt = jnp.bfloat16 if impl == "lax-bf16" else jnp.float32
            wj = jnp.asarray(w, dt)

            @jax.jit
            def fn(x, salt):
                xc = (x * salt).astype(dt)
                y = jax.lax.conv_general_dilated(
                    xc, wj, (stride, stride), ((pad, pad), (pad, pad)),
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                return epilogue(y)
            return fn
        if impl in ("mm-int8", "mm-bf16"):
            # im2col in XLA: pad, take k*k static slices, concat on channel,
            # ONE dot_general (B*Ho*Wo, k*k*Ci) x (k*k*Ci, Co)
            dt = jnp.int8 if impl == "mm-int8" else jnp.bfloat16
            acc = jnp.int32 if impl == "mm-int8" else jnp.float32
            wflat = jnp.asarray(
                (wq if impl == "mm-int8" else w.astype(np.float32)).reshape(
                    k * k * Ci, Co), dt)
            Ho = (Hh + 2 * pad - k) // stride + 1

            @jax.jit
            def fn(x, salt):
                if impl == "mm-int8":
                    xc = jnp.clip(jnp.round(x * salt), -127, 127).astype(jnp.int8)
                else:
                    xc = (x * salt).astype(dt)
                xp = jnp.pad(xc, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                cols = [
                    jax.lax.slice(
                        xp, (0, dy, dx, 0),
                        (B, dy + (Ho - 1) * stride + 1,
                         dx + (Ho - 1) * stride + 1, Ci),
                        (1, stride, stride, 1))
                    for dy in range(k) for dx in range(k)
                ]
                patches = jnp.concatenate(cols, axis=-1)    # (B,Ho,Wo,k*k*Ci)
                y = jax.lax.dot_general(
                    patches.reshape(B * Ho * Ho, k * k * Ci), wflat,
                    (((1,), (0,)), ((), ())), preferred_element_type=acc)
                return epilogue(y.reshape(B, Ho, Ho, Co))
            return fn
        if impl == "tap-int8":
            wj = jnp.asarray(wq)
            Ho = (Hh + 2 * pad - k) // stride + 1

            @jax.jit
            def fn(x, salt):
                xq = jnp.clip(jnp.round(x * salt), -127, 127).astype(jnp.int8)
                xp = jnp.pad(xq, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                y = jnp.zeros((B, Ho, Ho, Co), jnp.int32)
                for dy in range(k):
                    for dx in range(k):
                        sl = jax.lax.slice(
                            xp, (0, dy, dx, 0),
                            (B, dy + (Ho - 1) * stride + 1,
                             dx + (Ho - 1) * stride + 1, Ci),
                            (1, stride, stride, 1))
                        y = y + jax.lax.dot_general(
                            sl.reshape(B * Ho * Ho, Ci), wj[dy, dx],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                        ).reshape(B, Ho, Ho, Co)
                return epilogue(y)
            return fn
        raise ValueError(impl)

    results = []
    for name, Hh, Ww, Ci, Co, k, stride, pad in rows:
        Ho = (Hh + 2 * pad - k) // stride + 1
        gflop = 2.0 * B * Ho * Ho * Ci * Co * k * k / 1e9
        x0 = jnp.asarray(rng.standard_normal((B, Hh, Ww, Ci)).astype(np.float32))
        rec = {"conv": name, "B": B, "H": Hh, "Cin": Ci, "Cout": Co,
               "k": k, "stride": stride, "gflop": round(gflop, 1)}
        for impl in impls:
            try:
                fn = make_impl(impl, Hh, Ww, Ci, Co, k, stride, pad)
                t = chained(fn, x0, args.iters)
                rec[impl] = round(t * 1000, 2)
            except Exception as e:
                rec[impl] = f"ERR:{type(e).__name__}"
                print(f"{name} {impl}: {e}", file=sys.stderr)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\ntotals (ms/batch):")
    for impl in impls:
        vals = [r[impl] for r in results if isinstance(r.get(impl), float)]
        print(f"  {impl:10s} {sum(vals):8.2f}  over {len(vals)} convs")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
