"""Sub-stage probe of extract_components_runs: where do the batch-256
geometry milliseconds go?

Stages timed separately (chained salt, real masks from the trained model):
  run_tables  — is_start/is_end + two _positions_of_kth searches
  fixpoint    — _run_fixpoint on precomputed tables (N sweeps measured too)
  aggregate   — roots/areas/top-K/extents/clean from precomputed labels
  full        — the whole extract_components_runs

Usage: python scripts/bench_cc_probe.py [--batch 256] [--iters 10]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _load_images, _load_weights
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    from vickers_tpu.core.config import PostprocessConfig
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.ops import components as C
    from vickers_tpu.ops import morphology as M
    from vickers_tpu.ops.image import normalize_imagenet

    B, size = args.batch, 512
    post = PostprocessConfig()
    model = build_model(dtype=jnp.bfloat16)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=size)
    params, stats = _load_weights(params, stats)
    variables = {"params": params, "batch_stats": stats}
    imgs = jax.device_put(_load_images(B, size))

    @jax.jit
    def get_masks(v, u8):
        x = normalize_imagenet(u8.astype(jnp.float32), jnp.bfloat16)
        logits = model.apply(v, x, train=False)[..., 0]
        p = jax.nn.sigmoid(logits).astype(jnp.float32)
        return jax.vmap(lambda q: M.clean_binary(q, post.bin_thresh,
                                                 post.morph_kernel, 1, 1))(p)

    masks = jax.block_until_ready(get_masks(variables, imgs))
    R, blk = post.max_runs_per_row, 16
    print(f"masks ready: {masks.shape}, fg frac "
          f"{float(jnp.mean(masks)):.4f}", flush=True)

    def chained(fn, x0, iters):
        out = fn(x0, jnp.float32(0.0))
        jax.block_until_ready(out)
        float(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x0, out * 1e-12)
        float(out)
        return (time.perf_counter() - t0) / iters

    results = {}

    @jax.jit
    def run_tables(m, salt):
        def one(mm):
            fg = (mm + salt * 1e-9) > 0.5
            x0, x1, rv, sc = C._row_run_tables(fg, R)
            return jnp.sum(x0) + jnp.sum(x1) + jnp.sum(sc[:, -1])
        return jnp.sum(jax.vmap(one)(m)).astype(jnp.float32)

    results["run_tables"] = chained(run_tables, masks, args.iters)

    # precompute tables once for the fixpoint/aggregate probes
    @jax.jit
    def tables(m):
        def one(mm):
            return C._row_run_tables(mm > 0.5, R)
        return jax.vmap(one)(m)

    x0t, x1t, rvt, sct = jax.block_until_ready(tables(masks))
    rows = jnp.arange(size, dtype=jnp.int32)
    init_l = jnp.where(rvt, rows[None, :, None] * size + x1t, -1)

    def fixpoint_fn(max_sweeps):
        @jax.jit
        def fx(init, salt):
            def one(l0, x0, x1, rv):
                lab = C._run_fixpoint(x0, x1, l0 + (salt * 0).astype(l0.dtype),
                                      rv, max_sweeps, block=blk)
                return jnp.sum(lab)
            return jnp.sum(jax.vmap(one)(init, x0t, x1t, rvt)
                           ).astype(jnp.float32)
        return fx

    for sweeps in (1, 2, 16):
        results[f"fixpoint_max{sweeps}"] = chained(
            fixpoint_fn(sweeps), init_l, args.iters)

    @jax.jit
    def labels_of(init):
        def one(l0, x0, x1, rv):
            return C._run_fixpoint(x0, x1, l0, rv, 16, block=blk)
        return jax.vmap(one)(init, x0t, x1t, rvt)

    labs = jax.block_until_ready(labels_of(init_l))

    @jax.jit
    def aggregate(l, salt):
        def one(lab, x0, x1, rv, sc, mm):
            lab = lab + (salt * 0).astype(lab.dtype)
            fg = mm > 0.5
            # replicate the tail of extract_components_runs
            max_cands = 64
            run_area = jnp.where(rv, x1 - x0 + 1, 0).astype(jnp.int32)
            init = jnp.where(rv, jnp.arange(size)[:, None] * size + x1, -1)
            roots = rv & (lab == init)
            ordinal = jnp.cumsum(roots.reshape(-1).astype(jnp.int32)).reshape(
                roots.shape) - 1
            cands = jnp.arange(max_cands, dtype=jnp.int32)
            onehot = roots[:, :, None] & (ordinal[:, :, None] == cands[None, None, :])
            cand_ids = jnp.max(jnp.where(onehot, lab[:, :, None], -1), axis=(0, 1))
            match = (lab[:, :, None] == cand_ids[None, None, :]) & (
                cand_ids[None, None, :] >= 0)
            cand_areas = jnp.sum(jnp.where(match, run_area[:, :, None], 0),
                                 axis=(0, 1))
            return jnp.sum(cand_areas)
        return jnp.sum(jax.vmap(one)(l, x0t, x1t, rvt, sct, masks)
                       ).astype(jnp.float32)

    results["aggregate(no_extents)"] = chained(aggregate, labs, args.iters)

    @jax.jit
    def full(m, salt):
        def one(mm):
            rc = C.extract_components_runs(mm + salt * 1e-9, 200, 8, R, 16)
            return jnp.sum(rc.areas) + jnp.sum(rc.xmin[:, ::64])
        return jnp.sum(jax.vmap(one)(m)).astype(jnp.float32)

    results["full"] = chained(full, masks, args.iters)

    print(f"\nbatch {B}, R={R}, block={blk}:")
    recs = []
    for k, v in results.items():
        print(f"  {k:24s} {v * 1000:8.2f} ms/batch")
        recs.append({"stage": k, "batch": B, "ms": round(v * 1000, 2)})
    if args.json:
        json.dump(recs, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
