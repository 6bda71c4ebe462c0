"""Connected components on device, with fixed shapes.

TPU-native replacement for ``cv2.connectedComponentsWithStats(connectivity=8)``
(ui_infer_rectangle.py:331-338).  Sequential union-find does not map to XLA;
instead labels are propagated to a fixpoint by hook + pointer-jumping (see
``label_components``), the SIMD-friendly union-find used by GPU/TPU CC
algorithms.  Labels are the maximum linear index in the component.

Stats (areas) are computed with one scatter-add over the label image, and the
top-``max_components`` components by area are selected entirely on device —
no host sync anywhere in the pipeline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _hook(labels: jax.Array, fg: jax.Array) -> jax.Array:
    """3x3 max-pool of labels restricted to foreground (8-connectivity hop)."""
    p = jax.lax.reduce_window(
        labels, jnp.int32(-1), jax.lax.max, (3, 3), (1, 1), padding=((1, 1), (1, 1))
    )
    return jnp.where(fg, jnp.maximum(labels, p), -1)


def _jump(labels: jax.Array) -> jax.Array:
    """Pointer jumping / path compression: l[p] <- max(l[p], l[l[p]]).

    Label values are pixel indices of same-component pixels, so chasing them
    doubles the propagation distance per step (log-time convergence)."""
    flat = labels.reshape(-1)
    tgt = jnp.take(flat, jnp.clip(flat, 0, flat.shape[0] - 1))
    hop = jnp.where(flat >= 0, tgt, -1)
    return jnp.maximum(flat, hop).reshape(labels.shape)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jax.Array, max_iters: int = 64) -> jax.Array:
    """Label 8-connected components of a binary mask.

    Returns int32 (H, W): -1 for background, otherwise the component id
    (= max linear index over the component, so ids are arbitrary but unique).

    Algorithm: vectorised hook + pointer-jumping label propagation (the
    shared-memory union-find recast for SIMD hardware).  Each iteration is one
    masked 3x3 max-pool ("hook" to the best 8-neighbour) and two gather
    "jumps" (path compression), so the per-step cost is a handful of fused
    VPU ops and convergence is ~O(log diameter).  The while_loop exits as
    soon as a fixpoint is reached; ``max_iters`` is a safety cap (64 covers
    any mask up to far beyond 4k x 4k for realistic shapes).
    """
    h, w = mask.shape
    fg = mask > 0.5
    init = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(fg, init, -1)

    def step(labels):
        l = _hook(labels, fg)
        l = _jump(l)
        l = _jump(l)
        return l

    def cond(state):
        i, _, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, labels, _ = state
        new = step(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(cond, body, (0, step(labels), jnp.bool_(True)))
    return labels


class Components(NamedTuple):
    """Fixed-size component set (K = max_components).

    ``ids``   (K,) int32  — component label ids, -1 for empty slots
    ``areas`` (K,) int32  — pixel areas (0 for empty slots), descending
    ``masks`` (K, H, W) bool — per-component membership
    ``valid`` (K,) bool   — slot has a component with area >= min_area
    ``clean`` (H, W) float32 — union of kept components (reference's
                                ``clean_bin``, 0/1)
    """

    ids: jax.Array
    areas: jax.Array
    masks: jax.Array
    valid: jax.Array
    clean: jax.Array


@functools.partial(jax.jit, static_argnames=("max_components", "max_iters"))
def extract_components(
    mask: jax.Array,
    min_area: jax.Array | int,
    max_components: int = 8,
    max_iters: int = 64,
) -> Components:
    """cv2.connectedComponentsWithStats + area filter + top-K selection
    (ui_infer_rectangle.py:331-338), as one fused device program."""
    h, w = mask.shape
    labels = label_components(mask, max_iters=max_iters)
    fg = labels >= 0

    flat = labels.reshape(-1)
    weight = fg.reshape(-1).astype(jnp.int32)
    safe = jnp.where(flat >= 0, flat, 0)
    areas_all = jnp.zeros((h * w,), jnp.int32).at[safe].add(weight)
    # bin 0 can only hold the (impossible for a max-label) id 0; harmless.

    top_areas, top_ids = jax.lax.top_k(areas_all, max_components)
    valid = top_areas >= jnp.asarray(min_area, jnp.int32)
    ids = jnp.where(valid, top_ids.astype(jnp.int32), -1)

    masks = (labels[None, :, :] == ids[:, None, None]) & valid[:, None, None]
    clean = jnp.any(masks, axis=0).astype(jnp.float32)
    return Components(
        ids=ids,
        areas=jnp.where(valid, top_areas, 0),
        masks=masks,
        valid=valid,
        clean=clean,
    )
