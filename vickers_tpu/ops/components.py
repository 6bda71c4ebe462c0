"""Connected components on device, with fixed shapes.

TPU-native replacement for ``cv2.connectedComponentsWithStats(connectivity=8)``
(ui_infer_rectangle.py:331-338).  Sequential union-find does not map to XLA;
instead labels are propagated to a fixpoint with 8-direction segmented
doubling scans (see ``label_components``) — all shifted vector ops, no
gathers/scatters, which on TPU route through the scalar core.  Labels are
the maximum linear index in the component.

Stats (areas) come from a sort + cummax run-length pass, and the
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


def _shift2d(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """x shifted by (+dy, +dx) (elements move toward higher indices)."""
    h, w = x.shape
    py = (dy, 0) if dy >= 0 else (0, -dy)
    px = (dx, 0) if dx >= 0 else (0, -dx)
    sy = slice(0, h) if dy >= 0 else slice(-dy, h - dy)
    sx = slice(0, w) if dx >= 0 else slice(-dx, w - dx)
    return jnp.pad(x, (py, px), constant_values=fill)[sy, sx]


def _segmented_cummax(vals: jax.Array, fg: jax.Array, dy: int, dx: int) -> jax.Array:
    """Running max within contiguous foreground runs along direction (dy, dx).

    Hillis-Steele doubling with an explicit "blocked" flag instead of
    gathers/associative_scan: after step d, v[p] holds the max over the run
    prefix of length 2^d arriving at p from direction (-dy, -dx).  All ops
    are shifted vector max/or — the TPU-friendly formulation (no gathers,
    which route through the scalar core and measured ~60x slower here)."""
    h, w = vals.shape
    n = max(h * abs(dy) if dy else 0, w * abs(dx) if dx else 0, 2)
    v = vals
    blocked = ~fg                       # True once the run boundary is passed
    d = 1
    while d < n:
        sv = _shift2d(v, d * dy, d * dx, -1)
        sb = _shift2d(blocked, d * dy, d * dx, True)
        v = jnp.where(blocked, v, jnp.maximum(v, sv))
        blocked = blocked | sb
        d *= 2
    return jnp.where(fg, v, -1)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jax.Array, max_iters: int = 16) -> jax.Array:
    """Label 8-connected components of a binary mask.

    Returns int32 (H, W): -1 for background, otherwise the component id
    (= max linear index over the component, so ids are arbitrary but unique).

    Algorithm: iterated segmented scans.  One sweep runs a forward+backward
    segmented doubling cummax along rows, then columns (propagating labels
    across entire foreground runs in O(log n) shifted-max steps), then one
    masked 3x3 max-pool to hop across 8-connected diagonal links.  A sweep
    extends agreement along any monotone staircase path, so fat blobs (the
    post-morphology indentation masks) converge in 1-2 sweeps; the
    while_loop exits at the fixpoint, with ``max_iters`` as the cap for
    pathological spirals.  Everything is shifted VPU ops — no gathers, no
    scatters — which is what makes it fast on TPU (the gather-based
    pointer-jumping variant measured ~60x slower per batch).
    """
    h, w = mask.shape
    fg = mask > 0.5
    init = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(fg, init, -1)

    def sweep(l):
        # 8 directions: rows, cols, both diagonals, forward + backward —
        # any straight run of foreground converges in one scan each.
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                       (1, 1), (-1, -1), (1, -1), (-1, 1)):
            l = _segmented_cummax(l, fg, dy, dx)
        return _hook(l, fg)

    def cond(state):
        i, _, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, labels, _ = state
        new = sweep(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(cond, body, (0, sweep(labels), jnp.bool_(True)))
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

    # Component areas WITHOUT a scatter (TPU scatters route through the
    # scalar core — the histogram version measured ~3ms/image): sort the
    # label image, then run lengths fall out of cummax'd run-start positions.
    n = h * w
    flat = labels.reshape(-1)
    sorted_l = jnp.sort(flat)                       # background (-1) first
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_l[1:] != sorted_l[:-1]])
    is_end = jnp.concatenate(
        [sorted_l[1:] != sorted_l[:-1], jnp.ones((1,), bool)])
    start_pos = jax.lax.cummax(jnp.where(is_start, pos, -1))
    run_len = pos - start_pos + 1
    area_at_end = jnp.where(is_end & (sorted_l >= 0), run_len, 0)

    # top-K by repeated argmax: K cheap vector reductions, no sort-by-area.
    def take_next(carry, _):
        areas = carry
        i = jnp.argmax(areas)
        a = areas[i]
        lbl = sorted_l[i]
        return areas.at[i].set(-1), (a, lbl)

    _, (top_areas, top_ids) = jax.lax.scan(
        take_next, area_at_end, None, length=max_components
    )
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
