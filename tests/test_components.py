"""Connected components parity vs cv2.connectedComponentsWithStats."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from vickers_tpu.ops.components import extract_components, label_components


def _cc_oracle(mask_u8):
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask_u8 * 255, connectivity=8)
    comps = []
    for i in range(1, n):
        comps.append((int(stats[i, cv2.CC_STAT_AREA]), labels == i))
    comps.sort(key=lambda t: -t[0])
    return comps


def _assert_same_partition(mask, our_labels, name=""):
    """Same-component relation must match cv2's labeling exactly."""
    n, ref_labels, _, _ = cv2.connectedComponentsWithStats(mask * 255, connectivity=8)
    ours = np.asarray(our_labels)
    fg = mask > 0
    assert np.all((ours >= 0) == fg), name
    # two fg pixels share a cv2 label iff they share ours
    for i in range(1, n):
        sel = ref_labels == i
        vals = np.unique(ours[sel])
        assert len(vals) == 1, f"{name}: cv2 component {i} split into {vals}"
    # and distinct cv2 components get distinct ids
    roots = [np.unique(ours[ref_labels == i])[0] for i in range(1, n)]
    assert len(set(roots)) == len(roots), name


def test_label_simple_blobs():
    mask = np.zeros((64, 96), np.uint8)
    cv2.circle(mask, (20, 20), 10, 1, -1)
    cv2.rectangle(mask, (60, 40), (90, 60), 1, -1)
    mask[5, 50] = 1  # singleton
    _assert_same_partition(mask, label_components(jnp.asarray(mask, jnp.float32)))


def test_label_diagonal_connectivity():
    """8-connectivity: a diagonal chain is ONE component."""
    mask = np.zeros((32, 32), np.uint8)
    for i in range(20):
        mask[i, i] = 1
    labels = label_components(jnp.asarray(mask, jnp.float32))
    _assert_same_partition(mask, labels)


def test_label_concave_shapes():
    mask = np.zeros((96, 96), np.uint8)
    cv2.ellipse(mask, (48, 48), (40, 40), 0, 0, 300, 1, 8)  # thick open arc
    mask2 = np.zeros((96, 96), np.uint8)
    cv2.putText(mask2, "S", (20, 70), cv2.FONT_HERSHEY_SIMPLEX, 2.5, 1, 10)
    for m in (mask, mask2):
        _assert_same_partition(m, label_components(jnp.asarray(m, jnp.float32)))


def test_label_real_masks(reference_masks):
    for name, m in reference_masks:
        small = cv2.resize(m, (512, 341), interpolation=cv2.INTER_NEAREST)
        _assert_same_partition(small, label_components(jnp.asarray(small, jnp.float32)), name)


def test_extract_components_topk_and_min_area():
    mask = np.zeros((128, 128), np.uint8)
    cv2.circle(mask, (30, 30), 20, 1, -1)    # big
    cv2.circle(mask, (90, 90), 10, 1, -1)    # medium
    cv2.circle(mask, (90, 20), 3, 1, -1)     # small, below min_area
    comps = extract_components(jnp.asarray(mask, jnp.float32), min_area=200, max_components=4)
    valid = np.asarray(comps.valid)
    areas = np.asarray(comps.areas)
    assert valid.sum() == 2
    oracle = _cc_oracle(mask)
    assert areas[0] == oracle[0][0]
    assert areas[1] == oracle[1][0]
    # areas descending, per-component masks match the oracle partition
    assert np.array_equal(np.asarray(comps.masks[0]), oracle[0][1])
    assert np.array_equal(np.asarray(comps.masks[1]), oracle[1][1])
    # clean = union of kept components only
    clean = np.asarray(comps.clean) > 0.5
    assert np.array_equal(clean, oracle[0][1] | oracle[1][1])


def test_extract_components_empty_mask():
    comps = extract_components(jnp.zeros((64, 64), jnp.float32), min_area=200)
    assert not np.any(np.asarray(comps.valid))
    assert np.all(np.asarray(comps.clean) == 0)


class TestRunBasedComponents:
    """The run-based fast path must match cv2 and the pixel labeler exactly
    (same ids, same areas, same clean mask) on every mask morphology can emit."""

    def test_oracle_parity_real_and_synthetic(self, reference_masks):
        import cv2
        from vickers_tpu.ops.components import (extract_components,
                                                extract_components_runs)

        cases = [m for _, m in reference_masks]
        rng = np.random.default_rng(3)
        blob = cv2.GaussianBlur(rng.random((256, 256)).astype(np.float32),
                                (31, 31), 0)
        cases.append((blob > blob.mean() + blob.std()).astype(np.uint8))
        u = np.zeros((128, 128), np.uint8)
        cv2.rectangle(u, (20, 20), (30, 100), 1, -1)
        cv2.rectangle(u, (80, 20), (90, 100), 1, -1)
        cv2.rectangle(u, (20, 90), (90, 100), 1, -1)
        cases.append(u)

        for m in cases:
            min_area = 1 if m.shape[0] <= 256 else max(200, int(0.0008 * m.size))
            n, _, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
            want = sorted(
                [int(stats[i, 4]) for i in range(1, n) if stats[i, 4] >= min_area],
                reverse=True)[:8]
            got = extract_components_runs(
                jnp.asarray(m.astype(np.float32)), min_area, 8, 64, 16)
            got_areas = sorted(
                [int(a) for a, v in zip(np.asarray(got.areas),
                                        np.asarray(got.valid)) if v],
                reverse=True)
            assert got_areas == want

    def test_overflow_flag_on_stripes(self):
        """Adversarial: >max_runs runs per row must raise the overflow flag
        (r2 verdict: no silent detection loss on pathological inputs)."""
        from vickers_tpu.ops.components import extract_components_runs

        m = np.zeros((64, 256), np.uint8)
        m[:, ::2] = 1                       # 128 one-pixel runs per row
        got = extract_components_runs(jnp.asarray(m, jnp.float32), 1, 8, 64, 16)
        assert bool(got.overflow)
        # a normal mask must NOT flag
        ok = np.zeros((64, 256), np.uint8)
        ok[10:50, 10:200] = 1
        got2 = extract_components_runs(jnp.asarray(ok, jnp.float32), 1, 8, 64, 16)
        assert not bool(got2.overflow)

    def test_postprocess_overflow_surfaced(self):
        """The overflow bit must survive through the fused postprocess."""
        from vickers_tpu.core.config import HVConfig, PostprocessConfig
        from vickers_tpu.ops.postprocess import postprocess

        m = np.zeros((128, 256), np.float32)
        m[:, ::2] = 1.0
        cfg = PostprocessConfig(cc_impl="runs", open_iter=0, close_iter=0)
        res = postprocess(jnp.asarray(m), cfg, HVConfig())
        assert bool(res.overflow)

    def test_spiral_and_zigzag_many_sweeps(self):
        """Direction-reversing shapes exercise the multi-sweep fixpoint of
        the blocked (log-depth) run labeler."""
        from vickers_tpu.ops.components import extract_components_runs

        # rectangular spiral: one component, many vertical reversals
        m = np.zeros((160, 160), np.uint8)
        x0 = y0 = 4
        x1_, y1_ = 155, 155
        while x1_ - x0 > 12:
            cv2.rectangle(m, (x0, y0), (x1_, y1_), 1, 3)
            m[y0:y0 + 12, x0:x0 + 3] = 0      # cut each ring open
            x0 += 10; y0 += 10; x1_ -= 10; y1_ -= 10
        n, _, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
        want = sorted([int(stats[i, 4]) for i in range(1, n)], reverse=True)[:8]
        got = extract_components_runs(jnp.asarray(m, jnp.float32), 1, 8, 64, 32)
        got_areas = sorted(
            [int(a) for a, v in zip(np.asarray(got.areas),
                                    np.asarray(got.valid)) if v], reverse=True)
        assert got_areas == want
        assert not bool(got.overflow)

    def test_nondivisible_heights(self):
        """Blocked fixpoint pads rows to a block multiple — results must be
        unaffected for any H."""
        from vickers_tpu.ops.components import extract_components_runs

        rng = np.random.default_rng(7)
        for h in (33, 77, 129, 341):
            m = np.zeros((h, 96), np.uint8)
            for _ in range(4):
                cx, cy = rng.integers(10, 86), rng.integers(5, h - 5)
                cv2.circle(m, (int(cx), int(cy)), int(rng.integers(3, 12)), 1, -1)
            n, _, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
            want = sorted([int(stats[i, 4]) for i in range(1, n)],
                          reverse=True)[:8]
            got = extract_components_runs(jnp.asarray(m, jnp.float32), 1, 8, 64, 16)
            got_areas = sorted(
                [int(a) for a, v in zip(np.asarray(got.areas),
                                        np.asarray(got.valid)) if v],
                reverse=True)
            assert got_areas == want, h

    def test_extents_match_pixel_impl(self):
        import cv2
        from vickers_tpu.ops.components import (extract_components,
                                                extract_components_runs)

        m = np.zeros((128, 128), np.uint8)
        cv2.circle(m, (40, 44), 21, 1, -1)
        cv2.rectangle(m, (80, 70), (120, 110), 1, -1)
        runs = extract_components_runs(jnp.asarray(m, jnp.float32), 10, 8, 64, 16)
        pix = extract_components(jnp.asarray(m, jnp.float32), 10, 8, 64)
        assert np.array_equal(np.asarray(runs.ids), np.asarray(pix.ids))
        assert np.array_equal(np.asarray(runs.clean), np.asarray(pix.clean))
        masks = np.asarray(pix.masks)
        for k in range(8):
            if not np.asarray(pix.valid)[k]:
                continue
            for r in range(128):
                cols = np.where(masks[k, r])[0]
                if len(cols):
                    assert np.asarray(runs.xmin)[k, r] == cols.min()
                    assert np.asarray(runs.xmax)[k, r] == cols.max()
                else:
                    assert not np.asarray(runs.any_row)[k, r]


def test_edges_agree_predicate():
    """The O(1)-depth convergence predicate (round-5 fixpoint change):
    False on a label state where connected adjacent-row runs disagree,
    True at the true fixpoint (which the oracle-checked labeler reaches)."""
    import jax.numpy as jnp
    import numpy as np

    from vickers_tpu.ops.components import (_edges_agree, _row_run_tables,
                                            _run_fixpoint)

    # U shape: left and right arms joined only at the bottom — the init
    # labels (per-run max linear index) disagree across every vertical edge
    m = np.zeros((16, 16), np.float32)
    m[2:14, 2:4] = 1
    m[2:14, 10:12] = 1
    m[12:14, 2:12] = 1
    fg = jnp.asarray(m) > 0.5
    x0, x1, rv, _ = _row_run_tables(fg, 8)
    rows = jnp.arange(16, dtype=jnp.int32)
    init = jnp.where(rv, rows[:, None] * 16 + x1, -1)
    assert not bool(_edges_agree(init, x0, x1, rv))
    final = _run_fixpoint(x0, x1, init, rv, max_sweeps=16)
    assert bool(_edges_agree(final, x0, x1, rv))
    # every run of the single component carries the component max
    labels = np.asarray(final)[np.asarray(rv)]
    assert (labels == labels.max()).all()
