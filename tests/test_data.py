"""Data layer: split parity with the reference, manifest scan, cached loader."""

import random
from pathlib import Path

import numpy as np
import pytest

from vickers_tpu.data.manifest import reference_split, scan, split_manifest
from vickers_tpu.data.loader import CachedDataset


def test_reference_split_bit_parity():
    """Must equal random.Random(seed).shuffle + first-n_val (train.py:571-575)."""
    paths = [f"data/images/img_{i:03d}.png" for i in range(183)]
    train_p, val_p = reference_split(paths, seed=42, val_ratio=0.1)

    r = random.Random(42)
    imgs = paths[:]
    r.shuffle(imgs)
    n_val = max(1, int(len(imgs) * 0.1))
    assert val_p == imgs[:n_val]
    assert train_p == imgs[n_val:]
    assert len(val_p) == 18 and len(train_p) == 165


def test_scan_reference_dataset_drops_orphan():
    ref = Path("/root/reference/data")
    if not ref.exists():
        pytest.skip("reference data not available")
    man = scan(str(ref))
    # 183 images, one orphan without a mask -> 182 usable pairs (SURVEY §2.1)
    assert len(man) == 182
    stems = {s.stem for s in man.samples}
    assert "image011_(7)_dual" not in stems


def test_split_manifest_preserves_reference_stream():
    ref = Path("/root/reference/data")
    if not ref.exists():
        pytest.skip("reference data not available")
    from vickers_tpu.core.config import IMG_EXTS

    man = scan(str(ref))
    full = sorted(str(p) for p in (ref / "images").glob("*")
                  if p.suffix.lower() in IMG_EXTS)
    tr, va = split_manifest(man, 42, 0.1, full)
    # val set = first 18 of the reference shuffle, minus any orphan
    train_p, val_p = reference_split(full, 42, 0.1)
    surviving_val = [p for p in val_p if Path(p).stem != "image011_(7)_dual"]
    assert [s.image for s in va.samples] == surviving_val
    assert len(tr) + len(va) == 182


def test_cached_dataset_and_batches():
    ref = Path("/root/reference/data")
    if not ref.exists():
        pytest.skip("reference data not available")
    man = scan(str(ref))
    from vickers_tpu.data.manifest import Manifest

    small = Manifest(man.samples[:5])
    ds = CachedDataset(small, img_size=128)
    assert ds.images.shape == (5, 128, 128, 3)
    assert ds.masks.shape == (5, 128, 128)
    assert ds.images.dtype == np.uint8
    assert set(np.unique(ds.masks)) <= {0, 1}
    # mask and image occupy the same letterboxed region
    assert ds.masks.sum() > 0

    batches = list(ds.epoch_batches(2, shuffle=False, pad_final=True))
    assert len(batches) == 3
    imgs, masks, w, stems = batches[-1]
    assert imgs.shape[0] == 2            # padded to full batch
    assert w.tolist() == [1.0, 0.0]
    assert len(stems) == 1               # stems only for real samples

    b2 = list(ds.epoch_batches(2, shuffle=False, drop_remainder=True))
    assert len(b2) == 2


def test_epoch_index_batches_extra_indices():
    """TrainConfig.oversample plumbing: extra indices join the shuffled
    epoch stream; counts and padding weights stay consistent."""
    import numpy as np

    from vickers_tpu.data.loader import CachedDataset

    ds = CachedDataset.__new__(CachedDataset)  # avoid decoding: stub fields
    ds.stems = [f"s{i}" for i in range(10)]
    ds.images = np.zeros((10, 8, 8, 3), np.uint8)
    ds.masks = np.zeros((10, 8, 8), np.uint8)

    rng = np.random.default_rng(0)
    extra = np.asarray([3, 3, 7], np.int64)
    seen = []
    total_w = 0.0
    for idx, w, stems in ds.epoch_index_batches(4, shuffle=True, rng=rng,
                                                pad_final=True,
                                                extra_indices=extra):
        assert len(idx) == 4 and len(w) == 4
        seen.extend(idx[w > 0].tolist())
        total_w += w.sum()
    assert total_w == 13  # 10 base + 3 extra real samples
    counts = np.bincount(seen, minlength=10)
    assert counts[3] == 3 and counts[7] == 2
    assert all(counts[i] == 1 for i in (0, 1, 2, 4, 5, 6, 8, 9))


def test_async_writer_orders_and_propagates_errors(tmp_path):
    import pytest

    from vickers_tpu.train import checkpoint as ckpt

    w = ckpt.AsyncWriter()
    out = []
    w.submit(out.append, 1)
    w.submit(out.append, 2)
    w.drain()
    assert out == [1, 2]

    def boom():
        raise RuntimeError("disk full")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w.drain()
    # writer survives an error and keeps working
    w.submit(out.append, 3)
    w.close()
    assert out == [1, 2, 3]
