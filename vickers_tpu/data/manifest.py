"""Dataset manifest and train/val split.

Replicates the reference's data conventions exactly:
- images under ``<root>/images``, masks as sibling ``<root>/masks/<stem>.png``
  (train.py:58-61), extensions filtered by IMG_EXTS (train.py:30, :567);
- the split is ``random.Random(seed).shuffle(sorted_paths)`` with the first
  ``max(1, int(N * val_ratio))`` entries as validation (train.py:571-575) —
  bit-for-bit, so retraining sees the same val set as the reference run;
- unlike the reference (which raises FileNotFoundError mid-epoch for the
  orphan image ``image011_(7)_dual.png``, SURVEY §2.1 dataset note), images
  with no mask are dropped at scan time with a warning.
"""

from __future__ import annotations

import dataclasses
import logging
import random
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

from vickers_tpu.core.config import IMG_EXTS

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class Sample:
    image: str
    mask: Optional[str]   # None for inference-only manifests
    stem: str


@dataclasses.dataclass(frozen=True)
class Manifest:
    samples: Tuple[Sample, ...]

    def __len__(self) -> int:
        return len(self.samples)


def scan(data_root: str, require_masks: bool = True,
         drop_orphans: bool = True) -> Manifest:
    img_dir = Path(data_root) / "images"
    if not img_dir.exists():
        raise FileNotFoundError(f"{img_dir} does not exist")
    mask_dir = Path(data_root) / "masks"
    paths = sorted(str(p) for p in img_dir.glob("*") if p.suffix.lower() in IMG_EXTS)
    if not paths:
        raise FileNotFoundError(f"no images under {img_dir}")
    samples: List[Sample] = []
    for p in paths:
        stem = Path(p).stem
        mp = mask_dir / f"{stem}.png"
        if require_masks and not mp.exists():
            if drop_orphans:
                log.warning("dropping orphan image with no mask: %s", p)
                continue
            raise FileNotFoundError(str(mp))
        samples.append(Sample(image=p, mask=str(mp) if mp.exists() else None, stem=stem))
    return Manifest(samples=tuple(samples))


def reference_split(
    image_paths: Sequence[str], seed: int = 42, val_ratio: float = 0.1
) -> Tuple[List[str], List[str]]:
    """(train_paths, val_paths), bit-identical to train.py:571-575.

    NOTE: the reference shuffles the *full* sorted path list (including any
    orphan); callers who drop orphans should pass the full list here and
    filter afterwards to preserve the exact split of the surviving files.
    """
    r = random.Random(seed)
    imgs = list(image_paths)
    r.shuffle(imgs)
    n_val = max(1, int(len(imgs) * val_ratio))
    return imgs[n_val:], imgs[:n_val]


def split_manifest(man: Manifest, seed: int = 42, val_ratio: float = 0.1,
                   all_image_paths: Optional[Sequence[str]] = None
                   ) -> Tuple[Manifest, Manifest]:
    """Split a manifest with reference parity.

    ``all_image_paths`` lets the caller supply the pre-filter path list (with
    orphans) so the shuffle stream matches the reference even though orphans
    were dropped from the manifest."""
    paths = list(all_image_paths) if all_image_paths is not None else [
        s.image for s in man.samples
    ]
    train_p, val_p = reference_split(paths, seed, val_ratio)
    by_img = {s.image: s for s in man.samples}
    tr = tuple(by_img[p] for p in train_p if p in by_img)
    va = tuple(by_img[p] for p in val_p if p in by_img)
    return Manifest(tr), Manifest(va)
