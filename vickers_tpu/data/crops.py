"""Native-resolution crop dataset for tiled high-res inference training.

The reference trains ONLY at 512-letterbox scale, so its model (and any
checkpoint-compatible model) cannot segment native-resolution structures —
its high-res story is "downsample 6x and upsample the mask" (SURVEY §5
long-context note).  Tiled full-resolution inference (infer.tiled) needs a
model trained at native scale; this dataset provides it:

- full-resolution images + masks cached once (RAM: the 183-shot reference
  set is ~3 GB as uint8),
- each step samples random ``tile``-sized crops, biased toward foreground
  (probability ``fg_bias`` of centering on a random mask pixel) so the tiny
  foreground fraction at native scale doesn't starve the loss,
- crops feed the same on-device augmentation + train step as letterbox
  training — only the data source differs.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

from vickers_tpu.data.manifest import Manifest, Sample


class CropDataset:
    def __init__(self, manifest: Manifest, tile: int = 512, fg_bias: float = 0.7,
                 max_side: Optional[int] = None):
        import cv2

        self.tile = tile
        self.fg_bias = fg_bias
        self.images: List[np.ndarray] = []
        self.masks: List[np.ndarray] = []
        self.fg_coords: List[np.ndarray] = []
        self.stems: List[str] = []
        for s in manifest.samples:
            img = cv2.imread(s.image, cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(s.image)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            msk = cv2.imread(s.mask, cv2.IMREAD_UNCHANGED) if s.mask else None
            if msk is None:
                msk = np.zeros(img.shape[:2], np.uint8)
            if msk.ndim == 3:
                msk = msk[:, :, 0]
            msk = (msk > 0).astype(np.uint8)
            if max_side and max(img.shape[:2]) > max_side:
                sc = max_side / max(img.shape[:2])
                nh, nw = int(round(img.shape[0] * sc)), int(round(img.shape[1] * sc))
                img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
                msk = cv2.resize(msk, (nw, nh), interpolation=cv2.INTER_NEAREST)
            h, w = img.shape[:2]
            if h < tile or w < tile:  # pad small images up to one tile
                ph, pw = max(0, tile - h), max(0, tile - w)
                img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
                msk = np.pad(msk, ((0, ph), (0, pw)))
            self.images.append(img)
            self.masks.append(msk)
            ys, xs = np.nonzero(msk)
            self.fg_coords.append(np.stack([ys, xs], 1) if len(ys) else np.zeros((0, 2), np.int64))
            self.stems.append(s.stem)

    def __len__(self) -> int:
        return len(self.images)

    def sample_batch(self, batch: int, rng: np.random.Generator
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
        t = self.tile
        imgs = np.zeros((batch, t, t, 3), np.uint8)
        msks = np.zeros((batch, t, t), np.uint8)
        stems = []
        for b in range(batch):
            i = int(rng.integers(len(self.images)))
            img, msk, fg = self.images[i], self.masks[i], self.fg_coords[i]
            h, w = img.shape[:2]
            if len(fg) and rng.random() < self.fg_bias:
                cy, cx = fg[int(rng.integers(len(fg)))]
                y0 = int(np.clip(cy - t // 2 + int(rng.integers(-t // 4, t // 4 + 1)), 0, h - t))
                x0 = int(np.clip(cx - t // 2 + int(rng.integers(-t // 4, t // 4 + 1)), 0, w - t))
            else:
                y0 = int(rng.integers(0, h - t + 1))
                x0 = int(rng.integers(0, w - t + 1))
            imgs[b] = img[y0:y0 + t, x0:x0 + t]
            msks[b] = msk[y0:y0 + t, x0:x0 + t]
            stems.append(self.stems[i])
        return imgs, msks, np.ones(batch, np.float32), stems

    def epoch_batches(self, batch: int, steps: int, rng: np.random.Generator
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]]:
        for _ in range(steps):
            yield self.sample_batch(batch, rng)

    def sample_coords(self, batch: int, rng: np.random.Generator
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(idx, y0, x0) int32 — the same crop distribution as
        ``sample_batch`` but coordinates only, for steps that crop from a
        device-resident ``image_bank()`` (a fresh ~MB host batch per step
        leaks in the relay client — round-5 SSL OOM; tiny coordinate
        vectors do not)."""
        t = self.tile
        idx = np.zeros(batch, np.int32)
        ys = np.zeros(batch, np.int32)
        xs = np.zeros(batch, np.int32)
        for b in range(batch):
            i = int(rng.integers(len(self.images)))
            img, fg = self.images[i], self.fg_coords[i]
            h, w = img.shape[:2]
            if len(fg) and rng.random() < self.fg_bias:
                cy, cx = fg[int(rng.integers(len(fg)))]
                y0 = int(np.clip(cy - t // 2 + int(rng.integers(-t // 4, t // 4 + 1)), 0, h - t))
                x0 = int(np.clip(cx - t // 2 + int(rng.integers(-t // 4, t // 4 + 1)), 0, w - t))
            else:
                y0 = int(rng.integers(0, h - t + 1))
                x0 = int(rng.integers(0, w - t + 1))
            idx[b], ys[b], xs[b] = i, y0, x0
        return idx, ys, xs

    def image_bank(self) -> np.ndarray:
        """(N, Hmax, Wmax, 3) uint8 zero-padded image bank.  Crops sampled
        by ``sample_coords`` never read the padding (y0 <= h - tile)."""
        hm = max(im.shape[0] for im in self.images)
        wm = max(im.shape[1] for im in self.images)
        bank = np.zeros((len(self.images), hm, wm, 3), np.uint8)
        for i, im in enumerate(self.images):
            bank[i, : im.shape[0], : im.shape[1]] = im
        return bank
