"""Host-side data loading: decode once, cache letterboxed uint8, feed device.

The reference re-decodes and re-resizes every image from disk on every epoch
inside a ``num_workers=0`` DataLoader (train.py:586-589) — the dominant cost
of its 8.5 s epochs.  Here the host does the *deterministic* geometry exactly
once (cv2 decode + LongestMaxSize/PadIfNeeded letterbox, bit-parity with the
reference's eval path, train.py:116-130), caches the result as uint8 in RAM
(183 images x 512^2 x 3 = 144 MB), and every epoch is pure device work: the
random augmentations (ops.augment) and normalization run on-TPU inside the
train step.

Decode parallelism comes from a thread pool (cv2.imread releases the GIL in
its C++ core).  Training does not stream batches at all: the cached arrays
are device_put once and the jitted steps gather each batch on device from a
(B,) index vector (``train.engine.make_indexed_train_step``), so there is no
per-step host->device input transfer to hide.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, List, Optional, Tuple

import numpy as np

from vickers_tpu.core.config import LetterboxMode
from vickers_tpu.data.manifest import Manifest, Sample
from vickers_tpu.ops.image import letterbox_geometry


def _decode_image_letterboxed(path: str, img_size: int):
    """RGB uint8 square via the native C++ loader when built, else cv2."""
    from vickers_tpu import native

    dec = native.decoder()
    if dec is not None:
        try:
            out, (h, w) = dec.decode_letterbox(path, img_size, "center_upscale")
            return out, (h, w)
        except IOError:
            pass  # fall through to cv2 (e.g. TIFF/BMP)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    g = letterbox_geometry(h, w, img_size, LetterboxMode.CENTER_UPSCALE)
    rs = cv2.resize(img, (g.new_w, g.new_h), interpolation=cv2.INTER_LINEAR)
    sq = cv2.copyMakeBorder(rs, g.pad_top, g.pad_bottom, g.pad_left,
                            g.pad_right, cv2.BORDER_CONSTANT, value=(0, 0, 0))
    return sq, (h, w)


def _decode_pair(sample: Sample, img_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Read image (BGR->RGB, train.py:145-149) + mask (>0 -> 1, channel 0 of
    3-channel masks, train.py:162-170), apply the deterministic letterbox."""
    import cv2

    img_sq, _ = _decode_image_letterboxed(sample.image, img_size)

    if sample.mask is None:
        return img_sq, np.zeros((img_size, img_size), np.uint8)

    msk = cv2.imread(sample.mask, cv2.IMREAD_UNCHANGED)
    if msk is None:
        raise FileNotFoundError(sample.mask)
    if msk.ndim == 3:
        msk = msk[:, :, 0]
    msk = (msk > 0).astype(np.uint8)

    h, w = msk.shape[:2]
    g = letterbox_geometry(h, w, img_size, LetterboxMode.CENTER_UPSCALE)
    msk_rs = cv2.resize(msk, (g.new_w, g.new_h), interpolation=cv2.INTER_NEAREST)
    msk_sq = cv2.copyMakeBorder(msk_rs, g.pad_top, g.pad_bottom, g.pad_left,
                                g.pad_right, cv2.BORDER_CONSTANT, value=0)
    return img_sq, msk_sq


class CachedDataset:
    """All samples decoded + letterboxed once, held as uint8 arrays."""

    def __init__(self, manifest: Manifest, img_size: int = 512, workers: int = 8):
        self.manifest = manifest
        self.img_size = img_size
        n = len(manifest)
        self.images = np.zeros((n, img_size, img_size, 3), np.uint8)
        self.masks = np.zeros((n, img_size, img_size), np.uint8)
        self.stems: List[str] = [s.stem for s in manifest.samples]
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            for i, (im, mk) in enumerate(
                ex.map(lambda s: _decode_pair(s, img_size), manifest.samples)
            ):
                self.images[i] = im
                self.masks[i] = mk

    def __len__(self) -> int:
        return len(self.stems)

    def epoch_index_batches(
        self,
        batch_size: int,
        shuffle: bool,
        rng: Optional[np.random.Generator] = None,
        drop_remainder: bool = False,
        pad_final: bool = False,
        extra_indices: Optional[np.ndarray] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, List[str]]]:
        """Yields (idx (B,) int32, weights (B,), stems) — for the indexed
        train/eval steps that gather batches from a device-resident dataset
        (engine.make_indexed_train_step).  ``weights`` marks real samples
        vs final-batch padding.  ``extra_indices`` appends oversampled
        dataset indices to the epoch's stream (TrainConfig.oversample)."""
        n = len(self)
        order = np.arange(n)
        if extra_indices is not None and len(extra_indices):
            order = np.concatenate([order, np.asarray(extra_indices, np.int64)])
            n = len(order)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        stop = (n // batch_size) * batch_size if drop_remainder else n
        for start in range(0, stop, batch_size):
            idx = order[start:start + batch_size]
            pad = 0
            if pad_final and len(idx) < batch_size:
                pad = batch_size - len(idx)
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            w = np.ones(len(idx), np.float32)
            if pad:
                w[-pad:] = 0.0
            yield (
                idx.astype(np.int32),
                w,
                [self.stems[i] for i in idx[: len(idx) - pad]],
            )

    def epoch_batches(
        self,
        batch_size: int,
        shuffle: bool,
        rng: Optional[np.random.Generator] = None,
        drop_remainder: bool = False,
        pad_final: bool = False,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]]:
        """Yields (images_u8 (B,S,S,3), masks_u8 (B,S,S), weights (B,), stems)."""
        for idx, w, stems in self.epoch_index_batches(
            batch_size, shuffle, rng, drop_remainder, pad_final
        ):
            yield self.images[idx], self.masks[idx], w, stems
