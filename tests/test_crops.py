"""Native-resolution crop dataset + trainer."""

import numpy as np
import pytest

from vickers_tpu.data.crops import CropDataset
from vickers_tpu.data.manifest import Manifest, Sample


@pytest.fixture(scope="module")
def crop_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("cropdata")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    rng = np.random.default_rng(0)
    samples = []
    for i in range(3):
        h, w = 200 + 30 * i, 300 + 20 * i
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        msk = np.zeros((h, w), np.uint8)
        cv2.circle(msk, (w // 2, h // 2), 40, 255, -1)
        cv2.imwrite(str(root / "images" / f"c{i}.png"), img)
        cv2.imwrite(str(root / "masks" / f"c{i}.png"), msk)
        samples.append(Sample(image=str(root / "images" / f"c{i}.png"),
                              mask=str(root / "masks" / f"c{i}.png"),
                              stem=f"c{i}"))
    return Manifest(tuple(samples))


def test_crop_dataset_shapes_and_fg_bias(crop_data):
    ds = CropDataset(crop_data, tile=128, fg_bias=1.0)
    rng = np.random.default_rng(0)
    imgs, masks, w, stems = ds.sample_batch(8, rng)
    assert imgs.shape == (8, 128, 128, 3) and masks.shape == (8, 128, 128)
    assert w.tolist() == [1.0] * 8
    # fg_bias=1.0: every crop contains foreground
    assert all(masks[b].sum() > 0 for b in range(8))


def test_crop_dataset_pads_small_images(crop_data):
    ds = CropDataset(crop_data, tile=256)
    rng = np.random.default_rng(1)
    imgs, masks, _, _ = ds.sample_batch(4, rng)
    assert imgs.shape == (4, 256, 256, 3)


def test_crop_dataset_no_bias_random(crop_data):
    ds = CropDataset(crop_data, tile=64, fg_bias=0.0)
    rng = np.random.default_rng(2)
    imgs, masks, _, _ = ds.sample_batch(16, rng)
    # with fg fraction ~20%, unbiased sampling should produce some empty crops
    assert any(masks[b].sum() == 0 for b in range(16))


def test_crop_training_smoke(crop_data, tmp_path):
    from vickers_tpu.core.config import AugmentConfig, ModelConfig, TrainConfig
    from vickers_tpu.train.crops import run_crop_training

    cfg = TrainConfig(
        data=str(crop_data.samples[0].image).rsplit("/images/", 1)[0],
        img_size=64, epochs=2, batch=2, lr=1e-3, encoder_weights=None,
        val_ratio=0.4, out=str(tmp_path / "croprun"), seed=42,
        model=ModelConfig(compute_dtype="float32"),
        augment=AugmentConfig(photo_p=0.0),
    )
    hist = run_crop_training(cfg, steps_per_epoch=3, val_crops_per_image=2)
    assert len(hist) == 2
    assert (tmp_path / "croprun" / "history.json").exists()
    assert (tmp_path / "croprun" / "best.pth").exists()
