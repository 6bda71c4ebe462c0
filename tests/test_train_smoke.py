"""Training integration: loss falls, history schema matches, checkpoints
round-trip (SURVEY §4 'training integration' tier)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vickers_tpu.core.config import AugmentConfig, ModelConfig, TrainConfig
from vickers_tpu.train.loop import run
from vickers_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    """Synthetic dataset: dark rotated squares on gray noise."""
    import cv2

    root = tmp_path_factory.mktemp("data")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(90, 150, (96, 128, 3)).astype(np.uint8)
        mask = np.zeros((96, 128), np.uint8)
        c = (int(rng.integers(40, 90)), int(rng.integers(30, 66)))
        rect = (c, (40, 40), float(rng.uniform(0, 90)))
        box = cv2.boxPoints(rect).astype(np.int32)
        cv2.fillConvexPoly(img, box, (20, 20, 25))
        cv2.fillConvexPoly(mask, box, 255)
        cv2.imwrite(str(root / "images" / f"s{i}.png"), img)
        cv2.imwrite(str(root / "masks" / f"s{i}.png"), mask)
    return root


def _cfg(tiny_data, tmp_path, epochs=3, **kw):
    defaults = dict(
        data=str(tiny_data), img_size=64, epochs=epochs, batch=2, lr=1e-3,
        encoder_weights=None, val_ratio=0.2, out=str(tmp_path / "run"),
        seed=42, dump_all_val=False,
        model=ModelConfig(compute_dtype="float32"),
        augment=AugmentConfig(photo_p=0.0),   # skip CLAHE on tiny CPU run
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_train_smoke_and_history_schema(tiny_data, tmp_path):
    cfg = _cfg(tiny_data, tmp_path, epochs=3)
    history = run(cfg)
    assert len(history) == 3
    # exact 7-key schema (train.py:650-658)
    for rec in history:
        assert list(rec.keys()) == [
            "epoch", "train_loss", "val_loss", "val_dice", "val_iou", "lr", "time"
        ]
    # loss falls
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    # cosine lr decreases
    assert history[-1]["lr"] < history[0]["lr"] < cfg.lr

    out = Path(cfg.out)
    assert (out / "history.json").exists()
    assert json.loads((out / "history.json").read_text()) == history
    for f in ("best.ckpt", "last.ckpt", "best.pth", "last.pth"):
        assert (out / f).exists(), f
    assert (out / "unet_stablehlo.mlir").exists()


def test_checkpoint_pth_round_trip(tiny_data, tmp_path):
    """best.pth written by our trainer loads into the torch oracle and the
    flax converter reproduces identical logits."""
    cfg = _cfg(tiny_data, tmp_path, epochs=1)
    run(cfg)
    out = Path(cfg.out)

    from vickers_tpu.compat.convert import load_pth_params
    from vickers_tpu.compat.torch_ref import load_pth
    from vickers_tpu.models.unet import VickersUNet

    tm = load_pth(str(out / "best.pth"))          # strict=True load succeeds
    params, stats = load_pth_params(str(out / "best.pth"))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    import torch

    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(VickersUNet(dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    assert np.abs(ours - ref).max() < 2e-3


def test_native_checkpoint_resume_state(tiny_data, tmp_path):
    cfg = _cfg(tiny_data, tmp_path, epochs=2)
    run(cfg)
    tree = ckpt.load_native(Path(cfg.out) / "last.ckpt")
    assert tree["epoch"] == 2
    assert "opt_state" in tree and "params" in tree and "batch_stats" in tree


def test_early_stopping(tiny_data, tmp_path):
    cfg = _cfg(tiny_data, tmp_path, epochs=50, early_stop_patience=1, lr=0.0)
    history = run(cfg)
    # lr=0: no improvement after epoch 1 -> stops at epoch 2
    assert len(history) <= 3


def test_resume_continues_training(tiny_data, tmp_path):
    import dataclasses

    cfg = _cfg(tiny_data, tmp_path, epochs=2)
    run(cfg)
    hist1 = json.loads((Path(cfg.out) / "history.json").read_text())
    assert len(hist1) == 2
    # resume to epoch 4
    cfg2 = dataclasses.replace(cfg, epochs=4, resume=True)
    hist2 = run(cfg2)
    assert [h["epoch"] for h in hist2] == [1, 2, 3, 4]
    # first two records preserved from the original run
    assert hist2[0]["train_loss"] == hist1[0]["train_loss"]
    on_disk = json.loads((Path(cfg.out) / "history.json").read_text())
    assert on_disk == hist2


def test_resume_across_ema_config_change(tiny_data, tmp_path):
    """Resume must tolerate EMA being toggled between runs (round-2 advisor
    finding: the strict from_bytes template raised on structure mismatch).
    pre-EMA ckpt + --ema-decay -> EMA warm-starts from restored weights;
    EMA ckpt + EMA off -> saved EMA ignored."""
    import dataclasses

    cfg = _cfg(tiny_data, tmp_path, epochs=2)        # no EMA
    run(cfg)
    cfg_on = dataclasses.replace(cfg, epochs=3, resume=True, ema_decay=0.9)
    hist = run(cfg_on)
    assert [h["epoch"] for h in hist] == [1, 2, 3]

    cfg_off = dataclasses.replace(cfg, epochs=4, resume=True, ema_decay=0.0)
    hist2 = run(cfg_off)
    assert [h["epoch"] for h in hist2] == [1, 2, 3, 4]


def test_ema_trains_validates_and_resumes(tiny_data, tmp_path):
    """EMA state rides in last.ckpt and survives resume; best.ckpt carries
    the averaged weights (they are what validation scored)."""
    cfg = _cfg(tiny_data, tmp_path, epochs=2, ema_decay=0.9)
    h1 = run(cfg)
    assert len(h1) == 2 and all(np.isfinite(r["val_dice"]) for r in h1)

    out = Path(cfg.out)
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.train.engine import create_train_state, make_optimizer

    model = build_model(dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), cfg.img_size)
    tx = make_optimizer(cfg)
    state = create_train_state(model, params, stats, tx, cfg.ema_decay)
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "epoch": 0, "best_dice": 0.0,
                "ema": state.ema}
    tree = ckpt.load_native(out / "last.ckpt", template)
    assert int(tree["epoch"]) == 2 and tree["ema"] is not None
    # best.ckpt == the EMA view, not the raw weights
    best = ckpt.load_native(out / "best.ckpt")
    ema_leaf = jax.tree.leaves(tree["ema"]["params"])[0]
    raw_leaf = jax.tree.leaves(tree["params"])[0]
    assert not np.allclose(np.asarray(ema_leaf), np.asarray(raw_leaf))

    cfg2 = _cfg(tiny_data, tmp_path, epochs=4, ema_decay=0.9, resume=True)
    h2 = run(cfg2)
    assert [r["epoch"] for r in h2] == [1, 2, 3, 4]
