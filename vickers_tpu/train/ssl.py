"""Self-supervised encoder pre-training on the dataset's own pixels.

The reference gets its 0.973 Dice from an ImageNet-pretrained ResNet-34
encoder (train.py:357-379, encoder_weights='imagenet'); this environment has
no ImageNet weights, and from-scratch training plateaus ~0.959 (round-2
measurement).  The fix is to manufacture the missing initialization from the
data itself: 183 microscope shots at up to 3072x2048 are an effectively
unlimited stream of 512^2 native-resolution crops (data.crops.CropDataset),
and masked-image modeling over them teaches the encoder microscope texture
statistics before it ever sees a segmentation label.

Two variants (round-2 verdict asks for >=2 attempts):

- ``mask``  — MAE-style block-masked inpainting: drop a random ~60% of
  32x32 blocks from the normalized image (replaced by 0 = the ImageNet
  mean), train the FULL U-Net (3-channel reconstruction head) to restore
  the missing pixels; loss is MSE on masked pixels only.  Pre-trains the
  encoder AND the decoder skip pathway.
- ``noise`` — denoising autoencoder: strong Gaussian noise + random
  contrast/brightness corruption in, clean image out, MSE everywhere.

``export_warm_start`` writes the pre-trained body with a freshly
initialized 1-class segmentation head in the reference's .pth state-dict
format, so the ordinary fine-tune path (``train.loop.run`` with
``encoder_weights=<path>``) consumes it with zero special cases.
"""

from __future__ import annotations

import functools
import json
import logging
import time
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vickers_tpu.core.config import TrainConfig
from vickers_tpu.data.crops import CropDataset
from vickers_tpu.data.manifest import scan
from vickers_tpu.models.unet import build_model, init_model
from vickers_tpu.ops.image import normalize_imagenet
from vickers_tpu.train import checkpoint as ckpt
from vickers_tpu.train.engine import TrainState, create_train_state
from vickers_tpu.train.loop import set_seed

log = logging.getLogger(__name__)


def _block_mask(key: jax.Array, size: int, block: int, ratio: float):
    """(size, size, 1) float32 — 1 where the image is VISIBLE."""
    g = size // block
    keep = jax.random.bernoulli(key, 1.0 - ratio, (g, g))
    keep = jnp.repeat(jnp.repeat(keep, block, 0), block, 1)
    return keep.astype(jnp.float32)[:, :, None]


def _corrupt(variant: str, x: jax.Array, key: jax.Array,
             block: int, ratio: float):
    """Per-image corruption; returns (net input, per-pixel loss weight)."""
    if variant == "mask":
        keep = _block_mask(key, x.shape[0], block, ratio)
        return x * keep, 1.0 - keep[..., 0]
    # noise: additive Gaussian + global contrast/brightness jitter
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.uniform(k1, (), minval=0.6, maxval=1.4)
    b = jax.random.uniform(k2, (), minval=-0.4, maxval=0.4)
    noisy = x * a + b + 0.35 * jax.random.normal(k3, x.shape)
    return noisy, jnp.ones(x.shape[:2], jnp.float32)


def make_ssl_step(model, tx, variant: str, block: int, ratio: float,
                  tile: int):
    # The step crops its batch ON DEVICE from a resident image bank and is
    # fed only (B,) coordinate vectors.  Feeding a fresh ~12.6 MB host
    # batch per step leaks in the relay client (retained staging buffers,
    # donation does not help): the round-5 16k run grew 11.4 MB/step to a
    # 130 GB OOM kill.  The device bank makes SSL leak-free the same way
    # the fine-tune path is (device-resident data + tiny index feeds).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, bank_u8, idx, y0, x0, key):
        crops = jax.vmap(
            lambda i, y, x: jax.lax.dynamic_slice(
                bank_u8, (i, y, x, 0), (1, tile, tile, 3))[0]
        )(idx, y0, x0)
        x = normalize_imagenet(crops.astype(jnp.float32))
        kc, kf = jax.random.split(key)
        # cheap geometric diversity: per-sample flips
        flips = jax.random.bernoulli(kf, 0.5, (x.shape[0], 2))
        x = jnp.where(flips[:, 0, None, None, None], x[:, :, ::-1], x)
        x = jnp.where(flips[:, 1, None, None, None], x[:, ::-1], x)
        keys = jax.random.split(kc, x.shape[0])
        xin, wpix = jax.vmap(
            lambda xi, ki: _corrupt(variant, xi, ki, block, ratio))(x, keys)

        def loss_fn(params):
            pred, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xin, train=True, mutable=["batch_stats"],
            )
            se = jnp.mean((pred - x) ** 2, axis=-1) * wpix
            loss = jnp.sum(se) / jnp.maximum(jnp.sum(wpix), 1.0)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), loss

    return step


def export_warm_start(out_pth: str | Path, params, batch_stats,
                      seed: int = 0) -> None:
    """Swap the 3-ch reconstruction head for a fresh 1-class seg head and
    write the reference-format .pth (consumed by TrainConfig.encoder_weights)."""
    model1 = build_model(classes=1)
    p1, _ = init_model(model1, jax.random.PRNGKey(seed), 64)
    params = dict(params)
    params["head"] = p1["head"]
    ckpt.export_pth(out_pth, params, batch_stats)


def run_ssl_pretrain(data: str, out: str, variant: str = "mask",
                     steps: int = 4000, batch: int = 16, lr: float = 1e-3,
                     tile: int = 512, block: int = 32, ratio: float = 0.6,
                     seed: int = 42, weight_decay: float = 1e-4,
                     log_every: int = 100) -> List[Dict]:
    """Pre-train; writes <out>/ssl_warmstart.pth + ssl_history.json."""
    from vickers_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    root_key = set_seed(seed)
    man = scan(data, require_masks=False, drop_orphans=False)
    # Pre-train only on the TRAIN split (same seed/ratio stream as the
    # fine-tune) plus any unlabeled orphans: SSL must never see val-split
    # pixels, or the headline val Dice is partially self-trained on its own
    # validation images (round-3 advisor finding).
    from vickers_tpu.data.manifest import split_manifest

    full_paths = [s.image for s in man.samples]
    train_man, val_man = split_manifest(man, seed=42, val_ratio=0.1,
                                        all_image_paths=full_paths)
    labeled_val = {s.image for s in val_man.samples if s.mask is not None}
    from vickers_tpu.data.manifest import Manifest

    man = Manifest(tuple(s for s in man.samples
                         if s.image not in labeled_val))
    log.info("ssl: excluded %d val-split images from pre-training",
             len(labeled_val))
    crop_ds = CropDataset(man, tile=tile, fg_bias=0.5)
    log.info("ssl[%s]: %d source images, %d steps x batch %d",
             variant, len(crop_ds), steps, batch)

    model = build_model(classes=3)
    params, stats = init_model(model, jax.random.PRNGKey(seed), tile)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
    tx = optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=weight_decay)
    state = create_train_state(model, params, stats, tx)
    step_fn = make_ssl_step(model, tx, variant, block, ratio, tile)
    bank = jax.device_put(crop_ds.image_bank())  # resident for the run

    rng = np.random.default_rng(seed)
    out_dir = Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    history: List[Dict] = []
    start_step = 1
    # crash-safe resume (OOM/wedge protection for long schedules): restore
    # full state + the RNG stream position recorded with it
    resume_ckpt = out_dir / "ssl_resume.ckpt"
    if resume_ckpt.exists():
        raw = ckpt.load_native(resume_ckpt)
        from flax import serialization as _ser

        state = state.replace(
            params=_ser.from_state_dict(state.params, raw["params"]),
            batch_stats=_ser.from_state_dict(state.batch_stats,
                                             raw["batch_stats"]),
            opt_state=_ser.from_state_dict(state.opt_state, raw["opt_state"]),
            step=int(raw["step"]))
        start_step = int(raw["step"]) + 1
        rng = np.random.default_rng(seed + start_step)
        root_key = jax.random.fold_in(root_key, start_step)
        hist_file = out_dir / "ssl_history.json"
        if hist_file.exists():
            history = json.loads(hist_file.read_text())
        log.info("ssl resume from step %d", start_step - 1)
    t0 = time.time()
    window: List[jax.Array] = []
    for i in range(start_step, steps + 1):
        idx, y0, x0 = crop_ds.sample_coords(batch, rng)
        root_key, sk = jax.random.split(root_key)
        state, loss = step_fn(state, bank, jnp.asarray(idx),
                              jnp.asarray(y0), jnp.asarray(x0), sk)
        window.append(loss)
        if i % log_every == 0 or i == steps:
            mean = float(np.mean(np.asarray(jnp.stack(window), np.float64)))
            window = []
            rec = {"step": i, "loss": mean,
                   "time": round(time.time() - t0, 2)}
            history.append(rec)
            log.info("ssl[%s] step %05d | loss %.4f | %.1fs",
                     variant, i, mean, rec["time"])
            (out_dir / "ssl_history.json").write_text(
                json.dumps(history, indent=2))
        if i % 2000 == 0 and i < steps:
            ckpt.save_native(resume_ckpt, {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": i})

    export_warm_start(out_dir / "ssl_warmstart.pth", state.params,
                      state.batch_stats, seed)
    ckpt.save_native(out_dir / "ssl_full.ckpt", {
        "params": state.params, "batch_stats": state.batch_stats})
    log.info("ssl[%s]: wrote %s", variant, out_dir / "ssl_warmstart.pth")
    return history
