"""SSL pre-training units: masking, corruption variants, warm-start export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_block_mask_ratio_and_shape():
    from vickers_tpu.train.ssl import _block_mask

    keep = _block_mask(jax.random.PRNGKey(0), 64, 16, 0.6)
    assert keep.shape == (64, 64, 1)
    # blockwise constant: every 16x16 block is all-0 or all-1
    blocks = np.asarray(keep)[:, :, 0].reshape(4, 16, 4, 16)
    assert np.all((blocks.min(axis=(1, 3)) == blocks.max(axis=(1, 3))))
    # keep fraction ~ 1 - ratio over many draws
    ks = [float(_block_mask(jax.random.PRNGKey(i), 64, 16, 0.6).mean())
          for i in range(40)]
    assert 0.25 < np.mean(ks) < 0.55


def test_corrupt_variants():
    from vickers_tpu.train.ssl import _corrupt

    x = jnp.ones((32, 32, 3), jnp.float32)
    xin, w = _corrupt("mask", x, jax.random.PRNGKey(1), 8, 0.5)
    assert xin.shape == x.shape and w.shape == (32, 32)
    # masked pixels are zeroed and exactly they carry loss weight
    masked = np.asarray(w) > 0.5
    assert np.all(np.asarray(xin)[masked] == 0.0)
    assert np.all(np.asarray(xin)[~masked] == 1.0)

    xin2, w2 = _corrupt("noise", x, jax.random.PRNGKey(2), 8, 0.5)
    assert float(jnp.std(xin2)) > 0.05      # actually corrupted
    assert np.all(np.asarray(w2) == 1.0)    # loss everywhere


def test_export_warm_start_swaps_head(tmp_path):
    from vickers_tpu.models.unet import build_model, init_model
    from vickers_tpu.train.ssl import export_warm_start
    from vickers_tpu.compat.convert import load_pth_params

    model3 = build_model(classes=3, dtype=jnp.float32)
    p3, s3 = init_model(model3, jax.random.PRNGKey(0), 64)
    out = tmp_path / "warm.pth"
    export_warm_start(out, p3, s3)
    p1, s1 = load_pth_params(str(out))
    # head is 1-class, body weights survive the round trip
    assert p1["head"]["kernel"].shape[-1] == 1
    np.testing.assert_allclose(
        np.asarray(p1["encoder"]["conv1"]["kernel"]),
        np.asarray(p3["encoder"]["conv1"]["kernel"]), atol=1e-6)
