"""Golden parity: torch oracle (smp-key-compatible) -> converter -> Flax.

This is the BASELINE.md round-trip requirement ("checkpoints round-trip from
best.pth and match mask IoU to within 1e-3") exercised with a random-init
checkpoint, since the repo's best.pth blob is stripped
(.MISSING_LARGE_BLOBS:1-4)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vickers_tpu.compat.convert import (
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)
from vickers_tpu.compat.torch_ref import build_torch_model
from vickers_tpu.models.unet import VickersUNet, build_model, init_model


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = build_torch_model()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_state_dict_keys_match_smp_schema(torch_model):
    keys = set(torch_model.state_dict().keys())
    # spot-check the documented namespaces (SURVEY §3.4)
    expect = [
        "encoder.conv1.weight",
        "encoder.bn1.running_mean",
        "encoder.layer1.0.conv1.weight",
        "encoder.layer2.0.downsample.0.weight",
        "encoder.layer2.0.downsample.1.running_var",
        "encoder.layer4.2.bn2.bias",
        "decoder.blocks.0.conv1.0.weight",
        "decoder.blocks.4.conv2.1.running_mean",
        "segmentation_head.0.weight",
        "segmentation_head.0.bias",
    ]
    for k in expect:
        assert k in keys, k
    # no torch-default 'running' keys under unexpected names
    assert not any(k.startswith("decoder.blocks.5") for k in keys)


@pytest.mark.parametrize("size", [64, 96])
def test_forward_parity_f32(torch_model, size):
    params, stats = torch_state_dict_to_flax(torch_model.state_dict())
    model = VickersUNet(dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    out = np.asarray(out)
    assert out.shape == ref.shape
    diff = np.abs(out - ref)
    assert diff.max() < 2e-3, diff.max()
    # binary masks agree after sigmoid threshold
    m1 = (1 / (1 + np.exp(-out))) > 0.5
    m2 = (1 / (1 + np.exp(-ref))) > 0.5
    iou = (m1 & m2).sum() / max(1, (m1 | m2).sum())
    assert iou > 0.999


def test_forward_parity_bf16_close(torch_model):
    """bf16 compute should stay within mask-level tolerance of the f32 path."""
    params, stats = torch_state_dict_to_flax(torch_model.state_dict())
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out32 = np.asarray(VickersUNet(dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    out16 = np.asarray(VickersUNet(dtype=jnp.bfloat16).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    m1, m2 = out32 > 0, out16 > 0
    iou = (m1 & m2).sum() / max(1, (m1 | m2).sum())
    assert iou > 0.98


def test_round_trip_export(torch_model):
    """flax -> torch state dict -> flax is lossless."""
    params, stats = torch_state_dict_to_flax(torch_model.state_dict())
    sd2 = flax_to_torch_state_dict(params, stats)
    ref_sd = torch_model.state_dict()
    assert set(sd2.keys()) == set(ref_sd.keys())
    for k in ref_sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(sd2[k].numpy(), ref_sd[k].numpy(), atol=0, rtol=0)


def test_init_model_shapes():
    model = build_model(dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), img_size=64)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 1)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # smp UNet-R34 has ~24.4M params
    assert 24e6 < n_params < 25e6, n_params
