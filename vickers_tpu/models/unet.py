"""Flax U-Net with ResNet-34 encoder — the flagship model.

Replicates the exact topology of ``smp.Unet('resnet34', in_channels=3,
classes=1, activation=None)`` as built at train.py:357-379 (SURVEY §3.4):

  decoder blocks (256, 128, 64, 32, 16), each =
      nearest-upsample x2 -> concat skip -> [Conv3x3+BN+ReLU] x2
  skips = (f4, f3, f2, f1, None); head = Conv3x3(16 -> classes) with bias.

The state-dict namespaces (``encoder.*``, ``decoder.blocks.N.convM.{0,1}.*``,
``segmentation_head.0.*``) round-trip through
``vickers_tpu.compat.convert`` for best.pth parity.

NHWC / bf16-compute by default.  Input is the ImageNet-normalized image
(N, H, W, 3); output logits (N, H, W, classes).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vickers_tpu.models.resnet import ResNet34Encoder

_ENCODERS = {
    "resnet34": (ResNet34Encoder, (64, 64, 128, 256, 512)),
}


# smp initialize_decoder: kaiming_uniform(mode=fan_in, nonlinearity=relu)
def smp_decoder_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1] * shape[2]
    bound = jnp.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# smp initialize_head: xavier_uniform
def smp_head_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """torch F.interpolate(scale_factor=2, mode='nearest') parity:
    out[i] = in[i // 2] — exact repeat."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class DecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = upsample_nearest_2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for name in ("conv1", "conv2"):
            x = nn.Conv(
                self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=smp_decoder_init, name=name,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name=name.replace("conv", "bn"),
            )(x)
            x = nn.relu(x)
        return x


class VickersUNet(nn.Module):
    """U-Net-R34 for single-class indentation segmentation."""

    encoder: str = "resnet34"
    classes: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        enc_cls, _ = _ENCODERS[self.encoder]
        feats = enc_cls(dtype=self.dtype, name="encoder")(x.astype(self.dtype), train)
        f1, f2, f3, f4, f5 = feats

        skips: Tuple[Optional[jax.Array], ...] = (f4, f3, f2, f1, None)
        y = f5
        for i, (ch, skip) in enumerate(zip(self.decoder_channels, skips)):
            y = DecoderBlock(ch, dtype=self.dtype, name=f"decoder_block{i}")(y, skip, train)

        logits = nn.Conv(
            self.classes, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=smp_head_init, name="head",
        )(y)
        return logits.astype(jnp.float32)


def build_model(encoder: str = "resnet34", classes: int = 1,
                dtype: Any = jnp.bfloat16) -> VickersUNet:
    """The framework's ``build_model`` (train.py:357-379 equivalent).

    ImageNet/pretrained weight loading happens via
    ``vickers_tpu.compat.convert.load_pth_params`` — this environment has no
    torchvision download path, so ``encoder_weights='imagenet'`` requires a
    local .pth (SURVEY §7 hard-part 2)."""
    if encoder not in _ENCODERS:
        raise ValueError(f"unsupported encoder {encoder!r}; have {list(_ENCODERS)}")
    return VickersUNet(encoder=encoder, classes=classes, dtype=dtype)


def init_model(model: VickersUNet, rng: jax.Array, img_size: int = 512,
               batch: int = 1):
    """Initialise params + batch_stats with a dummy batch."""
    variables = model.init(rng, jnp.zeros((batch, img_size, img_size, 3), jnp.float32), train=False)
    return variables["params"], variables["batch_stats"]
