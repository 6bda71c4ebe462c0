"""Flax ResNet-34 encoder (NHWC, bf16-friendly).

Topologically identical to the torchvision ResNet-34 used as the smp.Unet
encoder (SURVEY §3.4): conv7x7/2 -> bn -> relu -> maxpool3x3/2 ->
layers of BasicBlocks (3, 4, 6, 3) at widths (64, 128, 256, 512), returning
the 5-stage feature pyramid used as U-Net skips.

TPU notes:
- NHWC layout (channels-last) — the native TPU conv layout.
- Explicit SYMMETRIC padding ((1,1) / (3,3)): torch pads symmetrically even
  for stride-2 convs, where XLA's 'SAME' would pad (0,1).  Matching this
  exactly is required for the 1e-3 mask-IoU round-trip vs best.pth
  (BASELINE.md targets).
- Params are f32, compute in ``dtype`` (bf16 by default at train time).
- Module names (layerL_B, conv1/bn1/...) are chosen so the param tree maps
  1:1 onto the smp state-dict namespaces (vickers_tpu.compat.convert).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
def torch_conv_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1] * shape[2]  # HWIO
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# torchvision resnet init: kaiming_normal(fan_out, relu)
def resnet_conv_init(key, shape, dtype=jnp.float32):
    fan_out = shape[0] * shape[1] * shape[3]
    std = jnp.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1) with -inf padding.

    Uses flax's max_pool wrapper so the max-monoid reduce_window stays
    reverse-mode differentiable (a raw reduce_window with an array init
    value loses its transpose rule)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _conv(x, features, kernel, stride, name, dtype):
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), use_bias=False,
        dtype=dtype, param_dtype=jnp.float32,
        kernel_init=resnet_conv_init, name=name,
    )(x)


def _bn(x, train, name, dtype):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )(x)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3 -> bn -> relu -> conv3x3 -> bn -> +id -> relu."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _conv(x, self.features, 3, self.stride, "conv1", self.dtype)
        out = _bn(out, train, "bn1", self.dtype)
        out = nn.relu(out)
        out = _conv(out, self.features, 3, 1, "conv2", self.dtype)
        out = _bn(out, train, "bn2", self.dtype)
        if self.downsample:
            identity = _conv(x, self.features, 1, self.stride,
                             "downsample_conv", self.dtype)
            identity = _bn(identity, train, "downsample_bn", self.dtype)
        return nn.relu(out + identity)


class ResNet34Encoder(nn.Module):
    """5-stage feature pyramid (f1..f5) as consumed by the U-Net decoder.

    Returns [f1, f2, f3, f4, f5] at strides [2, 4, 8, 16, 32] with channels
    [64, 64, 128, 256, 512] (SURVEY §3.4)."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=resnet_conv_init, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn1",
        )(x)
        f1 = nn.relu(x)

        x = max_pool_3x3_s2(f1)
        feats = []
        for li, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                down = (bi == 0) and (li > 0)
                x = BasicBlock(
                    width, stride=stride, downsample=down, dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
            feats.append(x)
        f2, f3, f4, f5 = feats
        return f1, f2, f3, f4, f5
