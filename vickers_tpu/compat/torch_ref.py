"""Pure-torch oracle model with smp-compatible state-dict keys.

``segmentation_models_pytorch`` and ``torchvision`` are not installed in this
environment, but parity testing against the reference's ``best.pth`` format
(SURVEY §3.4 state-dict namespaces) still needs a torch implementation whose
``state_dict()`` keys match smp.Unet('resnet34', classes=1) exactly:

  encoder.conv1 / encoder.bn1 / encoder.layer{1..4}.{i}.conv{1,2} (+ bn,
  downsample.0/.1), decoder.blocks.{0..4}.conv{1,2}.{0,1},
  segmentation_head.0

This module is used (a) as the golden oracle in model-parity tests (random
init -> convert -> compare forwards) and (b) as the load target for real
``best.pth`` checkpoints before conversion to Flax params.  CPU-only, eval
use; it is a clean-room reimplementation from the documented smp/torchvision
architecture, not a copy of either.
"""

from __future__ import annotations

from typing import List, Optional

import torch
import torch.nn as nn
import torch.nn.functional as F


class _BasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class _ResNet34Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(cin, cout, n, stride):
            blocks = [_BasicBlock(cin, cout, stride)]
            blocks += [_BasicBlock(cout, cout) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, 3, 1)
        self.layer2 = stage(64, 128, 4, 2)
        self.layer3 = stage(128, 256, 6, 2)
        self.layer4 = stage(256, 512, 3, 2)

    def forward(self, x) -> List[torch.Tensor]:
        f1 = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(f1)
        f2 = self.layer1(x)
        f3 = self.layer2(f2)
        f4 = self.layer3(f3)
        f5 = self.layer4(f4)
        return [f1, f2, f3, f4, f5]


class _DecoderBlock(nn.Module):
    def __init__(self, cin: int, skip: int, cout: int):
        super().__init__()
        # smp Conv2dReLU == Sequential(conv, bn, relu): keys convN.0 / convN.1
        self.conv1 = nn.Sequential(
            nn.Conv2d(cin + skip, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )
        self.conv2 = nn.Sequential(
            nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )

    def forward(self, x, skip: Optional[torch.Tensor]):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class _UnetDecoder(nn.Module):
    def __init__(self, enc_channels=(64, 64, 128, 256, 512),
                 dec_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        head_ch = enc_channels[-1]
        skip_chs = list(enc_channels[:-1][::-1]) + [0]   # (256,128,64,64,0) skips f4,f3,f2,f1,None
        in_chs = [head_ch] + list(dec_channels[:-1])
        self.blocks = nn.ModuleList(
            [_DecoderBlock(i, s, o) for i, s, o in zip(in_chs, skip_chs, dec_channels)]
        )

    def forward(self, feats: List[torch.Tensor]):
        f1, f2, f3, f4, f5 = feats
        skips = [f4, f3, f2, f1, None]
        x = f5
        for block, skip in zip(self.blocks, skips):
            x = block(x, skip)
        return x


class TorchUNetR34(nn.Module):
    """State-dict-compatible stand-in for smp.Unet('resnet34', classes=1)."""

    def __init__(self, classes: int = 1):
        super().__init__()
        self.encoder = _ResNet34Encoder()
        self.decoder = _UnetDecoder()
        self.segmentation_head = nn.Sequential(nn.Conv2d(16, classes, 3, 1, 1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(self.encoder(x)))


def build_torch_model(classes: int = 1) -> TorchUNetR34:
    m = TorchUNetR34(classes=classes)
    m.eval()
    return m


def load_pth(path: str, classes: int = 1) -> TorchUNetR34:
    """Load a reference checkpoint (best.pth / last.pth, train.py:668-678)
    into the oracle model, with the weights_only fallback of
    infer_pth_gui.py:35-43."""
    m = build_torch_model(classes)
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    m.load_state_dict(sd, strict=True)
    m.eval()
    return m
