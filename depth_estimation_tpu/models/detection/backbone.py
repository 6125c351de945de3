"""ResNet backbones + FPN neck, flax — detection feature extraction.

Capability counterparts of the reference's two backbone stacks
(`Mask_RCNN/mrcnn/model.py:171-211` `resnet_graph` and
`mask-rcnn.pytorch/lib/modeling/ResNet.py:17-116` bodies;
`lib/modeling/FPN.py:73-260` top-down+lateral). TPU-first choices:
channels-last NHWC, bf16-friendly, two norm modes:

- ``norm='gn'`` (default): GroupNorm — train-from-scratch mode, same
  train/infer parity the reference gets by freezing BN
  (`lib/modeling/ResNet.py:197-` GN variants).
- ``norm='affine'``: frozen per-channel affine — exactly what Detectron
  runs at train AND test time (`lib/nn/AffineChannel2d`, BN statistics
  pre-folded); the target of pretrained-weight import
  (`utils/weights.py`).

Paddings are explicit and torch/Caffe2-aligned (stem 7×7 pad 3, 3×3
convs pad 1, stem pool pad 1) so imported weights reproduce the source
network's activations; identical output shapes to XLA SAME padding.

Returns the C2..C5 pyramid; `FPN` produces P2..P6 at `out_dim` channels.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AffineChannel", "ResNet", "FPN", "resnet50_fpn"]


class AffineChannel(nn.Module):
    """Per-channel scale·x + bias — frozen BatchNorm with the statistics
    folded in (Detectron `AffineChannel2d` semantics)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


def _norm(kind: str):
    if kind == "gn":
        return nn.GroupNorm(num_groups=32)
    if kind == "affine":
        return AffineChannel()
    raise ValueError(f"unknown norm {kind!r}")


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 residual block.

    ``stride_1x1`` picks where the spatial stride lives: ``False`` is the
    torchvision convention (stride on the 3×3), ``True`` is the
    Caffe2/Detectron default (`RESNETS.STRIDE_1X1=True`,
    `lib/modeling/ResNet.py:254`) and the Matterport Keras `conv_block`
    (stride on branch2a) — required for pretrained-weight imports from
    those sources to reproduce the source network's activations. The
    projection shortcut carries the stride in both conventions."""

    width: int
    stride: int = 1
    norm: str = "gn"
    stride_1x1: bool = False

    @nn.compact
    def __call__(self, x):
        out_dim = self.width * 4
        residual = x
        s1, s3 = ((self.stride, 1) if self.stride_1x1 else (1, self.stride))
        y = nn.Conv(self.width, (1, 1), strides=(s1, s1), use_bias=False)(x)
        y = _norm(self.norm)(y)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(s3, s3),
                    padding=((1, 1), (1, 1)), use_bias=False)(y)
        y = _norm(self.norm)(y)
        y = nn.relu(y)
        y = nn.Conv(out_dim, (1, 1), use_bias=False)(y)
        y = _norm(self.norm)(y)
        if residual.shape[-1] != out_dim or self.stride != 1:
            residual = nn.Conv(out_dim, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = _norm(self.norm)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Bottleneck ResNet body; `blocks=(3,4,6,3)` is ResNet-50."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64
    norm: str = "gn"
    stride_1x1: bool = False

    @nn.compact
    def __call__(self, x):  # (1, h, w, 3) → [C2, C3, C4, C5]
        y = nn.Conv(self.base_width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False)(x)
        y = _norm(self.norm)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        width = self.base_width
        for stage, nblocks in enumerate(self.blocks):
            stride = 1 if stage == 0 else 2
            y = Bottleneck(width, stride=stride, norm=self.norm,
                           stride_1x1=self.stride_1x1)(y)
            for _ in range(nblocks - 1):
                y = Bottleneck(width, norm=self.norm,
                               stride_1x1=self.stride_1x1)(y)
            feats.append(y)
            width *= 2
        return feats


class FPN(nn.Module):
    """Top-down + lateral feature pyramid (`lib/modeling/FPN.py:73-260`):
    P2..P5 from C2..C5 plus P6 by stride-2 subsampling of P5."""

    out_dim: int = 256

    @nn.compact
    def __call__(self, feats):
        laterals = [nn.Conv(self.out_dim, (1, 1))(c) for c in feats]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(outs[0], lat.shape, method="nearest")
            outs.insert(0, lat + up)
        pyramid = [nn.Conv(self.out_dim, (3, 3), padding="SAME")(p) for p in outs]
        p6 = nn.max_pool(pyramid[-1], (1, 1), strides=(2, 2))
        return pyramid + [p6]  # [P2, P3, P4, P5, P6]


class ResNetFPN(nn.Module):
    blocks: Sequence[int] = (3, 4, 6, 3)
    out_dim: int = 256
    norm: str = "gn"
    stride_1x1: bool = False
    base_width: int = 64

    @nn.compact
    def __call__(self, x):
        body = ResNet(self.blocks, base_width=self.base_width,
                      norm=self.norm, stride_1x1=self.stride_1x1)
        return FPN(self.out_dim)(body(x))


def resnet50_fpn(out_dim: int = 256) -> ResNetFPN:
    return ResNetFPN(blocks=(3, 4, 6, 3), out_dim=out_dim)
