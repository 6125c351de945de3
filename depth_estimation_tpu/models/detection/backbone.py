"""ResNet backbones + FPN neck, flax — detection feature extraction.

Capability counterparts of the reference's two backbone stacks
(`Mask_RCNN/mrcnn/model.py:171-211` `resnet_graph` and
`mask-rcnn.pytorch/lib/modeling/ResNet.py:17-116` bodies;
`lib/modeling/FPN.py:73-260` top-down+lateral). TPU-first choices:
channels-last NHWC, GroupNorm instead of frozen BatchNorm (the reference
freezes BN at train time anyway — GN gives the same train/infer parity
without statistics plumbing), bf16-friendly.

Returns the C2..C5 pyramid; `FPN` produces P2..P6 at `out_dim` channels.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResNet", "FPN", "resnet50_fpn"]


class Bottleneck(nn.Module):
    width: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_dim = self.width * 4
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False)(x)
        y = nn.GroupNorm(num_groups=32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32)(y)
        y = nn.relu(y)
        y = nn.Conv(out_dim, (1, 1), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32)(y)
        if residual.shape[-1] != out_dim or self.stride != 1:
            residual = nn.Conv(out_dim, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = nn.GroupNorm(num_groups=32)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Bottleneck ResNet body; `blocks=(3,4,6,3)` is ResNet-50."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64

    @nn.compact
    def __call__(self, x):  # (1, h, w, 3) → [C2, C3, C4, C5]
        y = nn.Conv(self.base_width, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False)(x)
        y = nn.GroupNorm(num_groups=32)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        width = self.base_width
        for stage, nblocks in enumerate(self.blocks):
            stride = 1 if stage == 0 else 2
            y = Bottleneck(width, stride=stride)(y)
            for _ in range(nblocks - 1):
                y = Bottleneck(width)(y)
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

    @nn.compact
    def __call__(self, x):
        return FPN(self.out_dim)(ResNet(self.blocks)(x))


def resnet50_fpn(out_dim: int = 256) -> ResNetFPN:
    return ResNetFPN(blocks=(3, 4, 6, 3), out_dim=out_dim)
