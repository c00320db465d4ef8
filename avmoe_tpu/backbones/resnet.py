"""ResNet-50 visual backbone (channels-last) for the original AVSBench models.

Re-creation of B2_ResNet (ref: AVMOE/AVS/avs_scripts/avs_s4/model/resnet.py:
82-140): a standard ResNet-50 stem + layers 1-2, with the 3_1/4_1 branch used
by the AVS encoder; returns the 4-level feature pyramid
{256x56x56, 512x28x28, 1024x14x14, 2048x7x7} (ref usage:
ResNet_AVSModel.py:214-221)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape[-1] != y.shape[-1] or self.stride != 1:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    features: int
    blocks: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.blocks):
            x = Bottleneck(self.features, stride=self.stride if i == 0 else 1,
                           name=f"block_{i}")(x, train=train)
        return x


class B2ResNet(nn.Module):
    """Stem + layer1/2 shared; (layer3_1, layer4_1) and (layer3_2, layer4_2)
    branches, matching the reference's naming (avs_s4/model/resnet.py:95-100)."""

    depths: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, *, train: bool = False, branch: int = 1
                 ) -> List[jax.Array]:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x1 = ResNetStage(64, self.depths[0], 1, name="layer1")(x, train=train)
        x2 = ResNetStage(128, self.depths[1], 2, name="layer2")(x1, train=train)
        suffix = "_1" if branch == 1 else "_2"
        x3 = ResNetStage(256, self.depths[2], 2,
                         name=f"layer3{suffix}")(x2, train=train)
        x4 = ResNetStage(512, self.depths[3], 2,
                         name=f"layer4{suffix}")(x3, train=train)
        return [x1, x2, x3, x4]
