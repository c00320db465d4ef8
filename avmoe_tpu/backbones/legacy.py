"""Legacy backbone variants carried for reference parity.

  * ResNet18/34-style BasicBlock network - the grounding-gen visual_net
    (ref: AVMOE/AVQA/grounding_gen/visual_net.py:117-231)
  * NetVLAD pooling + AVENet audio CNN head (ref: AVMOE/AVE/nets/
    Resnet_VGGSound.py:8-220 - VGGSound audio encoder, unused by the v3 models
    but part of the reference surface)
  * PHMLinear - parameterized-hypercomplex-multiplication linear layer
    (ref: AVMOE/AVE/nets/my_layers.py:38; Kronecker-factored weight)
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.backbones.resnet import ResNetStage


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, name=name)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != y.shape[-1] or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """BasicBlock ResNet-18 (grounding-gen visual_net.py:117-231).

    The reference's grounding variant keeps layer4 at stride 1 and returns
    the spatial feature map (visual_net.py:35,197-209); set num_classes for
    the pooled classifier head instead."""

    num_classes: int = 0
    depths: Sequence[int] = (2, 2, 2, 2)
    layer4_stride: int = 1
    return_map: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = 64
        for s, d in enumerate(self.depths):
            for i in range(d):
                stride = 1
                if s > 0 and i == 0:
                    stride = self.layer4_stride if s == 3 else 2
                x = BasicBlock(feats, stride=stride,
                               name=f"layer{s + 1}_{i}")(x, train=train)
            feats *= 2
        if self.return_map:
            return x
        pooled = x.mean(axis=(1, 2))
        if self.num_classes:
            return nn.Dense(self.num_classes, name="fc")(pooled)
        return pooled


class NetVLAD(nn.Module):
    """NetVLAD pooling (ref: Resnet_VGGSound.py:172-220)."""

    num_clusters: int = 8
    dim: int = 512
    alpha: float = 100.0

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        centroids = self.param("centroids", nn.initializers.uniform(1.0),
                               (self.num_clusters, self.dim))
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        soft = nn.Conv(self.num_clusters, (1, 1), use_bias=True, name="conv")(xn)
        soft = jax.nn.softmax(soft.reshape(B, -1, self.num_clusters), axis=-1)
        flat = xn.reshape(B, -1, C)
        vlad = jnp.einsum("bnk,bnc->bkc", soft, flat) \
            - soft.sum(axis=1)[..., None] * centroids[None]
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        vlad = vlad.reshape(B, -1)
        return vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)


class AVENet(nn.Module):
    """ResNet18 audio encoder + NetVLAD (VGGSound AVENet shape)."""

    embed_dim: int = 512

    @nn.compact
    def __call__(self, spec, *, train: bool = False):  # (B, T, F, 1)
        feats = ResNet18(name="audnet")(spec, train=train)
        return nn.Dense(self.embed_dim, name="proj")(feats)


class SimpleViT(nn.Module):
    """Minimal non-hierarchical ViT encoder (ref: AVMOE/AVE/nets/my_vit.py:61 -
    a legacy/unused plain-ViT variant kept for surface parity)."""

    embed_dim: int = 192
    depth: int = 4
    num_heads: int = 3
    patch: int = 16
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):  # (B, H, W, 3)
        from avmoe_tpu.ops.swin import Mlp

        B = x.shape[0]
        x = nn.Conv(self.embed_dim, (self.patch, self.patch),
                    strides=self.patch, name="patch_embed")(x)
        x = x.reshape(B, -1, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, x.shape[1], self.embed_dim))
        x = x + pos
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, deterministic=dropout_det(train),
                name=f"attn_{i}")(h, h)
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x)
            x = x + Mlp(int(self.embed_dim * self.mlp_ratio), self.embed_dim,
                        name=f"mlp_{i}")(h, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class PHMLinear(nn.Module):
    """Parameterized hypercomplex linear: W = sum_i A_i (x) S_i
    (Kronecker products of small learned factors; ref: my_layers.py:38)."""

    n: int
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        n = self.n
        assert self.in_features % n == 0 and self.out_features % n == 0
        a = self.param("A", nn.initializers.normal(0.02), (n, n, n))
        s = self.param("S", nn.initializers.normal(0.02),
                       (n, self.out_features // n, self.in_features // n))
        # kron(A_i, S_i) summed over i -> (out, in)
        w = jnp.einsum("ipq,irs->iprqs", a, s).sum(0)
        w = w.reshape(self.out_features, self.in_features)
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return x @ w.T + b
