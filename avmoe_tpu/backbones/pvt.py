"""PVT-v2 visual backbone (channels-last) for the original AVSBench models.

Re-creation of PyramidVisionTransformerV2 (ref: AVMOE/AVS/avs_scripts/avs_s4/
model/pvt.py:218-425): overlapping patch embeds, spatial-reduction attention,
depthwise-conv MLPs; b0..b5 constructors. Returns the 4-level pyramid."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.ops.swin import DropPath


class DWConv(nn.Module):
    """3x3 depthwise conv on token grids (ref pvt.py DWConv)."""

    dim: int

    @nn.compact
    def __call__(self, x, h: int, w: int):
        B, N, C = x.shape
        g = x.reshape(B, h, w, C)
        g = nn.Conv(C, (3, 3), padding=1, feature_group_count=C, name="dwconv")(g)
        return g.reshape(B, N, C)


class PVTMlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, h: int, w: int, *, train: bool = False):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = DWConv(self.hidden, name="dwconv")(x, h, w)
        x = nn.gelu(x)
        x = nn.Dropout(self.drop, deterministic=dropout_det(train))(x)
        x = nn.Dense(self.out, name="fc2")(x)
        return nn.Dropout(self.drop, deterministic=dropout_det(train))(x)


class SRAttention(nn.Module):
    """Spatial-reduction attention: keys/values from an sr x sr strided conv
    + LayerNorm of the token grid (ref pvt.py Attention)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, h: int, w: int, *, train: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        q = nn.Dense(C, name="q")(x).reshape(B, N, H, D)
        if self.sr_ratio > 1:
            g = x.reshape(B, h, w, C)
            g = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                        strides=self.sr_ratio, name="sr")(g)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="norm")(g.reshape(B, -1, C))
        else:
            kv_in = x
        kv = nn.Dense(2 * C, name="kv")(kv_in).reshape(B, -1, 2, H, D)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bshd->bhns", q, k) * (D ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=dropout_det(train))(attn)
        out = jnp.einsum("bhns,bshd->bnhd", attn, v).reshape(B, N, C)
        out = nn.Dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=dropout_det(train))(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, h: int, w: int, *, train: bool = False):
        dp = DropPath(self.drop_path)
        x = x + dp(SRAttention(self.dim, self.num_heads, self.sr_ratio,
                               name="attn")(nn.LayerNorm(epsilon=1e-6, name="norm1")(x), h, w,
                                            train=train), train=train)
        x = x + dp(PVTMlp(int(self.dim * self.mlp_ratio), self.dim,
                          name="mlp")(nn.LayerNorm(epsilon=1e-6, name="norm2")(x), h, w,
                                      train=train), train=train)
        return x


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, int, int]:
        pad = self.patch // 2
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=self.stride,
                    padding=pad, name="proj")(x)
        B, H, W, C = x.shape
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x.reshape(B, H * W, C)), H, W


class PVTv2(nn.Module):
    """4-stage PVT-v2; returns channels-last pyramid maps."""

    dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    depths: Sequence[int] = (3, 6, 40, 3)       # b5
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jax.Array]:
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outs = []
        k = 0
        for s in range(4):
            x, h, w = OverlapPatchEmbed(
                self.dims[s], patch=7 if s == 0 else 3,
                stride=4 if s == 0 else 2, name=f"patch_embed{s + 1}")(x)
            for i in range(self.depths[s]):
                x = PVTBlock(self.dims[s], self.num_heads[s],
                             self.mlp_ratios[s], self.sr_ratios[s], dpr[k],
                             name=f"block{s + 1}_{i}")(x, h, w, train=train)
                k += 1
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{s + 1}")(x)
            x = x.reshape(x.shape[0], h, w, self.dims[s])
            outs.append(x)
        return outs


def pvt_v2_b0() -> PVTv2:
    return PVTv2(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                 mlp_ratios=(8, 8, 4, 4))


def pvt_v2_b2() -> PVTv2:
    return PVTv2(depths=(3, 4, 6, 3), mlp_ratios=(8, 8, 4, 4))


def pvt_v2_b5() -> PVTv2:
    return PVTv2(depths=(3, 6, 40, 3))
