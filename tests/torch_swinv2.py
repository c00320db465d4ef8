"""Minimal timm-0.6.12-layout SwinTransformerV2 in torch, for parity tests.

The reference consumes `timm.create_model('swinv2_large_window12_192_22k')`
piecewise (blk._attn/.norm1/.mlp/.drop_path1/2, layer.downsample, .norm;
ref: AVMOE/AVE/nets/net_trans_v3.py:513, 646, 688-730). timm is not installed
here, so this module re-creates that exact API + semantics (cosine window
attention, CPB MLP, post-norm blocks, reduction-then-norm PatchMerging) with
timm's state_dict naming, so `checkpoint.convert.convert_swinv2_timm` applies
verbatim. It exists so the reference's OWN orchestration code (MMIL_Net.
forward_swin) can run against it in tests/test_reference_parity.py.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from avmoe_tpu.ops.swin import (
    log_cpb_coords_table,
    relative_position_index,
    shifted_window_mask,
)


def _window_partition(x, window):
    B, H, W, C = x.shape
    x = x.view(B, H // window, window, W // window, window, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _window_reverse(wins, window, H, W):
    C = wins.shape[-1]
    B = wins.shape[0] // ((H // window) * (W // window))
    x = wins.view(B, H // window, W // window, window, window, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class WindowAttention(nn.Module):
    def __init__(self, dim, window_size, num_heads, pretrained_window_size=(0, 0)):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.window_size = window_size
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones((num_heads, 1, 1))))
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
            nn.Linear(512, num_heads, bias=False))
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        coords = log_cpb_coords_table(
            window_size[0], window_size[1],
            pretrained_window_size[0], pretrained_window_size[1])
        self.register_buffer("coords_table", torch.from_numpy(np.asarray(coords)),
                             persistent=False)
        idx = relative_position_index(window_size[0], window_size[1]).astype(np.int64)
        self.register_buffer("rel_index", torch.from_numpy(idx), persistent=False)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        H = self.num_heads
        qkv_bias = torch.cat((self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B_, N, 3, H, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale, max=math.log(100.0)).exp()
        attn = attn * scale
        bias = self.cpb_mlp(self.coords_table)[self.rel_index.reshape(-1)]
        bias = bias.reshape(N, N, H).permute(2, 0, 1)
        attn = attn + 16.0 * torch.sigmoid(bias).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, H, N, N) + mask[None, :, None]
            attn = attn.view(B_, H, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class SwinTransformerBlock(nn.Module):
    def __init__(self, dim, input_resolution, num_heads, window_size, shift_size,
                 mlp_ratio=4.0, pretrained_window_size=0):
        super().__init__()
        self.dim = dim
        self.input_resolution = tuple(input_resolution)
        # timm _calc_window_shift: shrink to resolution, no shift then
        if min(self.input_resolution) <= window_size:
            window_size = min(self.input_resolution)
            shift_size = 0
        self.window_size, self.shift_size = window_size, shift_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(
            dim, (window_size, window_size), num_heads,
            (pretrained_window_size, pretrained_window_size))
        self.drop_path1 = nn.Identity()
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.drop_path2 = nn.Identity()
        mask = shifted_window_mask(*self.input_resolution, window_size, shift_size)
        if mask is not None:
            self.register_buffer("attn_mask", torch.from_numpy(mask), persistent=False)
        else:
            self.attn_mask = None

    def _attn(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        xg = x.view(B, H, W, C)
        if self.shift_size > 0:
            xg = torch.roll(xg, (-self.shift_size, -self.shift_size), dims=(1, 2))
        wins = _window_partition(xg, self.window_size)
        wins = self.attn(wins, mask=self.attn_mask)
        xg = _window_reverse(wins, self.window_size, H, W)
        if self.shift_size > 0:
            xg = torch.roll(xg, (self.shift_size, self.shift_size), dims=(1, 2))
        return xg.reshape(B, L, C)

    def forward(self, x):
        x = x + self.drop_path1(self.norm1(self._attn(x)))
        x = x + self.drop_path2(self.norm2(self.mlp(x)))
        return x


class PatchMerging(nn.Module):
    """timm swinv2: reduction (4C->2C, no bias) THEN norm(2C)."""

    def __init__(self, input_resolution, dim):
        super().__init__()
        self.input_resolution = tuple(input_resolution)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.norm(self.reduction(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, input_resolution, depth, num_heads, window_size,
                 mlp_ratio=4.0, downsample=False, pretrained_window_size=0):
        super().__init__()
        self.input_resolution = tuple(input_resolution)
        self.blocks = nn.ModuleList([
            SwinTransformerBlock(
                dim, input_resolution, num_heads, window_size,
                0 if (i % 2 == 0) else window_size // 2,
                mlp_ratio, pretrained_window_size)
            for i in range(depth)])
        self.downsample = (PatchMerging(input_resolution, dim)
                           if downsample else nn.Identity())

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return self.downsample(x)


class PatchEmbed(nn.Module):
    def __init__(self, img_size, patch_size, in_chans, embed_dim):
        super().__init__()
        self.grid_size = (img_size // patch_size, img_size // patch_size)
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size, patch_size)
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):  # (B, C, H, W) -> (B, N, D)
        x = self.proj(x).flatten(2).transpose(1, 2)
        return self.norm(x)


class SwinTransformerV2(nn.Module):
    """timm-layout SwinV2: .patch_embed, .layers[i].blocks[j], .norm."""

    def __init__(self, img_size=64, patch_size=4, in_chans=3, embed_dim=16,
                 depths=(2, 2, 18, 2), num_heads=(2, 2, 2, 2), window_size=4,
                 mlp_ratio=4.0, pretrained_window_sizes=(0, 0, 0, 0)):
        super().__init__()
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans, embed_dim)
        res = self.patch_embed.grid_size
        self.layers = nn.ModuleList()
        dim = embed_dim
        for i, depth in enumerate(depths):
            self.layers.append(BasicLayer(
                dim, res, depth, num_heads[i], window_size, mlp_ratio,
                downsample=i < len(depths) - 1,
                pretrained_window_size=pretrained_window_sizes[i]))
            if i < len(depths) - 1:
                dim *= 2
                res = (res[0] // 2, res[1] // 2)
        self.num_features = dim
        self.norm = nn.LayerNorm(dim)

    def forward_features(self, x):
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)

    def forward(self, x):
        return self.forward_features(x)
