"""Multi-block stage parity: shifted windows + patch merging vs a torch oracle.

The block-level parity tests cover unshifted single-window attention; this
covers the risky geometry: cyclic shift + attention masks across windows and
the 2x2 patch-merge ordering, over a 2-stage Swin-V1 encoder with converted
weights."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from avmoe_tpu.checkpoint import convert as cv
from avmoe_tpu.ops.swin import (
    SwinBlock,
    PatchMergingV1,
    relative_position_index,
    shifted_window_mask,
)


def make_linear(rng, name, din, dout, sd, bias=True, scale=0.05):
    sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32) * scale
    if bias:
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32) * scale


def make_ln(rng, name, dim, sd):
    sd[f"{name}.weight"] = 1.0 + 0.1 * rng.randn(dim).astype(np.float32)
    sd[f"{name}.bias"] = 0.1 * rng.randn(dim).astype(np.float32)


def make_block_sd(rng, prefix, dim, heads, window, sd):
    make_ln(rng, prefix + "norm1", dim, sd)
    make_ln(rng, prefix + "norm2", dim, sd)
    make_linear(rng, prefix + "attn.qkv", dim, 3 * dim, sd)
    make_linear(rng, prefix + "attn.proj", dim, dim, sd)
    sd[prefix + "attn.relative_position_bias_table"] = \
        rng.randn((2 * window - 1) ** 2, heads).astype(np.float32) * 0.1
    make_linear(rng, prefix + "mlp.fc1", dim, 4 * dim, sd)
    make_linear(rng, prefix + "mlp.fc2", 4 * dim, dim, sd)


def torch_window_attn(s, x, dim, heads, window, H, W, shift):
    """Oracle: one pre-norm Swin-V1 block with optional cyclic shift."""
    t = lambda k: torch.from_numpy(np.ascontiguousarray(s[k]))
    B, L, C = x.shape
    h = F.layer_norm(x, (dim,), t("norm1.weight"), t("norm1.bias"))
    g = h.reshape(B, H, W, C)
    if shift:
        g = torch.roll(g, (-shift, -shift), dims=(1, 2))
    # partition
    g = g.reshape(B, H // window, window, W // window, window, C)
    wins = g.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)
    N = window * window
    qkv = wins @ t("attn.qkv.weight").T + t("attn.qkv.bias")
    q, k, v = qkv.reshape(-1, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(window, window).astype(np.int64))
    bias = t("attn.relative_position_bias_table")[idx.reshape(-1)]
    attn = attn + bias.reshape(N, N, heads).permute(2, 0, 1)[None]
    if shift:
        mask = torch.from_numpy(shifted_window_mask(H, W, window, shift))
        nW = mask.shape[0]
        attn = attn.reshape(-1, nW, heads, N, N) + mask[None, :, None]
        attn = attn.reshape(-1, heads, N, N)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(-1, N, C)
    out = out @ t("attn.proj.weight").T + t("attn.proj.bias")
    # reverse
    g = out.reshape(B, H // window, W // window, window, window, C)
    g = g.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    if shift:
        g = torch.roll(g, (shift, shift), dims=(1, 2))
    x = x + g.reshape(B, L, C)
    h = F.layer_norm(x, (dim,), t("norm2.weight"), t("norm2.bias"))
    h = F.gelu(h @ t("mlp.fc1.weight").T + t("mlp.fc1.bias"))
    return x + h @ t("mlp.fc2.weight").T + t("mlp.fc2.bias")


def torch_patch_merge(s, x, H, W):
    t = lambda k: torch.from_numpy(np.ascontiguousarray(s[k]))
    B, L, C = x.shape
    g = x.reshape(B, H, W, C)
    x0 = g[:, 0::2, 0::2]
    x1 = g[:, 1::2, 0::2]
    x2 = g[:, 0::2, 1::2]
    x3 = g[:, 1::2, 1::2]
    cat = torch.cat([x0, x1, x2, x3], -1).reshape(B, -1, 4 * C)
    cat = F.layer_norm(cat, (4 * C,), t("norm.weight"), t("norm.bias"))
    return cat @ t("reduction.weight").T


def test_two_stage_shifted_parity():
    rng = np.random.RandomState(3)
    dim, heads, window, H = 8, 2, 2, 8
    sd = {}
    for i, _ in enumerate(range(2)):
        make_block_sd(rng, f"layers.0.blocks.{i}.", dim, heads, window, sd)
    make_ln(rng, "layers.0.downsample.norm", 4 * dim, sd)
    sd["layers.0.downsample.reduction.weight"] = \
        rng.randn(2 * dim, 4 * dim).astype(np.float32) * 0.05
    make_block_sd(rng, "layers.1.blocks.0.", 2 * dim, heads, window, sd)
    full = {**sd,
            "bn0.weight": np.ones(1), "bn0.bias": np.zeros(1),
            "bn0.running_mean": np.zeros(1), "bn0.running_var": np.ones(1),
            "patch_embed.proj.weight": np.zeros((1, 1, 1, 1), np.float32),
            "patch_embed.proj.bias": np.zeros(1, np.float32),
            "norm.weight": np.ones(1), "norm.bias": np.zeros(1)}
    params, _ = cv.convert_htsat(full, depths=(2, 1))

    x = rng.randn(2, H * H, dim).astype(np.float32)

    # ours: block (no shift) -> block (shift) -> merge -> block
    blk0 = SwinBlock(dim=dim, input_resolution=(H, H), num_heads=heads,
                     window_size=window, shift_size=0, version="v1")
    blk1 = SwinBlock(dim=dim, input_resolution=(H, H), num_heads=heads,
                     window_size=window, shift_size=window // 2, version="v1")
    merge = PatchMergingV1(input_resolution=(H, H))
    blk2 = SwinBlock(dim=2 * dim, input_resolution=(H // 2, H // 2),
                     num_heads=heads, window_size=window, shift_size=0,
                     version="v1")
    y = blk0.apply({"params": params["block_0_0"]}, jnp.asarray(x))
    y = blk1.apply({"params": params["block_0_1"]}, y)
    y = merge.apply({"params": params["downsample_0"]}, y)
    y = blk2.apply({"params": params["block_1_0"]}, y)

    # oracle
    xt = torch.from_numpy(x)
    p0 = {k[len("layers.0.blocks.0."):]: v for k, v in sd.items()
          if k.startswith("layers.0.blocks.0.")}
    p1 = {k[len("layers.0.blocks.1."):]: v for k, v in sd.items()
          if k.startswith("layers.0.blocks.1.")}
    pm = {k[len("layers.0.downsample."):]: v for k, v in sd.items()
          if k.startswith("layers.0.downsample.")}
    p2 = {k[len("layers.1.blocks.0."):]: v for k, v in sd.items()
          if k.startswith("layers.1.blocks.0.")}
    zt = torch_window_attn(p0, xt, dim, heads, window, H, H, 0)
    zt = torch_window_attn(p1, zt, dim, heads, window, H, H, window // 2)
    zt = torch_patch_merge(pm, zt, H, H)
    zt = torch_window_attn(p2, zt, 2 * dim, heads, window, H // 2, H // 2, 0)

    np.testing.assert_allclose(np.asarray(y), zt.numpy(), rtol=3e-4, atol=3e-4)
