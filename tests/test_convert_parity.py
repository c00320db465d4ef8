"""Numerical parity: converted torch-style weights through our flax blocks
must match independent torch-computed oracles.

These tests build random weights in the torch state_dict naming scheme the
converters expect, graft them into flax modules, and check outputs against a
from-the-math torch implementation (not reference code) of the same ops.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import traverse_util

from avmoe_tpu.checkpoint import convert as cv
from avmoe_tpu.ops.swin import SwinBlock, relative_position_index


def make_linear(rng, name, din, dout, sd, bias=True):
    sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32) * 0.05
    if bias:
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32) * 0.05


def make_ln(rng, name, dim, sd):
    sd[f"{name}.weight"] = 1.0 + 0.1 * rng.randn(dim).astype(np.float32)
    sd[f"{name}.bias"] = 0.1 * rng.randn(dim).astype(np.float32)


def torch_v1_block(sd, x, dim, heads, window, resolution):
    """Oracle: pre-norm Swin-V1 block, no shift (window == resolution)."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    xt = torch.from_numpy(x)
    B, L, C = xt.shape

    h = F.layer_norm(xt, (dim,), t["norm1.weight"], t["norm1.bias"])
    # single window spanning the whole grid
    qkv = h @ t["attn.qkv.weight"].T + t["attn.qkv.bias"]
    q, k, v = qkv.reshape(B, L, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(window, window).astype(np.int64))
    bias = t["attn.relative_position_bias_table"][idx.reshape(-1)]
    bias = bias.reshape(L, L, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], dim=-1)
    h = (attn @ v).transpose(1, 2).reshape(B, L, C)
    h = h @ t["attn.proj.weight"].T + t["attn.proj.bias"]
    xt = xt + h
    h = F.layer_norm(xt, (dim,), t["norm2.weight"], t["norm2.bias"])
    h = F.gelu(h @ t["mlp.fc1.weight"].T + t["mlp.fc1.bias"])
    h = h @ t["mlp.fc2.weight"].T + t["mlp.fc2.bias"]
    return (xt + h).numpy()


def test_swin_v1_block_parity():
    rng = np.random.RandomState(0)
    dim, heads, window = 16, 2, 4
    sd = {}
    make_ln(rng, "layers.0.blocks.0.norm1", dim, sd)
    make_ln(rng, "layers.0.blocks.0.norm2", dim, sd)
    make_linear(rng, "layers.0.blocks.0.attn.qkv", dim, 3 * dim, sd)
    make_linear(rng, "layers.0.blocks.0.attn.proj", dim, dim, sd)
    sd["layers.0.blocks.0.attn.relative_position_bias_table"] = \
        rng.randn((2 * window - 1) ** 2, heads).astype(np.float32) * 0.1
    make_linear(rng, "layers.0.blocks.0.mlp.fc1", dim, 4 * dim, sd)
    make_linear(rng, "layers.0.blocks.0.mlp.fc2", 4 * dim, dim, sd)

    blk = SwinBlock(dim=dim, input_resolution=(window, window), num_heads=heads,
                    window_size=window, shift_size=0, version="v1")
    x = rng.randn(2, window * window, dim).astype(np.float32)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # graft converted weights
    params, _ = cv.convert_htsat(
        {**sd,
         "bn0.weight": np.ones(1), "bn0.bias": np.zeros(1),
         "bn0.running_mean": np.zeros(1), "bn0.running_var": np.ones(1),
         "patch_embed.proj.weight": np.zeros((1, 1, 1, 1), np.float32),
         "patch_embed.proj.bias": np.zeros(1, np.float32),
         "norm.weight": np.ones(1), "norm.bias": np.zeros(1)},
        depths=(1,),
    )
    block_params = params["block_0_0"]
    flat_tgt = traverse_util.flatten_dict(variables["params"])
    flat_src = traverse_util.flatten_dict(block_params)
    assert set(flat_src) == set(flat_tgt)
    for k in flat_tgt:
        assert flat_tgt[k].shape == flat_src[k].shape, k
    ours = blk.apply({"params": block_params}, jnp.asarray(x))

    expected = torch_v1_block(
        {k[len("layers.0.blocks.0."):]: v for k, v in sd.items()
         if k.startswith("layers.0.blocks.0.")},
        x, dim, heads, window, (window, window))
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-4, atol=2e-4)


def torch_v2_attn(sd, x, dim, heads, window, pretrained_window):
    """Oracle: Swin-V2 cosine window attention (one full-grid window)."""
    from avmoe_tpu.ops.swin import log_cpb_coords_table

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    xt = torch.from_numpy(x)
    B, L, C = xt.shape
    qkv_bias = torch.cat([t["attn.q_bias"], torch.zeros(dim), t["attn.v_bias"]])
    qkv = xt @ t["attn.qkv.weight"].T + qkv_bias
    q, k, v = qkv.reshape(B, L, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
    scale = torch.clamp(t["attn.logit_scale"], max=math.log(100.0)).exp()
    attn = attn * scale
    coords = torch.from_numpy(log_cpb_coords_table(
        window, window, pretrained_window, pretrained_window))
    cpb = F.relu(coords @ t["attn.cpb_mlp.0.weight"].T + t["attn.cpb_mlp.0.bias"])
    cpb = cpb @ t["attn.cpb_mlp.2.weight"].T
    idx = torch.from_numpy(relative_position_index(window, window).astype(np.int64))
    bias = cpb[idx.reshape(-1)].reshape(L, L, heads).permute(2, 0, 1)
    attn = attn + 16.0 * torch.sigmoid(bias)[None]
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, L, C)
    out = out @ t["attn.proj.weight"].T + t["attn.proj.bias"]
    # post-norm + residual
    h = F.layer_norm(out, (dim,), t["norm1.weight"], t["norm1.bias"])
    xt = xt + h
    h = F.layer_norm(
        F.gelu(xt @ t["mlp.fc1.weight"].T + t["mlp.fc1.bias"]) @ t["mlp.fc2.weight"].T
        + t["mlp.fc2.bias"], (dim,), t["norm2.weight"], t["norm2.bias"])
    return (xt + h).numpy()


def test_swin_v2_block_parity():
    rng = np.random.RandomState(1)
    dim, heads, window, pwin = 16, 2, 4, 4
    prefix = "layers.0.blocks.0."
    sd = {}
    make_ln(rng, prefix + "norm1", dim, sd)
    make_ln(rng, prefix + "norm2", dim, sd)
    make_linear(rng, prefix + "attn.qkv", dim, 3 * dim, sd, bias=False)
    sd[prefix + "attn.q_bias"] = rng.randn(dim).astype(np.float32) * 0.05
    sd[prefix + "attn.v_bias"] = rng.randn(dim).astype(np.float32) * 0.05
    sd[prefix + "attn.logit_scale"] = np.full((heads, 1, 1), np.log(10.0), np.float32)
    make_linear(rng, prefix + "attn.cpb_mlp.0", 2, 512, sd)
    make_linear(rng, prefix + "attn.cpb_mlp.2", 512, heads, sd, bias=False)
    make_linear(rng, prefix + "attn.proj", dim, dim, sd)
    make_linear(rng, prefix + "mlp.fc1", dim, 4 * dim, sd)
    make_linear(rng, prefix + "mlp.fc2", 4 * dim, dim, sd)

    full_sd = {**sd,
               "patch_embed.proj.weight": np.zeros((1, 3, 1, 1), np.float32),
               "patch_embed.proj.bias": np.zeros(1, np.float32),
               "patch_embed.norm.weight": np.ones(1), "patch_embed.norm.bias": np.zeros(1),
               "norm.weight": np.ones(1), "norm.bias": np.zeros(1)}
    params = cv.convert_swinv2_timm(full_sd, depths=(1,))

    blk = SwinBlock(dim=dim, input_resolution=(window, window), num_heads=heads,
                    window_size=window, shift_size=0, version="v2",
                    pretrained_window=pwin)
    x = rng.randn(2, window * window, dim).astype(np.float32)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    flat_tgt = traverse_util.flatten_dict(variables["params"])
    flat_src = traverse_util.flatten_dict(params["block_0_0"])
    assert set(flat_src) == set(flat_tgt)
    ours = blk.apply({"params": params["block_0_0"]}, jnp.asarray(x))
    expected = torch_v2_attn({k[len(prefix):]: v for k, v in sd.items()},
                             x, dim, heads, window, pwin)
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-4, atol=2e-4)
