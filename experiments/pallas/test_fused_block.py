"""Parity: fused Pallas block-chain vs the unfused SwinBlock modules.

Runs in interpret mode on the CPU mesh; covers v1 (pre-norm) and v2
(post-norm) flavors, shifted windows, multi-block chains, and the
attn/mlp sub-block parts used at MoE adapter seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from fused_block import run_chain
from avmoe_tpu.ops.swin import SwinBlock


class _Chain(nn.Module):
    version: str
    dim: int
    resolution: int
    num_heads: int
    window: int
    depth: int

    def setup(self):
        self.blocks = [
            SwinBlock(
                dim=self.dim,
                input_resolution=(self.resolution, self.resolution),
                num_heads=self.num_heads,
                window_size=self.window,
                shift_size=0 if i % 2 == 0 else self.window // 2,
                version=self.version,
                dtype=jnp.float32,
                name=f"b{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(self, x, fused: bool = False, part: str = "full"):
        if fused:
            return run_chain(self.blocks, x, part=part, interpret=True)
        for b in self.blocks:
            if part == "full":
                x = b(x, False)
            elif part == "attn":
                x = x + b.attn_residual(x, False)
            else:
                x = x + b.mlp_residual(x, False)
        return x


@pytest.mark.parametrize("version", ["v1", "v2"])
@pytest.mark.parametrize("part", ["full", "attn", "mlp"])
def test_fused_chain_matches_blocks(version, part):
    depth = 2  # block 1 is shifted
    m = _Chain(version=version, dim=16, resolution=8, num_heads=2,
               window=4, depth=depth)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 64, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x, fused=False, part=part)
    out = m.apply(variables, x, fused=True, part=part)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_chain_single_window():
    # resolution == window -> auto-shrink, no shift, single window (stage 3/4)
    m = _Chain(version="v2", dim=16, resolution=4, num_heads=2,
               window=8, depth=2)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(1), x)
    ref = m.apply(variables, x, fused=False)
    out = m.apply(variables, x, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_lockstep_fused_matches_unfused(monkeypatch):
    """Full tiny AVE forward: AVMOE_FUSED_BLOCKS=1 must match the XLA path."""
    from avmoe_tpu.config import tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = tiny_ave_config()
    model = AVEModel(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    B, T = 2, cfg.num_segments
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(
        rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wave, imgs)

    monkeypatch.delenv("AVMOE_FUSED_BLOCKS", raising=False)
    ref = model.apply(variables, wave, imgs, train=False)
    monkeypatch.setenv("AVMOE_FUSED_BLOCKS", "1")
    out = model.apply(variables, wave, imgs, train=False)
    for key in ("is_event_logits", "event_logits"):
        np.testing.assert_allclose(np.asarray(out[key]), np.asarray(ref[key]),
                                   rtol=2e-4, atol=2e-4)
