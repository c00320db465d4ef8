"""Chunked window attention is numerically identical to the monolithic path
(same math, same per-element reduction order; only the iteration structure
differs), for both block flavors with and without a shift mask."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.ops.swin import SwinBlock, shifted_window_mask


@pytest.mark.parametrize("version", ["v1", "v2"])
@pytest.mark.parametrize("shift", [0, 2])
def test_chunked_matches_monolithic(version, shift):
    H = W = 8
    C, heads, window = 32, 4, 4
    B = 3
    blk = SwinBlock(dim=C, input_resolution=(H, W), num_heads=heads,
                    window_size=window, shift_size=shift, version=version,
                    dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H * W, C)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    os.environ["AVMOE_CHUNK_ATTN"] = "0"
    ref = blk.apply(variables, x)
    os.environ["AVMOE_CHUNK_ATTN"] = "1"
    try:
        out = blk.apply(variables, x)
    finally:
        os.environ["AVMOE_CHUNK_ATTN"] = "1"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_chunked_grads_flow():
    blk = SwinBlock(dim=16, input_resolution=(8, 8), num_heads=2,
                    window_size=4, shift_size=2, version="v2",
                    dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 16)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(jnp.square(blk.apply({"params": params}, x)))

    os.environ["AVMOE_CHUNK_ATTN"] = "1"
    g = jax.grad(loss)(variables["params"])
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
