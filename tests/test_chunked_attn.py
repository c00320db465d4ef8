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


@pytest.mark.parametrize("version,shift", [("v1", 0), ("v2", 2)])
def test_chunked_forward_whole_block(version, shift):
    """chunked_forward == x + attn_res (+r) + mlp_res chain, incl. mid state."""
    H = W = 8
    C, heads, window = 32, 4, 4
    B = 2
    blk = SwinBlock(dim=C, input_resolution=(H, W), num_heads=heads,
                    window_size=window, shift_size=shift, version=version,
                    dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (B, H * W, C)).astype(np.float32))
    r = jnp.asarray(rng.normal(0, 0.1, (B, H * W, C)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    mid_ref = x + blk.apply(variables, x, method="attn_residual") + r
    out_ref = mid_ref + blk.apply(variables, mid_ref, method="mlp_residual")
    mid, out = blk.apply(variables, x, r, need_mid=True,
                         method="chunked_forward")
    np.testing.assert_allclose(np.asarray(mid), np.asarray(mid_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_full_model_chunked_block_matches(monkeypatch):
    """Tiny AVE eval forward: AVMOE_CHUNK_BLOCK on vs off."""
    from avmoe_tpu.config import tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = tiny_ave_config()
    model = AVEModel(cfg)
    rng = np.random.default_rng(3)
    B, T = 1, cfg.num_segments
    wave = jnp.asarray(rng.normal(0, 0.1, (B, T, cfg.audio_len)).astype(np.float32))
    imgs = jnp.asarray(rng.random((B, T, cfg.swin.img_size, cfg.swin.img_size, 3),
                                  ).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wave, imgs)

    monkeypatch.setenv("AVMOE_CHUNK_BLOCK", "0")
    ref = model.apply(variables, wave, imgs)
    monkeypatch.setenv("AVMOE_CHUNK_BLOCK", "1")
    out = model.apply(variables, wave, imgs)
    np.testing.assert_allclose(np.asarray(out["event_logits"]),
                               np.asarray(ref["event_logits"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["is_event_logits"]),
                               np.asarray(ref["is_event_logits"]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("version", ["v1", "v2"])
@pytest.mark.parametrize("shift", [0, 2])
def test_fused_attn_state_matches(version, shift, monkeypatch):
    """attn_state fused chunk body (norm1 + windowing + residual in-body)
    == x + attn_residual(x)."""
    H = W = 8
    C, heads, window = 32, 4, 4
    B = 3
    blk = SwinBlock(dim=C, input_resolution=(H, W), num_heads=heads,
                    window_size=window, shift_size=shift, version=version,
                    dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (B, H * W, C)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("AVMOE_ATTN_RES_IN_CHUNK", "0")
    ref = x + blk.apply(variables, x, method="attn_residual")
    monkeypatch.setenv("AVMOE_ATTN_RES_IN_CHUNK", "1")
    out = blk.apply(variables, x, method="attn_state")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("version", ["v1", "v2"])
def test_fused_mlp_state_matches(version, monkeypatch):
    """mlp_state chunk body (norm2 + MLP + residual in-body) ==
    x + mlp_residual(x)."""
    H = W = 8
    C, heads, window = 32, 4, 4
    B = 4
    blk = SwinBlock(dim=C, input_resolution=(H, W), num_heads=heads,
                    window_size=window, shift_size=0, version=version,
                    dtype=jnp.float32)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(0, 1, (B, H * W, C)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("AVMOE_MLP_IN_CHUNK", "0")
    ref = x + blk.apply(variables, x, method="mlp_residual")
    monkeypatch.setenv("AVMOE_MLP_IN_CHUNK", "1")
    monkeypatch.setenv("AVMOE_MLP_CHUNK_MB", "1")  # force >1 chunk
    out = blk.apply(variables, x, method="mlp_state")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_full_model_fused_attn_state_matches(monkeypatch):
    """Tiny AVE eval forward: AVMOE_ATTN_RES_IN_CHUNK on vs off."""
    from avmoe_tpu.config import tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = tiny_ave_config()
    model = AVEModel(cfg)
    rng = np.random.default_rng(13)
    B, T = 1, cfg.num_segments
    wave = jnp.asarray(rng.normal(0, 0.1, (B, T, cfg.audio_len)).astype(np.float32))
    imgs = jnp.asarray(rng.random((B, T, cfg.swin.img_size, cfg.swin.img_size, 3),
                                  ).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wave, imgs)

    monkeypatch.setenv("AVMOE_ATTN_RES_IN_CHUNK", "0")
    ref = model.apply(variables, wave, imgs)
    monkeypatch.setenv("AVMOE_ATTN_RES_IN_CHUNK", "1")
    out = model.apply(variables, wave, imgs)
    np.testing.assert_allclose(np.asarray(out["event_logits"]),
                               np.asarray(ref["event_logits"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["is_event_logits"]),
                               np.asarray(ref["is_event_logits"]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["1", "2"])
@pytest.mark.parametrize("version", ["v1", "v2"])
def test_train_remat_chunked_grads_match(mode, version):
    """AVMOE_CHUNK_ATTN_TRAIN (1=full remat, 2=save-P policy) grads ==
    monolithic train-path grads."""
    blk = SwinBlock(dim=16, input_resolution=(8, 8), num_heads=2,
                    window_size=4, shift_size=2, version=version,
                    dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 16)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(jnp.square(blk.apply(
            {"params": params}, x, True,
            rngs={"dropout": jax.random.PRNGKey(1)})))

    os.environ["AVMOE_CHUNK_ATTN_TRAIN"] = "0"
    g_ref = jax.grad(loss)(variables["params"])
    os.environ["AVMOE_CHUNK_ATTN_TRAIN"] = mode
    try:
        g = jax.grad(loss)(variables["params"])
    finally:
        os.environ["AVMOE_CHUNK_ATTN_TRAIN"] = "0"
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    got_leaves = jax.tree_util.tree_leaves_with_path(g)
    for (ka, a), (kb, b) in zip(ref_leaves, got_leaves):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4, err_msg=str(ka))


def test_full_model_attn_state_matches(monkeypatch):
    """Tiny AVE eval forward: AVMOE_CHUNK_ATTN_STATE on vs off."""
    from avmoe_tpu.config import tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = tiny_ave_config()
    model = AVEModel(cfg)
    rng = np.random.default_rng(7)
    B, T = 1, cfg.num_segments
    wave = jnp.asarray(rng.normal(0, 0.1, (B, T, cfg.audio_len)).astype(np.float32))
    imgs = jnp.asarray(rng.random((B, T, cfg.swin.img_size, cfg.swin.img_size, 3),
                                  ).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wave, imgs)

    monkeypatch.setenv("AVMOE_CHUNK_ATTN_STATE", "0")
    ref = model.apply(variables, wave, imgs)
    monkeypatch.setenv("AVMOE_CHUNK_ATTN_STATE", "1")
    out = model.apply(variables, wave, imgs)
    np.testing.assert_allclose(np.asarray(out["event_logits"]),
                               np.asarray(ref["event_logits"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["is_event_logits"]),
                               np.asarray(ref["is_event_logits"]),
                               rtol=2e-4, atol=2e-4)
