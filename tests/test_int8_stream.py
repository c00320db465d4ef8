"""int8 stream storage (AVMOE_INT8_STREAM, ops/quant.py): numerics + wiring.

The eval fast path can store inter-sub-block residual streams as int8 +
per-token scales (the declared byte lever toward the 5x north star,
BASELINE.md "Measured v5e ceiling"). These tests pin:

  * the quantizer's error bound (0.5/127 of each token's max-abs channel),
  * chunked_attn_residual bit-path equivalence int8-in vs bf16-in,
  * the full AVE eval forward with int8 streams staying close to the bf16
    fast path (the accuracy go/no-go is measured at full size by
    tools/int8_accuracy.py; this is the tiny-config regression pin).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.ops.quant import (QStream, add_to_stream, dequantize,
                                 quantize_stream)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64, 96).astype(np.float32))
    qs = quantize_stream(x)
    assert qs.q.dtype == jnp.int8
    assert qs.s.shape == (4, 64, 1)
    back = dequantize(qs, jnp.float32)
    amax = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
    err = np.abs(np.asarray(back) - np.asarray(x))
    # symmetric round-to-nearest: error <= 0.5 * scale = 0.5/127 * rowmax
    assert np.all(err <= amax * (0.5 / 127.0) + 1e-7)


def test_quantize_idempotent_and_add():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    qs = quantize_stream(x)
    assert quantize_stream(qs) is qs
    res = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32) * 0.1)
    out = add_to_stream(qs, res)
    assert isinstance(out, QStream)
    ref = np.asarray(dequantize(qs, jnp.float32)) + np.asarray(res)
    got = np.asarray(dequantize(out, jnp.float32))
    amax = np.max(np.abs(ref), axis=-1, keepdims=True)
    assert np.all(np.abs(got - ref) <= amax * (0.5 / 127.0) + 1e-7)
    # plain-array passthrough
    out2 = add_to_stream(x, res)
    assert not isinstance(out2, QStream)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x + res))


@pytest.mark.parametrize("version,shift", [("v1", 0), ("v2", 2)])
def test_chunked_attn_residual_int8_matches_bf16(version, shift):
    """QStream-in chunk body == dequantize-then-bf16-body, up to one output
    requantization."""
    from avmoe_tpu.ops.swin import chunked_attn_residual, shifted_window_mask

    rng = np.random.RandomState(2)
    B, H, W, C, heads, window = 4, 8, 8, 32, 4, 4
    L, N = H * W, window * window
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32)).astype(jnp.bfloat16)
    qkv_k = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05)
    qkv_b = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.05)
    proj_k = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05)
    proj_b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)
    n1 = (jnp.ones((C,)), jnp.zeros((C,)), 1e-5)
    nwin = (H // window) * (W // window)
    bias = jnp.asarray(rng.randn(heads, N, N).astype(np.float32) * 0.1)
    mask_np = shifted_window_mask(H, W, window, shift)
    mask = None if mask_np is None else jnp.asarray(mask_np)
    ls = jnp.full((heads, 1, 1), 2.0) if version == "v2" else None

    kw = dict(H=H, W=W, window=window, shift=shift, bias=bias, mask=mask,
              num_heads=heads, version=version, norm1=n1, qkv_kernel=qkv_k,
              qkv_bias=qkv_b, proj_kernel=proj_k, proj_bias=proj_b,
              logit_scale=ls, pet=jnp.float32, dtype=jnp.bfloat16)

    qs_in = quantize_stream(x)
    ref = chunked_attn_residual(dequantize(qs_in, jnp.bfloat16), **kw)
    out = chunked_attn_residual(qs_in, **kw)
    assert isinstance(out, QStream)
    got = np.asarray(dequantize(out, jnp.float32))
    reff = np.asarray(ref, dtype=np.float32)
    amax = np.max(np.abs(reff), axis=-1, keepdims=True)
    # only difference: one requantization of the output state
    assert np.all(np.abs(got - reff) <= amax * (0.5 / 127.0) + 1e-2)


def _tiny_model_and_inputs():
    from avmoe_tpu.config import tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = tiny_ave_config()
    model = AVEModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(3)
    B, T = 2, cfg.num_segments
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rng.rand(
        B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])
    return model, variables, wave, imgs


def test_ave_eval_forward_int8_stream_close(monkeypatch):
    """Full tiny AVE eval forward: int8 streams vs the bf16 fast path.

    Correctness pin, not an accuracy claim (random init); the logits must
    track closely and the wiring must produce plain bf16 outputs."""
    model, variables, wave, imgs = _tiny_model_and_inputs()

    def run():
        out = model.apply(variables, wave, imgs, train=False)
        return np.asarray(out["event_logits"], dtype=np.float32)

    monkeypatch.delenv("AVMOE_INT8_STREAM", raising=False)
    ref = run()
    monkeypatch.setenv("AVMOE_INT8_STREAM", "1")
    got = run()
    # int8 stream noise passes through the heads; logits stay close in a
    # relative sense (tiny random-init model, bf16 compute both sides)
    scale = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.max(np.abs(got - ref)) / scale < 0.15, (
        np.max(np.abs(got - ref)) / scale)
    # ranking agreement on the dominant axis
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() > 0.9


def test_int8_stream_train_path_unaffected(monkeypatch):
    """AVMOE_INT8_STREAM must not leak into train=True forwards."""
    model, variables, wave, imgs = _tiny_model_and_inputs()

    def run_train():
        out = model.apply(
            variables, wave, imgs, train=True,
            rngs={"dropout": jax.random.PRNGKey(9),
                  "specaug": jax.random.PRNGKey(10)},
            mutable=["batch_stats"])[0]
        return np.asarray(out["event_logits"], dtype=np.float32)

    monkeypatch.delenv("AVMOE_INT8_STREAM", raising=False)
    ref = run_train()
    monkeypatch.setenv("AVMOE_INT8_STREAM", "1")
    got = run_train()
    np.testing.assert_array_equal(got, ref)
