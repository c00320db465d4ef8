"""Legacy AVE models (MMIL_Net v1 DG-SCT, MMIL_Net_v2 LAVisH): forward
shapes, loss finiteness, and train-step grads flow."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.config import replace, tiny_ave_config
from avmoe_tpu.models.ave_legacy import (MMILNetV1, MMILNetV2,
                                         make_mmil_v1_loss_fn,
                                         make_mmil_v2_loss_fn)


def _rngs():
    return {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "specaug": jax.random.PRNGKey(2)}


def test_mmil_v1_forward_and_loss():
    cfg = replace(tiny_ave_config(), d_model=32)
    model = MMILNetV1(cfg)
    B, T = 1, cfg.num_segments
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size,
                                3).astype(np.float32))
    variables = model.init(_rngs(), wave, imgs)
    out = model.apply(variables, wave, imgs)
    assert out["is_event_logits"].shape == (B, T)
    assert out["event_logits"].shape == (B, cfg.num_classes)
    assert out["av_gate"].shape == (B, T)
    assert np.isfinite(np.asarray(out["event_logits"])).all()

    batch = {
        "wave": wave, "images": imgs,
        "labels": jnp.asarray(np.eye(cfg.num_classes + 1, dtype=np.float32)[
            rng.randint(0, cfg.num_classes + 1, (B, T))]),
    }
    loss, (aux, _) = make_mmil_v1_loss_fn(model)(
        variables, batch, {**_rngs(), "mixup": jax.random.PRNGKey(3)})
    assert np.isfinite(float(loss))
    assert "loss_gate" in aux


def test_mmil_v1_adapters_train_backbones_freeze():
    from avmoe_tpu.train.freeze import partition_params

    cfg = replace(tiny_ave_config(), d_model=32)
    model = MMILNetV1(cfg)
    B, T = 1, cfg.num_segments
    rng = np.random.RandomState(1)
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size,
                                3).astype(np.float32))
    variables = model.init(_rngs(), wave, imgs)
    trainable, frozen = partition_params(variables["params"])
    from flax import traverse_util
    tflat = traverse_util.flatten_dict(trainable)
    fflat = traverse_util.flatten_dict(frozen)
    assert any("adapter" in "/".join(k) for k in tflat)
    assert any("swin" in k for path in fflat for k in path)
    # backbone kernels must not appear in the trainable set
    assert not any("swin" in path[1] and "adapter" not in "/".join(path)
                   for path in tflat if len(path) > 1)


def test_mmil_v2_forward_and_loss():
    cfg = replace(tiny_ave_config(), d_model=32)
    model = MMILNetV2(cfg)
    B, T, S = 1, cfg.num_segments, cfg.swin.img_size
    rng = np.random.RandomState(2)
    spec = jnp.asarray(rng.randn(B, T, S, S).astype(np.float32) * 0.5)
    imgs = jnp.asarray(rng.rand(B, T, S, S, 3).astype(np.float32))
    variables = model.init(_rngs(), spec, imgs)
    out = model.apply(variables, spec, imgs)
    assert out["event_probs"].shape == (B * T, cfg.num_classes + 1)
    assert np.isfinite(np.asarray(out["event_probs"])).all()
    np.testing.assert_allclose(np.asarray(out["event_probs"]).sum(-1), 1.0,
                               rtol=1e-5)

    batch = {
        "audio_spec": spec, "images": imgs,
        "labels": jnp.asarray(np.eye(cfg.num_classes + 1, dtype=np.float32)[
            rng.randint(0, cfg.num_classes + 1, (B, T))]),
    }
    loss, (aux, _) = make_mmil_v2_loss_fn(model)(variables, batch, _rngs())
    assert np.isfinite(float(loss))
    assert "accuracy" in aux
