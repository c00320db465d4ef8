"""Tiny-config forward smoke tests for the AVVP / AVQA / AVS task models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.config import tiny_avqa_config, tiny_avs_config, tiny_avvp_config


def _rngs():
    return {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "specaug": jax.random.PRNGKey(2), "gumbel": jax.random.PRNGKey(3),
            "router": jax.random.PRNGKey(4)}


def test_avvp_forward():
    from avmoe_tpu.models.avvp import MGNModel

    cfg = tiny_avvp_config()
    model = MGNModel(cfg)
    B, T = 2, cfg.num_segments
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32))
    imgs = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    st = jnp.asarray(rng.randn(B, T, cfg.st_dim).astype(np.float32))
    variables = model.init(_rngs(), wave, imgs, st)
    out = model.apply(variables, wave, imgs, st)
    assert out["global_prob"].shape == (B, cfg.num_classes)
    assert out["a_frame_prob"].shape == (B, T, cfg.num_classes)
    assert out["v_frame_prob"].shape == (B, T, cfg.num_classes)
    assert out["aud_cls_logits"].shape == (cfg.num_classes, cfg.num_classes)
    assert np.isfinite(np.asarray(out["global_prob"])).all()
    assert ((np.asarray(out["global_prob"]) >= 0) & (np.asarray(out["global_prob"]) <= 1)).all()
    assert np.isfinite(float(out["telemetry"]["lb_loss"]))


def test_avqa_forward():
    from avmoe_tpu.models.avqa import AVQAFusionModel

    cfg = tiny_avqa_config()
    model = AVQAFusionModel(cfg)
    B, T = 2, cfg.num_segments
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32))
    posi = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    nega = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    question = jnp.asarray(rng.randint(0, cfg.qst_vocab, (B, cfg.max_qst_len)).astype(np.int32))
    variables = model.init(_rngs(), wave, posi, nega, question)
    out = model.apply(variables, wave, posi, nega, question)
    assert out["qa_logits"].shape == (B, cfg.fc_class)
    assert out["match_posi"].shape == (B * T, 2)
    assert out["match_nega"].shape == (B * T, 2)
    assert np.isfinite(np.asarray(out["qa_logits"])).all()


def test_avs_forward_and_loss():
    from avmoe_tpu.models.avs import AVSModel, make_avs_loss_fn

    cfg = tiny_avs_config()
    model = AVSModel(cfg)
    B, T = 1, cfg.num_segments
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, T, cfg.img_size, cfg.img_size, 3).astype(np.float32))
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32))
    variables = model.init(_rngs(), imgs, wave)
    out = model.apply(variables, imgs, wave)
    assert out["mask_logits"].shape == (B * T, cfg.mask_size, cfg.mask_size)
    assert len(out["feature_map_list"]) == 4
    for i, m in enumerate(out["feature_map_list"]):
        assert m.shape == (B * T, cfg.pyramid_sizes[i], cfg.pyramid_sizes[i], cfg.channel)
    for i in cfg.tpavi_stages:
        assert out["a_fea_list"][i].shape == (B, T, cfg.channel)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()

    # S4 first-frame loss runs through the train step closure
    batch = {
        "images": imgs, "wave": wave,
        "mask": jnp.asarray((rng.rand(B, cfg.mask_size, cfg.mask_size) > 0.7).astype(np.float32)),
    }
    loss_fn = make_avs_loss_fn(model)
    loss, (aux, new_bs) = loss_fn(variables, batch, _rngs())
    assert np.isfinite(float(loss))
    assert "iou_loss" in aux
