"""End-to-end activation parity for the legacy AVE models against the
reference's OWN torch code at tiny dims with random weights:

  * MMIL_Net (v1, DG-SCT single adapters; net_trans.py:809-1048)
  * MMIL_Net_v2 (LAVisH shared-backbone baseline, swin flavor;
    net_trans.py:1051-1241)

Same harness pattern as test_reference_parity.py's v3 lockstep test: timm is
stubbed with tests/torch_swinv2.py, HTS-AT/adapters are the reference's own
classes, weights cross via checkpoint/convert.py.
"""

from __future__ import annotations

import types as _types

import numpy as np
import pytest
import torch

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_harness import REF_ROOT, load_ref_module  # noqa: E402
from test_reference_parity import _allclose, _randomize_torch, _t  # noqa: E402


def _patch_esc_and_htsat(monkeypatch, net, esc, cfg):
    """Pin the tiny HTS-AT geometry + frontend on the esc_config module and
    feed the ctor's checkpoint load with its own random-init state_dict."""
    fe_cfg = cfg.htsat.frontend
    for attr, val in (("htsat_spec_size", cfg.htsat.spec_size),
                      ("htsat_patch_size", cfg.htsat.patch_size),
                      ("htsat_window_size", cfg.htsat.window_size),
                      ("htsat_dim", cfg.htsat.embed_dim),
                      ("htsat_depth", list(cfg.htsat.depths)),
                      ("htsat_num_head", list(cfg.htsat.num_heads)),
                      ("htsat_stride", cfg.htsat.patch_stride),
                      ("mel_bins", fe_cfg.n_mels),
                      ("fmin", fe_cfg.fmin), ("fmax", fe_cfg.fmax),
                      ("sample_rate", fe_cfg.sample_rate),
                      ("hop_size", fe_cfg.hop_length),
                      ("window_size", fe_cfg.n_fft),
                      ("classes_num", esc.classes_num),
                      ("loss_type", esc.loss_type),
                      ("checkpoint_path", getattr(esc, "checkpoint_path", "")),
                      ("checkpoint", getattr(esc, "checkpoint", ""))):
        monkeypatch.setattr(esc, attr, val, raising=False)

    real_htsat_cls = net.HTSAT_Swin_Transformer
    captured = {}

    def patched_htsat(**kw):
        esc.sample_rate = fe_cfg.sample_rate
        esc.hop_size = fe_cfg.hop_length
        esc.window_size = fe_cfg.n_fft
        m = real_htsat_cls(**kw)
        captured["ckpt"] = {f"sed_model.{k}": v.clone()
                            for k, v in m.state_dict().items()}
        return m

    monkeypatch.setattr(net, "HTSAT_Swin_Transformer", patched_htsat)
    monkeypatch.setattr(torch, "load",
                        lambda *a, **k: {"state_dict": captured["ckpt"]})


def _patch_timm(monkeypatch, net, cfg):
    from torch_swinv2 import SwinTransformerV2

    monkeypatch.setattr(
        net.timm, "create_model",
        lambda name, pretrained=True: SwinTransformerV2(
            img_size=cfg.swin.img_size, patch_size=cfg.swin.patch_size,
            embed_dim=cfg.swin.embed_dim, depths=cfg.swin.depths,
            num_heads=cfg.swin.num_heads, window_size=cfg.swin.window_size))


def make_tiny_ref_mmil_v1(monkeypatch):
    """Tiny reference MMIL_Net (v1) with randomized weights + the matching
    AVEConfig — shared by the activation- and training-curve parity tests."""
    net = load_ref_module(f"{REF_ROOT}/AVE", "nets.net_trans")
    esc = load_ref_module(f"{REF_ROOT}/AVE", "nets.esc_config")

    from avmoe_tpu.config import replace, tiny_ave_config

    cfg = replace(tiny_ave_config(), d_model=256)
    _patch_esc_and_htsat(monkeypatch, net, esc, cfg)
    _patch_timm(monkeypatch, net, cfg)

    a_cfg = cfg.moe.adapter
    opt = _types.SimpleNamespace(
        model_size="large", is_cmbs=True, is_temporal_att=True,
        is_inter_in_cmbs=0, backbone_type="audioset", is_multimodal=True,
        is_audio_adapter_p1=True, is_audio_adapter_p2=True,
        Adapter_downsample=a_cfg.downsample,
        is_bn=a_cfg.use_bn, is_gate=a_cfg.use_gate,
        num_tokens=a_cfg.num_tokens, num_conv_group=a_cfg.num_conv_group,
        is_before_layernorm=a_cfg.before_layernorm,
        is_post_layernorm=a_cfg.post_layernorm,
        is_self_attention=False)

    torch.manual_seed(0)
    model = net.MMIL_Net(opt).eval()
    # reference head hardcodes full-scale dims (a_fc 768->128, v_fc 1536->512)
    model.temporal_attn.a_fc = torch.nn.Linear(cfg.htsat.num_features, 128)
    model.temporal_attn.v_fc = torch.nn.Linear(cfg.swin.num_features, 512)
    model.eval()
    _randomize_torch(model, 29)
    return model, cfg


def test_mmil_v1_matches_reference(monkeypatch):
    model, cfg = make_tiny_ref_mmil_v1(monkeypatch)
    a_cfg = cfg.moe.adapter

    B, T = 1, 10  # forward_swin hardcodes 10 segments (net_trans.py:1038)
    rng = np.random.RandomState(5)
    wave = (rng.randn(B, T, cfg.audio_len) * 0.1).astype(np.float32)
    imgs = rng.rand(B, T, 3, cfg.swin.img_size, cfg.swin.img_size).astype(np.float32)
    with torch.no_grad():
        is_event_ref, event_ref, gate_ref, av_ref = model([_t(wave)], _t(imgs))

    from avmoe_tpu.checkpoint.convert import (convert_mmil_v1,
                                              torch_state_dict_to_numpy)
    from avmoe_tpu.models.ave_legacy import MMILNetV1

    m = MMILNetV1(cfg)
    params, batch_stats = convert_mmil_v1(
        torch_state_dict_to_numpy(model.state_dict()),
        n_sites=12, swin_depths=cfg.swin.depths, htsat_depths=cfg.htsat.depths,
        adapter_kwargs=dict(num_conv_group=a_cfg.num_conv_group,
                            use_bn=a_cfg.use_bn, use_gate=a_cfg.use_gate,
                            before_layernorm=a_cfg.before_layernorm,
                            post_layernorm=a_cfg.post_layernorm))
    out = jax.jit(lambda v, w, im: m.apply(v, w, im, train=False))(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(wave), jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)))

    _allclose(is_event_ref[..., 0].T, out["is_event_logits"],
              rtol=2e-3, atol=1e-3)
    _allclose(event_ref, out["event_logits"], rtol=2e-3, atol=1e-3)
    _allclose(av_ref, out["av_score"], rtol=2e-3, atol=1e-3)
    g = np.asarray(gate_ref.detach()).squeeze(-1)
    if g.shape != out["av_gate"].shape:
        g = g.T
    _allclose(torch.as_tensor(g), out["av_gate"], rtol=2e-3, atol=1e-3)


def make_tiny_ref_mmil_v2(monkeypatch):
    """Tiny reference MMIL_Net_v2 (LAVisH baseline) with randomized weights
    + the matching AVEConfig — shared by activation- and curve-parity tests."""
    net = load_ref_module(f"{REF_ROOT}/AVE", "nets.net_trans")

    from avmoe_tpu.config import tiny_ave_config

    cfg = tiny_ave_config()
    _patch_timm(monkeypatch, net, cfg)

    a_cfg = cfg.moe.adapter
    opt = _types.SimpleNamespace(
        vis_encoder_type="swin", is_multimodal=True,
        is_audio_adapter_p1=True, is_audio_adapter_p2=True,
        Adapter_downsample=a_cfg.downsample,
        is_bn=a_cfg.use_bn, is_gate=a_cfg.use_gate,
        num_tokens=a_cfg.num_tokens, num_conv_group=a_cfg.num_conv_group,
        is_before_layernorm=a_cfg.before_layernorm,
        is_post_layernorm=a_cfg.post_layernorm)

    torch.manual_seed(1)
    model = net.MMIL_Net_v2(opt).eval()
    # ctor hardcodes swinv2-Large's 1536-dim features (net_trans.py:1065)
    model.mlp_class = torch.nn.Linear(cfg.swin.num_features * 2, 512)
    model.eval()
    _randomize_torch(model, 31)
    return model, cfg


def test_mmil_v2_matches_reference(monkeypatch):
    model, cfg = make_tiny_ref_mmil_v2(monkeypatch)
    a_cfg = cfg.moe.adapter

    B, T, S = 1, 2, cfg.swin.img_size
    rng = np.random.RandomState(7)
    spec = (rng.randn(B, T, S, S) * 0.5).astype(np.float32)
    imgs = rng.rand(B, T, 3, S, S).astype(np.float32)
    with torch.no_grad():
        p_av_ref = model.forward_swin(_t(spec), _t(imgs))

    from avmoe_tpu.checkpoint.convert import (convert_mmil_v2,
                                              torch_state_dict_to_numpy)
    from avmoe_tpu.models.ave_legacy import MMILNetV2

    m = MMILNetV2(cfg)
    params, batch_stats = convert_mmil_v2(
        torch_state_dict_to_numpy(model.state_dict()),
        swin_depths=cfg.swin.depths,
        adapter_kwargs=dict(num_conv_group=a_cfg.num_conv_group,
                            use_bn=a_cfg.use_bn, use_gate=a_cfg.use_gate,
                            before_layernorm=a_cfg.before_layernorm,
                            post_layernorm=a_cfg.post_layernorm))
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out = jax.jit(lambda v, sp, im: m.apply(v, sp, im, train=False))(
        variables, jnp.asarray(spec), jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)))

    _allclose(p_av_ref, out["event_probs"], rtol=2e-3, atol=1e-3)
