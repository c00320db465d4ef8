"""Diagnostic: lock-step parity drift bisect (not a pytest test).

Usage: python tests/diag_lockstep.py [--no-adapters]
Prints max-abs divergence of pooled f_v / f_a between the reference MMIL
forward and LockstepEncoder.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import types

import jax.numpy as jnp
import numpy as np
import torch

from reference_harness import REF_ROOT, load_ref_module


def main(adapters: bool = True, std: float = 0.05) -> None:
    net = load_ref_module(f"{REF_ROOT}/AVE", "nets.net_trans_v3")
    esc = load_ref_module(f"{REF_ROOT}/AVE", "nets.esc_config")
    from torch_swinv2 import SwinTransformerV2

    from avmoe_tpu.config import InjectionConfig, replace, tiny_ave_config

    cfg = replace(tiny_ave_config(), d_model=256)
    if not adapters:
        cfg = replace(cfg, injection=InjectionConfig(
            audio_adapter_p1=False, audio_adapter_p2=False, num_skip=2))
    fe_cfg = cfg.htsat.frontend
    esc.htsat_spec_size = cfg.htsat.spec_size
    esc.htsat_patch_size = cfg.htsat.patch_size
    esc.htsat_window_size = cfg.htsat.window_size
    esc.htsat_dim = cfg.htsat.embed_dim
    esc.htsat_depth = list(cfg.htsat.depths)
    esc.htsat_num_head = list(cfg.htsat.num_heads)
    esc.htsat_stride = cfg.htsat.patch_stride
    esc.mel_bins = fe_cfg.n_mels
    esc.fmin, esc.fmax = fe_cfg.fmin, fe_cfg.fmax

    real = net.HTSAT_Swin_Transformer
    cap = {}

    def patched(**kw):
        esc.sample_rate = fe_cfg.sample_rate
        esc.hop_size = fe_cfg.hop_length
        esc.window_size = fe_cfg.n_fft
        m = real(**kw)
        cap["ckpt"] = {f"sed_model.{k}": v.clone() for k, v in m.state_dict().items()}
        return m

    net.HTSAT_Swin_Transformer = patched
    torch.load = lambda *a, **k: {"state_dict": cap["ckpt"]}
    net.timm.create_model = lambda n, pretrained=True: SwinTransformerV2(
        img_size=cfg.swin.img_size, patch_size=cfg.swin.patch_size,
        embed_dim=cfg.swin.embed_dim, depths=cfg.swin.depths,
        num_heads=cfg.swin.num_heads, window_size=cfg.swin.window_size)
    opt = types.SimpleNamespace(
        model_size="large", is_cmbs=True, is_temporal_att=True,
        is_inter_in_cmbs=0, backbone_type="audioset", num_skip=2,
        is_audio_adapter_p1=adapters, is_audio_adapter_p2=adapters,
        Adapter_downsample=4, is_bn=True, is_gate=True, num_tokens=8,
        num_conv_group=2, is_before_layernorm=True, is_post_layernorm=True,
        is_self_attention=False, num_multimodal_experts=1,
        num_singlemodal_experts=1)
    torch.manual_seed(0)
    model = net.MMIL_Net(opt).eval()
    model.temporal_attn.a_fc = torch.nn.Linear(cfg.htsat.num_features, 128)
    model.temporal_attn.v_fc = torch.nn.Linear(cfg.swin.num_features, 512)
    model.eval()

    import test_reference_parity as trp

    trp._randomize_torch(model, 11, weight_std=std)
    pooled = {}
    model.temporal_attn.register_forward_hook(
        lambda m, inp, out: pooled.update(fv=inp[0].detach().clone(),
                                          fa=inp[1].detach().clone()))
    B, T = 1, 10
    rng = np.random.RandomState(3)
    wave = (rng.randn(B, T, cfg.audio_len) * 0.1).astype(np.float32)
    imgs = rng.rand(B, T, 3, cfg.swin.img_size, cfg.swin.img_size).astype(np.float32)
    with torch.no_grad():
        model([torch.from_numpy(wave)], torch.from_numpy(imgs))

    from avmoe_tpu.checkpoint.convert import (
        convert_lockstep_encoder, torch_state_dict_to_numpy)
    from avmoe_tpu.moe.injection import LockstepEncoder

    enc = LockstepEncoder(swin_cfg=cfg.swin, htsat_cfg=cfg.htsat,
                          moe_cfg=cfg.moe, injection_cfg=cfg.injection)
    params, batch_stats = convert_lockstep_encoder(
        torch_state_dict_to_numpy(model.state_dict()),
        n_sites=8 if adapters else 0,
        swin_depths=cfg.swin.depths, htsat_depths=cfg.htsat.depths,
        p1=adapters, p2=adapters)
    fv, fa, _ = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(wave.reshape(B * T, -1)),
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2).reshape(
            B * T, cfg.swin.img_size, cfg.swin.img_size, 3)))
    for name, ref_v, mine in (
            ("fv", pooled["fv"].reshape(B * T, -1).numpy(), np.asarray(fv)),
            ("fa", pooled["fa"].reshape(B * T, -1).numpy(), np.asarray(fa))):
        d = np.abs(ref_v - mine)
        rel = d / (np.abs(ref_v) + 1e-6)
        print(name, "maxabs", float(d.max()), "meanabs", float(d.mean()), "scale", float(np.abs(ref_v).max()), "maxrel", float(rel.max()))


if __name__ == "__main__":
    main(adapters="--no-adapters" not in sys.argv, std=float(sys.argv[sys.argv.index("--std")+1]) if "--std" in sys.argv else 0.05)
