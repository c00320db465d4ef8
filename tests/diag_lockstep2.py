"""Diagnostic 2: per-audio-block f_a divergence in the lock-step forward."""

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


def main() -> None:
    net = load_ref_module(f"{REF_ROOT}/AVE", "nets.net_trans_v3")
    esc = load_ref_module(f"{REF_ROOT}/AVE", "nets.esc_config")
    from torch_swinv2 import SwinTransformerV2

    from avmoe_tpu.config import replace, tiny_ave_config

    cfg = replace(tiny_ave_config(), d_model=256)
    fe_cfg = cfg.htsat.frontend
    for k, v in dict(htsat_spec_size=cfg.htsat.spec_size,
                     htsat_patch_size=cfg.htsat.patch_size,
                     htsat_window_size=cfg.htsat.window_size,
                     htsat_dim=cfg.htsat.embed_dim,
                     htsat_depth=list(cfg.htsat.depths),
                     htsat_num_head=list(cfg.htsat.num_heads),
                     htsat_stride=cfg.htsat.patch_stride,
                     mel_bins=fe_cfg.n_mels, fmin=fe_cfg.fmin,
                     fmax=fe_cfg.fmax).items():
        setattr(esc, k, v)
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
        is_audio_adapter_p1=True, is_audio_adapter_p2=True,
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

    trp._randomize_torch(model, 11, weight_std=0.05)

    # capture every htsat block OUTPUT (first elem of (x, attn)) and every
    # audio adapter output
    a_blocks = []
    for layer in model.htsat.layers:
        for blk in layer.blocks:
            blk.register_forward_hook(
                lambda m, i, o, store=a_blocks: store.append(o[0].detach().clone()))
    a_adapters = []
    for ml in (model.audio_moe_adapter_blocks_p1, model.audio_moe_adapter_blocks_p2):
        for ad in ml:
            ad.register_forward_hook(
                lambda m, i, o, store=a_adapters: store.append(o[0].detach().clone()))
    ds_outs = []
    for layer in model.htsat.layers:
        if layer.downsample is not None:
            layer.downsample.register_forward_hook(
                lambda m, i, o, store=ds_outs: store.append(o.detach().clone()))

    B, T = 1, 10
    rng = np.random.RandomState(3)
    wave = (rng.randn(B, T, cfg.audio_len) * 0.1).astype(np.float32)
    imgs = rng.rand(B, T, 3, cfg.swin.img_size, cfg.swin.img_size).astype(np.float32)
    with torch.no_grad():
        model([torch.from_numpy(wave)], torch.from_numpy(imgs))

    from avmoe_tpu.checkpoint.convert import (
        convert_lockstep_encoder, torch_state_dict_to_numpy)
    from avmoe_tpu.moe.injection import LockstepEncoder, pair_stage_blocks

    enc = LockstepEncoder(swin_cfg=cfg.swin, htsat_cfg=cfg.htsat,
                          moe_cfg=cfg.moe, injection_cfg=cfg.injection)
    params, batch_stats = convert_lockstep_encoder(
        torch_state_dict_to_numpy(model.state_dict()), n_sites=8,
        swin_depths=cfg.swin.depths, htsat_depths=cfg.htsat.depths)

    def probe(m, wave_, imgs_):
        inj = m.injection_cfg
        f_v = m.swin.embed(imgs_)
        f_a = m.htsat.embed(wave_, train=False)
        rec_blocks, rec_ds = [], []
        rec_ad = []
        site_idx = 0
        for stage in range(len(m.swin_cfg.depths)):
            vlo, vhi = m.swin.stage_ranges[stage]
            alo, ahi = m.htsat.stage_ranges[stage]
            skipped = inj.num_skip > 1 and (stage + 1) % inj.num_skip == 0
            for v_off, a_off in pair_stage_blocks(vhi - vlo, ahi - alo):
                blk_v = m.swin.blocks[vlo + v_off]
                blk_a = None if a_off is None else m.htsat.blocks[alo + a_off]
                if blk_a is None:
                    f_v = blk_v(f_v, False)
                elif skipped:
                    f_v = f_v + blk_v.attn_residual(f_v, False)
                    f_a = blk_a(f_a, False)
                    rec_blocks.append(f_a)
                    f_v = f_v + blk_v.mlp_residual(f_v, False)
                else:
                    f_a_res, _ = m.audio_moe_p1[site_idx](f_a, f_v, False)
                    rec_ad.append(("p1", site_idx, f_a_res))
                    f_v_res, _ = m.vis_moe_p1[site_idx](f_v, f_a, False)
                    f_v = f_v + blk_v.attn_residual(f_v, False)
                    f_v = f_v + f_v_res
                    f_a = blk_a(f_a, False)
                    rec_blocks.append(f_a)
                    f_a = f_a + f_a_res
                    f_a_res2, _ = m.audio_moe_p2[site_idx](f_a, f_v, False)
                    rec_ad.append(("p2", site_idx, f_a_res2))
                    f_v_res2, _ = m.vis_moe_p2[site_idx](f_v, f_a, False)
                    f_v = f_v + blk_v.mlp_residual(f_v, False)
                    f_v = f_v + f_v_res2
                    f_a = f_a + f_a_res2
                    site_idx += 1
            if stage < len(m.swin.downsamples):
                f_v = m.swin.downsamples[stage](f_v)
            if stage < len(m.htsat.downsamples):
                f_a = m.htsat.downsamples[stage](f_a)
                rec_ds.append(f_a)
        return rec_blocks, rec_ds, rec_ad

    rec_blocks, rec_ds, rec_ad = enc.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(wave.reshape(B * T, -1)),
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2).reshape(
            B * T, cfg.swin.img_size, cfg.swin.img_size, 3)),
        method=probe)

    print(len(a_blocks), "ref blocks;", len(rec_blocks), "mine")
    # ref adapter hook order: p1 hooks registered first but CALL order is
    # p1[0], p2[0], p1[1], ... interleaved; a_adapters appended in call order
    for (tag, si, m_), r in zip(rec_ad, a_adapters):
        rn = r[..., 0].permute(0, 2, 1).numpy()  # (B,C,N,1)->(B,N,C)
        d = float(np.abs(rn - np.asarray(m_)).max())
        print(f"adapter {tag}[{si}]: maxabs {d:.3e} scale {np.abs(rn).max():.4f}")
    for i, (r, m_) in enumerate(zip(a_blocks, rec_blocks)):
        rn, mn = r.numpy(), np.asarray(m_)
        d = float(np.abs(rn - mn).max())
        print(f"block {i}: maxabs {d:.3e} ref_scale {np.abs(rn).max():.3f} "
              f"mine_scale {np.abs(mn).max():.3f} shapes {rn.shape} {mn.shape}")
    for i, (r, m_) in enumerate(zip(ds_outs, rec_ds)):
        d = float(np.abs(r.numpy() - np.asarray(m_)).max())
        print(f"downsample {i}: maxabs {d:.3e}")


if __name__ == "__main__":
    main()
