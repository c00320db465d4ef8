"""Activation/value parity against the reference's OWN PyTorch code.

Unlike tests/test_convert_parity.py (which compares against independently
written torch oracles), these tests import modules from /root/reference and
run them directly (CPU, random weights, eval mode) against the avmoe_tpu
implementations. See tests/reference_harness.py for the import stubs.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from reference_harness import REF_ROOT, load_ref_file, load_ref_module  # noqa: E402

RTOL = 2e-4
ATOL = 2e-5


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _allclose(torch_val, jax_val, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(torch_val.detach() if hasattr(torch_val, "detach") else torch_val),
        np.asarray(jax_val), rtol=rtol, atol=atol)


# ---------------------------------------------------------------- AVS losses

@pytest.fixture(scope="module")
def avs_loss_data():
    rng = np.random.RandomState(0)
    BT, C, H = 10, 16, 14
    pred = rng.randn(BT, 1, 224, 224).astype(np.float32)
    a = rng.randn(2, 5, C).astype(np.float32)
    v = rng.randn(BT, C, H, H).astype(np.float32)
    return pred, a, v


@pytest.mark.parametrize("kind", ["euclidean", "kl"])
def test_ms3_masked_av_loss_matches_reference(avs_loss_data, kind):
    ref = load_ref_file(f"{REF_ROOT}/AVS/avs_scripts/avs_ms3/loss.py", "ref_ms3_loss")
    pred, a, v = avs_loss_data
    expected = ref.A_MaskedV_SimmLoss(
        _t(pred), [_t(a)], [_t(v)], count_stages=[0],
        euclidean_flag=kind == "euclidean", kl_flag=kind == "kl")

    from avmoe_tpu.losses.avs import masked_av_loss
    got = masked_av_loss(
        jnp.asarray(pred[:, 0]), [jnp.asarray(a)],
        [jnp.asarray(v.transpose(0, 2, 3, 1))], [0],
        kind=kind, setting="ms3", threshold=False)
    _allclose(expected, got)


@pytest.mark.parametrize("kind", ["euclidean", "kl"])
def test_ms3_closer_loss_matches_reference(avs_loss_data, kind):
    ref = load_ref_file(f"{REF_ROOT}/AVS/avs_scripts/avs_ms3/loss.py", "ref_ms3_loss")
    pred, a, v = avs_loss_data
    expected = ref.closer_loss(
        _t(pred), [_t(a)], [_t(v)], count_stages=[0],
        euclidean_flag=kind == "euclidean", kl_flag=kind == "kl")

    from avmoe_tpu.losses.avs import masked_av_loss
    got = masked_av_loss(
        jnp.asarray(pred[:, 0]), [jnp.asarray(a)],
        [jnp.asarray(v.transpose(0, 2, 3, 1))], [0],
        kind=kind, setting="ms3", closer=True)
    _allclose(expected, got)


def test_s4_masked_av_cosine_matches_reference(avs_loss_data):
    ref = load_ref_file(f"{REF_ROOT}/AVS/avs_scripts/avs_s4/loss.py", "ref_s4_loss")
    pred, a, v = avs_loss_data
    expected = ref.A_MaskedV_SimmLoss(_t(pred), [_t(a)], [_t(v)], count_stages=[0])

    from avmoe_tpu.losses.avs import masked_av_loss
    got = masked_av_loss(
        jnp.asarray(pred[:, 0]), [jnp.asarray(a)],
        [jnp.asarray(v.transpose(0, 2, 3, 1))], [0],
        kind="cosine", setting="s4", threshold=True)
    _allclose(expected, got)


def test_asymmetric_loss_matches_reference():
    ref = load_ref_module(f"{REF_ROOT}/AVE", "nets.utils")
    rng = np.random.RandomState(1)
    probs = rng.uniform(0.02, 0.98, size=(6, 25)).astype(np.float32)
    targets = (rng.rand(6, 25) < 0.2).astype(np.float32)
    expected = ref.AsymmetricLoss()(_t(probs), _t(targets))

    from avmoe_tpu.losses.classification import asymmetric_loss
    got = asymmetric_loss(jnp.asarray(probs), jnp.asarray(targets))
    _allclose(expected, got)


def test_yb_loss_matches_reference():
    crit = load_ref_module(f"{REF_ROOT}/AVE", "criterion")
    rng = np.random.RandomState(2)
    R, K, S, C = 6, 3, 4, 25
    all_prob = rng.uniform(0.05, 0.95, size=(R + K, S, 2, C)).astype(np.float32)
    # disjoint one-hot-ish targets so some pairs gate on, some off
    target = np.zeros((R, C), np.float32)
    target[np.arange(R), [0, 1, 2, 3, 4, 0]] = 1.0
    audio_idx = np.array([0, 1, 2])
    vis_idx = np.array([3, 4, 5])  # pair (2,5) shares class 0 -> gated off... no: rows 2,5 are classes 2,0 -> disjoint; (0,3),(1,4) disjoint
    target[5, 2] = 1.0  # make pair (2,5) share class 2 -> gated OFF

    class Opt:
        exp = False
        pos_pool = "max"
        neg_pool = "max"

    expected = crit.YBLoss()(
        _t(all_prob), torch.from_numpy(audio_idx), torch.from_numpy(vis_idx),
        _t(target), Opt())

    from avmoe_tpu.losses.contrastive import yb_loss
    got = yb_loss(jnp.asarray(all_prob), jnp.asarray(audio_idx),
                  jnp.asarray(vis_idx), jnp.asarray(target))
    _allclose(expected, got)


# --------------------------------------------------------- MoE adapter fabric

def _randomize_torch(model, seed: int, weight_std: float = 1.0) -> None:
    """Fill every float tensor (incl. zero-init gates and BN stats) with
    seeded noise so parity is stringent; norm scales stay near 1 and
    running_var positive so activations remain well-conditioned (wildly
    scaled random weights amplify fp32 noise chaotically through deep
    stacks, which would test numerics, not correctness)."""
    g = torch.Generator().manual_seed(seed)
    param_names = {n for n, _ in model.named_parameters()}
    for k, v in model.state_dict().items():
        if not v.dtype.is_floating_point:
            continue
        # only parameters + BN running stats: other float buffers encode
        # STRUCTURE (e.g. each Swin block's additive attn_mask) and must
        # keep their true values
        if k not in param_names and not k.endswith(("running_var", "running_mean")):
            continue
        if k.endswith("running_var"):
            v.copy_(torch.rand(v.shape, generator=g) * 0.5 + 0.5)
        elif k.endswith("running_mean"):
            v.copy_(torch.randn(v.shape, generator=g) * 0.1)
        elif v.ndim == 1 and k.endswith(".weight"):  # LN/BN scales
            v.copy_(1.0 + torch.randn(v.shape, generator=g) * 0.05)
        elif v.ndim == 1:  # biases, gates, 1-d params
            v.copy_(torch.randn(v.shape, generator=g) * 0.05)
        else:
            # fan-in-scaled (Kaiming-like): keeps activations O(1) through
            # arbitrarily deep stacks so parity measures correctness, not
            # chaotic fp-noise amplification
            fan_in = 1
            for s in v.shape[1:]:
                fan_in *= s
            v.copy_(torch.randn(v.shape, generator=g) * weight_std / fan_in ** 0.5)


def test_moe_adapter_matches_reference():
    """Reference MoEAdapter (router + conv_adapter/fc projection + cross-modal
    and unimodal ExpertAdapters, net_trans_v3.py:296-487) vs the stacked-vmap
    avmoe_tpu MoEAdapter with weights converted by convert_moe_adapter."""
    import types as _types

    net = load_ref_module(f"{REF_ROOT}/AVE", "nets.net_trans_v3")
    opt = _types.SimpleNamespace(
        num_conv_group=2, is_before_layernorm=1, is_post_layernorm=1,
        is_self_attention=0, num_multimodal_experts=1, num_singlemodal_experts=1)
    B, C, N, C_other, M, TK = 2, 32, 16, 48, 8, 4
    torch.manual_seed(0)
    ref = net.MoEAdapter(
        input_dim=C, output_dim=C, adapter_kind="bottleneck", dim_list=[],
        layer_idx=0, reduction_factor=8, opt=opt, use_bn=True, use_gate=True,
        num_tk=TK, conv_dim_in=M, conv_dim_out=N, linear_in=C_other,
        linear_out=C).eval()
    _randomize_torch(ref, 7)

    rng = np.random.RandomState(0)
    x = rng.randn(B, C, N, 1).astype(np.float32)
    other = rng.randn(B, C_other, M, 1).astype(np.float32)
    with torch.no_grad():
        out_ref, idx_ref = ref(_t(x), _t(other))

    from avmoe_tpu.checkpoint.convert import (
        convert_moe_adapter, torch_state_dict_to_numpy)
    from avmoe_tpu.config import AdapterConfig, MoEConfig
    from avmoe_tpu.moe.adapter import MoEAdapter

    cfg = MoEConfig(
        num_multimodal_experts=1, num_singlemodal_experts=1,
        adapter=AdapterConfig(downsample=8, num_conv_group=2, num_tokens=TK))
    mod = MoEAdapter(dim=C, other_dim=C_other, num_tokens=N,
                     other_num_tokens=M, cfg=cfg)
    params, batch_stats = convert_moe_adapter(
        torch_state_dict_to_numpy(ref.state_dict()))
    out, aux = mod.apply({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(x[..., 0].transpose(0, 2, 1)),
                         jnp.asarray(other[..., 0].transpose(0, 2, 1)),
                         False)

    _allclose(out_ref[..., 0].permute(0, 2, 1), out, rtol=5e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_ref).reshape(-1),
                                  np.asarray(aux["expert_index"]))


# ------------------------------------------------------------- AVS backbones

AVS_S4 = f"{REF_ROOT}/AVS/avs_scripts/avs_s4"


def test_pvt_v2_matches_reference():
    pvt = load_ref_file(f"{AVS_S4}/model/pvt.py", "ref_pvt")
    torch.manual_seed(0)
    ref = pvt.pvt_v2_b0().eval()
    _randomize_torch(ref, 5)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(_t(x))

    from avmoe_tpu.backbones.pvt import pvt_v2_b0
    from avmoe_tpu.checkpoint.convert import convert_pvt_v2, torch_state_dict_to_numpy

    mine = pvt_v2_b0()
    params = convert_pvt_v2(torch_state_dict_to_numpy(ref.state_dict()),
                            depths=(2, 2, 2, 2))
    outs = mine.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs_ref) == len(outs) == 4
    for o_ref, o in zip(outs_ref, outs):
        _allclose(o_ref.permute(0, 2, 3, 1), o, rtol=1e-3, atol=1e-3)


def test_b2_resnet_matches_reference():
    res = load_ref_file(f"{AVS_S4}/model/resnet.py", "ref_resnet")
    torch.manual_seed(0)
    ref = res.B2_ResNet().eval()
    _randomize_torch(ref, 6)
    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        x1_ref, x2_ref = ref(_t(x))

    from avmoe_tpu.backbones.resnet import B2ResNet
    from avmoe_tpu.checkpoint.convert import convert_b2_resnet, torch_state_dict_to_numpy

    mine = B2ResNet()
    params, batch_stats = convert_b2_resnet(torch_state_dict_to_numpy(ref.state_dict()))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    outs1 = mine.apply({"params": params, "batch_stats": batch_stats}, xj, branch=1)
    outs2 = mine.apply({"params": params, "batch_stats": batch_stats}, xj, branch=2)
    _allclose(x1_ref.permute(0, 2, 3, 1), outs1[-1], rtol=1e-3, atol=1e-4)
    _allclose(x2_ref.permute(0, 2, 3, 1), outs2[-1], rtol=1e-3, atol=1e-4)


def test_vggish_matches_reference():
    vg = load_ref_module(f"{AVS_S4}", "torchvggish.vggish")
    torch.manual_seed(0)
    ref = vg.VGG(vg.make_layers()).eval()
    _randomize_torch(ref, 7)
    rng = np.random.RandomState(2)
    x = rng.rand(3, 1, 96, 64).astype(np.float32)
    with torch.no_grad():
        emb_ref = ref(_t(x))

    from avmoe_tpu.backbones.vggish import VGGish
    from avmoe_tpu.checkpoint.convert import convert_vggish, torch_state_dict_to_numpy

    params = convert_vggish(torch_state_dict_to_numpy(ref.state_dict()))
    emb = VGGish().apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _allclose(emb_ref, emb, rtol=1e-3, atol=1e-4)


def test_grounding_resnet18_matches_reference():
    vn = load_ref_file(f"{REF_ROOT}/AVQA/grounding_gen/visual_net.py", "ref_visual_net")
    torch.manual_seed(0)
    ref = vn.resnet18(modal="vision").eval()
    _randomize_torch(ref, 8)
    rng = np.random.RandomState(3)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        map_ref = ref(_t(x))

    from avmoe_tpu.backbones.legacy import ResNet18
    from avmoe_tpu.checkpoint.convert import convert_resnet18, torch_state_dict_to_numpy

    params, batch_stats = convert_resnet18(torch_state_dict_to_numpy(ref.state_dict()))
    # the grounding variant has no used fc in the map path; drop the unused
    # torch head if present
    out = ResNet18(return_map=True).apply(
        {"params": {k: v for k, v in params.items() if k != "fc"},
         "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    _allclose(map_ref.permute(0, 2, 3, 1), out, rtol=1e-3, atol=1e-4)


# ------------------------------------------------- full lock-step orchestration

def make_tiny_ref_mmil(monkeypatch, cfg, weight_seed: int = 11):
    """Construct the reference's OWN MMIL_Net (net_trans_v3.py:489-637) at
    tiny dims, randomized: esc_config monkeypatched to the tiny geometry, timm
    stubbed with tests/torch_swinv2.py, head fc dims re-sized for the tiny
    encoder. Shared by the activation-parity and training-curve-parity tests.
    Returns the torch model (eval mode)."""
    import types as _types

    net = load_ref_module(f"{REF_ROOT}/AVE", "nets.net_trans_v3")
    esc = load_ref_module(f"{REF_ROOT}/AVE", "nets.esc_config")
    from torch_swinv2 import SwinTransformerV2

    fe_cfg = cfg.htsat.frontend

    # tiny HTS-AT geometry on the esc_config module (read inside MMIL ctor);
    # monkeypatch so the module-global state is restored for other tests
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
                      ("checkpoint_path", esc.checkpoint_path
                       if hasattr(esc, "checkpoint_path") else ""),
                      ("checkpoint", getattr(esc, "checkpoint", ""))):
        monkeypatch.setattr(esc, attr, val, raising=False)

    # the ctor's audioset branch hardcodes 32kHz constants (:525-531); re-pin
    # the tiny front-end right before HTSAT construction, and capture the
    # random-init state_dict to feed the ctor's checkpoint load (:560-563)
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
    monkeypatch.setattr(torch, "load", lambda *a, **k: {"state_dict": captured["ckpt"]})
    monkeypatch.setattr(net.timm, "create_model", lambda name, pretrained=True: SwinTransformerV2(
        img_size=cfg.swin.img_size, patch_size=cfg.swin.patch_size,
        embed_dim=cfg.swin.embed_dim, depths=cfg.swin.depths,
        num_heads=cfg.swin.num_heads, window_size=cfg.swin.window_size))

    opt = _types.SimpleNamespace(
        model_size="large", is_cmbs=True, is_temporal_att=True,
        is_inter_in_cmbs=0,
        backbone_type="audioset", num_skip=cfg.injection.num_skip,
        is_audio_adapter_p1=True, is_audio_adapter_p2=True,
        Adapter_downsample=cfg.moe.adapter.downsample,
        is_bn=cfg.moe.adapter.use_bn, is_gate=cfg.moe.adapter.use_gate,
        num_tokens=cfg.moe.adapter.num_tokens,
        num_conv_group=cfg.moe.adapter.num_conv_group,
        is_before_layernorm=cfg.moe.adapter.before_layernorm,
        is_post_layernorm=cfg.moe.adapter.post_layernorm,
        is_self_attention=False,
        num_multimodal_experts=cfg.moe.num_multimodal_experts,
        num_singlemodal_experts=cfg.moe.num_singlemodal_experts)

    torch.manual_seed(0)
    model = net.MMIL_Net(opt).eval()
    # the reference head hardcodes full-scale input dims (a_fc 768->128,
    # v_fc 1536->512, net_trans_v3.py:196-197); re-size for the tiny encoder
    model.temporal_attn.a_fc = torch.nn.Linear(cfg.htsat.num_features, 128)
    model.temporal_attn.v_fc = torch.nn.Linear(cfg.swin.num_features, 512)
    model.eval()
    _randomize_torch(model, weight_seed)
    return model


def test_lockstep_encoder_matches_reference_mmil(monkeypatch):
    """Runs the reference's OWN MMIL_Net.forward_swin (net_trans_v3.py:639-759)
    - dual backbones + 4x8 MoE adapter sites at tiny dims - and compares the
    pooled per-frame features against LockstepEncoder with weights converted
    via convert_lockstep_encoder. timm is stubbed with tests/torch_swinv2.py
    (same architecture timm builds); HTS-AT/adapters are the reference's own
    classes."""
    from avmoe_tpu.config import replace, tiny_ave_config

    # reference heads hardcode d_model=256 (net_trans_v3.py:190,266)
    cfg = replace(tiny_ave_config(), d_model=256)
    model = make_tiny_ref_mmil(monkeypatch, cfg)

    pooled = {}
    model.temporal_attn.register_forward_hook(
        lambda m, inp, out: pooled.update(fv=inp[0].detach().clone(),
                                          fa=inp[1].detach().clone()))

    # forward_swin hardcodes 10 segments (net_trans_v3.py:738 view(bs, 10, -1))
    B, T = 1, 10
    rng = np.random.RandomState(3)
    wave = (rng.randn(B, T, cfg.audio_len) * 0.1).astype(np.float32)
    imgs = rng.rand(B, T, 3, cfg.swin.img_size, cfg.swin.img_size).astype(np.float32)
    with torch.no_grad():
        is_event_ref, event_ref, av_ref, _ = model([_t(wave)], _t(imgs))

    from avmoe_tpu.checkpoint.convert import (
        convert_mmil_net, torch_state_dict_to_numpy)
    from avmoe_tpu.models.ave import AVEModel

    ave = AVEModel(cfg)
    params, batch_stats = convert_mmil_net(
        torch_state_dict_to_numpy(model.state_dict()),
        n_sites=8, swin_depths=cfg.swin.depths, htsat_depths=cfg.htsat.depths)
    out = jax.jit(lambda v, w, im: ave.apply(v, w, im, train=False))(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(wave),
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)))

    # encoder parity: pooled per-frame features entering TemporalAttention
    def _encoder_only(m, w_, im_):
        return m.encoder(w_.reshape(B * T, -1),
                         im_.reshape((B * T,) + im_.shape[2:]), train=False)

    fv, fa, _ = jax.jit(lambda v, w, im: ave.apply(
        v, w, im, method=_encoder_only))(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(wave), jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)))
    _allclose(pooled["fv"].reshape(B * T, -1), fv, rtol=1e-3, atol=5e-4)
    _allclose(pooled["fa"].reshape(B * T, -1), fa, rtol=1e-3, atol=5e-4)

    # full-model parity: heads included (TemporalAttention + CMBS converted)
    _allclose(is_event_ref[..., 0].T, out["is_event_logits"], rtol=2e-3, atol=1e-3)
    _allclose(event_ref, out["event_logits"], rtol=2e-3, atol=1e-3)
    _allclose(av_ref, out["av_score"], rtol=2e-3, atol=1e-3)


# ------------------------------------------------------------ HTS-AT backbone

@pytest.fixture(scope="module")
def ref_htsat():
    htsat_mod = load_ref_module(f"{REF_ROOT}/AVE", "nets.htsat")
    esc = load_ref_module(f"{REF_ROOT}/AVE", "nets.esc_config")
    # audioset flavor (ref: net_trans_v3.py:525-531)
    esc.sample_rate, esc.hop_size, esc.classes_num = 32000, 320, 527
    esc.loss_type = "clip_bce"
    torch.manual_seed(0)
    model = htsat_mod.HTSAT_Swin_Transformer(
        spec_size=esc.htsat_spec_size, patch_size=esc.htsat_patch_size,
        in_chans=1, num_classes=esc.classes_num,
        window_size=esc.htsat_window_size, config=esc,
        depths=esc.htsat_depth, embed_dim=esc.htsat_dim,
        patch_stride=esc.htsat_stride, num_heads=esc.htsat_num_head)
    model.eval()
    return model


def test_htsat_full_forward_matches_reference(ref_htsat):
    """waveform -> logmel -> bn0 -> wav2img -> 4 stages -> TSCAM, end to end
    against the reference's own HTSAT_Swin_Transformer (htsat.py:370-826)
    with randomly initialized weights converted via checkpoint.convert."""
    rng = np.random.RandomState(0)
    wave = (rng.randn(1, 32000) * 0.1).astype(np.float32)
    with torch.no_grad():
        expected = ref_htsat(torch.from_numpy(wave))

    from avmoe_tpu.backbones.htsat import HTSATEncoder
    from avmoe_tpu.checkpoint.convert import convert_htsat, torch_state_dict_to_numpy
    from avmoe_tpu.config import HTSATConfig

    enc = HTSATEncoder(HTSATConfig())
    params, batch_stats = convert_htsat(
        torch_state_dict_to_numpy(ref_htsat.state_dict()))
    variables = {"params": params, "batch_stats": batch_stats}
    out = jax.jit(lambda v, w: enc.apply(v, w, train=False))(
        variables, jnp.asarray(wave))

    _allclose(expected["latent_output"], out["latent_output"], rtol=5e-4, atol=5e-4)
    _allclose(expected["clipwise_output"], out["clipwise_output"], rtol=5e-4, atol=1e-5)
    assert tuple(expected["framewise_output"].shape) == tuple(out["framewise_output"].shape)
    _allclose(expected["framewise_output"], out["framewise_output"], rtol=5e-4, atol=1e-5)


def test_yb_loss2_vision_matches_reference():
    crit = load_ref_module(f"{REF_ROOT}/AVE", "criterion")
    rng = np.random.RandomState(3)
    K, C = 4, 25
    prob_x2 = rng.uniform(0.05, 0.95, size=(K, C)).astype(np.float32)
    target = (rng.rand(K, C) < 0.3).astype(np.float32)
    sample_idx = np.array([2, 0, 3, 1])

    class Opt:
        aug_type = "vision"

    expected = crit.YBLoss2()(
        None, _t(prob_x2), None, torch.arange(K), torch.from_numpy(sample_idx),
        _t(target), Opt(), torch.zeros(K), None, None, None)

    from avmoe_tpu.losses.contrastive import yb_loss2
    got = yb_loss2(None, jnp.asarray(prob_x2), jnp.asarray(sample_idx),
                   jnp.asarray(sample_idx), jnp.asarray(target),
                   aug_type="vision")
    _allclose(expected, got)
