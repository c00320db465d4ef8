"""Torch-checkpoint converters: timm Swin-V2 / HTS-AT state_dicts -> flax trees.

The reference loads pretrained backbones from torch checkpoints
(timm swinv2 via create_model(pretrained=True), net_trans_v3.py:513;
HTS-AT .ckpt with a 'state_dict' whose keys are prefixed 'sed_model.',
net_trans_v3.py:560-563). These converters map those tensors onto the
param/batch_stats trees of avmoe_tpu's SwinV2Encoder / HTSATEncoder so
frozen-backbone numerics match the reference bit-for-metric.

Inputs are {name: np.ndarray} dicts (call `torch_state_dict_to_numpy` on a
loaded torch checkpoint first - keeps torch out of the hot path).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from flax import traverse_util


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    # COPY: tensor.numpy() shares storage with the live module, and
    # np.asarray is a no-copy passthrough — without the copy, training the
    # torch model after converting mutates the converted tree in place
    # (caught by tests/test_training_parity.py).
    return {k: np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                        copy=True)
            for k, v in state_dict.items()}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """e.g. HTS-AT ckpts prefix every key with 'sed_model.' (ref :562)."""
    return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}


def _linear(sd, name):
    """torch Linear -> (kernel, bias|None)."""
    w = sd[f"{name}.weight"].T
    b = sd.get(f"{name}.bias")
    return w, b


def _layernorm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _set(flat, path: str, value):
    flat[tuple(path.split("/"))] = np.asarray(value)


def _patch_embed(flat, sd, src: str, dst: str):
    # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
    _set(flat, f"{dst}/proj/kernel", sd[f"{src}.proj.weight"].transpose(2, 3, 1, 0))
    _set(flat, f"{dst}/proj/bias", sd[f"{src}.proj.bias"])
    if f"{src}.norm.weight" in sd:
        _set(flat, f"{dst}/norm/scale", sd[f"{src}.norm.weight"])
        _set(flat, f"{dst}/norm/bias", sd[f"{src}.norm.bias"])


def convert_htsat(
    sd: Dict[str, np.ndarray], depths: Sequence[int] = (2, 2, 6, 2)
) -> Tuple[Dict, Dict]:
    """HTS-AT torch state_dict -> (params, batch_stats) for HTSATEncoder."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}

    # bn0 over mel bins (ref: htsat.py:453)
    _set(p, "bn0/scale", sd["bn0.weight"])
    _set(p, "bn0/bias", sd["bn0.bias"])
    _set(bs, "bn0/mean", sd["bn0.running_mean"])
    _set(bs, "bn0/var", sd["bn0.running_var"])

    _patch_embed(p, sd, "patch_embed", "patch_embed")

    for s, depth in enumerate(depths):
        for i in range(depth):
            src = f"layers.{s}.blocks.{i}"
            dst = f"block_{s}_{i}"
            for ln in ("norm1", "norm2"):
                _set(p, f"{dst}/{ln}/scale", sd[f"{src}.{ln}.weight"])
                _set(p, f"{dst}/{ln}/bias", sd[f"{src}.{ln}.bias"])
            w, b = _linear(sd, f"{src}.attn.qkv")
            _set(p, f"{dst}/attn/qkv/kernel", w)
            _set(p, f"{dst}/attn/qkv/bias", b)
            _set(p, f"{dst}/attn/relative_position_bias_table",
                 sd[f"{src}.attn.relative_position_bias_table"])
            w, b = _linear(sd, f"{src}.attn.proj")
            _set(p, f"{dst}/attn/proj/kernel", w)
            _set(p, f"{dst}/attn/proj/bias", b)
            for fc in ("fc1", "fc2"):
                w, b = _linear(sd, f"{src}.mlp.{fc}")
                _set(p, f"{dst}/mlp/{fc}/kernel", w)
                _set(p, f"{dst}/mlp/{fc}/bias", b)
        if f"layers.{s}.downsample.reduction.weight" in sd:
            _set(p, f"downsample_{s}/norm/scale", sd[f"layers.{s}.downsample.norm.weight"])
            _set(p, f"downsample_{s}/norm/bias", sd[f"layers.{s}.downsample.norm.bias"])
            _set(p, f"downsample_{s}/reduction/kernel",
                 sd[f"layers.{s}.downsample.reduction.weight"].T)

    _set(p, "norm/scale", sd["norm.weight"])
    _set(p, "norm/bias", sd["norm.bias"])
    if "tscam_conv.weight" in sd:
        _set(p, "tscam_conv/kernel", sd["tscam_conv.weight"].transpose(2, 3, 1, 0))
        _set(p, "tscam_conv/bias", sd["tscam_conv.bias"])
        w, b = _linear(sd, "head")
        _set(p, "head/kernel", w)
        _set(p, "head/bias", b)
    return traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(bs)


def _grouped_conv1x1(w: np.ndarray, groups: int) -> np.ndarray:
    """torch grouped Conv2d(k=1) weight (out, in/g, 1, 1) -> GroupedDense
    kernel (g, in/g, out/g)."""
    w = w.reshape(w.shape[0], w.shape[1])
    out, in_g = w.shape
    return w.reshape(groups, out // groups, in_g).transpose(0, 2, 1)


def _bn(p, bs, sd, src: str, dst: str) -> None:
    _set(p, f"{dst}/scale", sd[f"{src}.weight"])
    _set(p, f"{dst}/bias", sd[f"{src}.bias"])
    _set(bs, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(bs, f"{dst}/var", sd[f"{src}.running_var"])


def convert_moe_adapter(
    sd: Dict[str, np.ndarray],
    *,
    num_multimodal: int = 1,
    num_singlemodal: int = 1,
    num_conv_group: int = 2,
    use_bn: bool = True,
    use_gate: bool = True,
    before_layernorm: bool = True,
    post_layernorm: bool = True,
    self_attention: str = "none",
) -> Tuple[Dict, Dict]:
    """Reference MoEAdapter state_dict (net_trans_v3.py:438-487) ->
    (params, batch_stats) for avmoe_tpu.moe.adapter.MoEAdapter.

    The reference keeps E separate ExpertAdapter modules; the TPU version
    evaluates them as ONE stacked vmap module, so per-expert tensors are
    stacked along a new leading axis. The reference's conv_adapter (token-axis
    1x1 conv) + fc (channel Linear) become token_proj_*/fc_* (the projection
    order optimization in MoEAdapter folds the conv bias through fc's column
    sums - same function).
    """
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}

    _set(p, "token_proj_kernel", sd["conv_adapter.weight"].reshape(
        sd["conv_adapter.weight"].shape[:2]))
    _set(p, "token_proj_bias", sd["conv_adapter.bias"])
    w, b = _linear(sd, "fc")
    _set(p, "fc_kernel", w)
    _set(p, "fc_bias", b)
    for i, lyr in enumerate((0, 2)):
        w, b = _linear(sd, f"router.{lyr}")
        _set(p, f"router_fc{i}/kernel", w)
        _set(p, f"router_fc{i}/bias", b)
    w, b = _linear(sd, "router.4")
    _set(p, "router_out/kernel", w)
    _set(p, "router_out/bias", b)

    def stack(prefix: str, n: int, key: str) -> np.ndarray:
        return np.stack([sd[f"{prefix}.{i}.{key}"] for i in range(n)])

    def convert_experts(prefix: str, dst: str, n: int, multimodal: bool) -> None:
        if n == 0:
            return
        if multimodal:
            _set(p, f"{dst}/latent_tokens", stack(prefix, n, "my_tokens"))
            _set(p, f"{dst}/gate_av", stack(prefix, n, "gate_av"))
        elif self_attention == "bmm":
            # AVVP unimodal experts gate their dot-product self-attn with the
            # same gate_av parameter name (mgn.py:132-146)
            _set(p, f"{dst}/gate_av", stack(prefix, n, "gate_av"))
        elif self_attention == "token":
            # AVS v2 latent-token self-attention (PVT_AVSModel_v2.py:144-145)
            _set(p, f"{dst}/latent_tokens", stack(prefix, n, "my_tokens"))
            _set(p, f"{dst}/gate_self", stack(prefix, n, "gate_self"))
        elif self_attention == "mha":
            # AVS v1 unimodal experts: per-expert nn.MultiheadAttention
            # (PVT_AVSModel_v2.py:142); convert each then stack leaves along
            # the expert axis
            per = []
            for i in range(n):
                q: Dict[Tuple[str, ...], np.ndarray] = {}
                _mha(q, sd, f"{prefix}.{i}.self_attention", "self_attention", 4)
                per.append(q)
            for key in per[0]:
                p[(dst,) + key] = np.stack([q[key] for q in per])
        if use_gate:
            _set(p, f"{dst}/gate", stack(prefix, n, "gate"))
        if before_layernorm:
            _set(p, f"{dst}/ln_before/scale", stack(prefix, n, "ln_before.weight"))
            _set(p, f"{dst}/ln_before/bias", stack(prefix, n, "ln_before.bias"))
        if post_layernorm:
            _set(p, f"{dst}/ln_post/scale", stack(prefix, n, "ln_post.weight"))
            _set(p, f"{dst}/ln_post/bias", stack(prefix, n, "ln_post.bias"))
        _set(p, f"{dst}/bottleneck/down/kernel", np.stack([
            _grouped_conv1x1(sd[f"{prefix}.{i}.down_sampler.weight"], num_conv_group)
            for i in range(n)]))
        _set(p, f"{dst}/bottleneck/up/kernel", np.stack([
            _grouped_conv1x1(sd[f"{prefix}.{i}.up_sampler.weight"], num_conv_group)
            for i in range(n)]))
        if use_bn:
            for bn in ("bn1", "bn2"):
                _set(p, f"{dst}/bottleneck/{bn}/scale", stack(prefix, n, f"{bn}.weight"))
                _set(p, f"{dst}/bottleneck/{bn}/bias", stack(prefix, n, f"{bn}.bias"))
                _set(bs, f"{dst}/bottleneck/{bn}/mean",
                     stack(prefix, n, f"{bn}.running_mean"))
                _set(bs, f"{dst}/bottleneck/{bn}/var",
                     stack(prefix, n, f"{bn}.running_var"))

    convert_experts("multimodal_experts", "multimodal_experts",
                    num_multimodal, True)
    convert_experts("singlemodal_experts", "singlemodal_experts",
                    num_singlemodal, False)
    return traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(bs)


def convert_swinv2_timm(
    sd: Dict[str, np.ndarray], depths: Sequence[int] = (2, 2, 18, 2)
) -> Dict:
    """timm SwinTransformerV2 state_dict -> params for SwinV2Encoder."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    _patch_embed(p, sd, "patch_embed", "patch_embed")

    for s, depth in enumerate(depths):
        for i in range(depth):
            src = f"layers.{s}.blocks.{i}"
            dst = f"block_{s}_{i}"
            for ln in ("norm1", "norm2"):
                _set(p, f"{dst}/{ln}/scale", sd[f"{src}.{ln}.weight"])
                _set(p, f"{dst}/{ln}/bias", sd[f"{src}.{ln}.bias"])
            _set(p, f"{dst}/attn/qkv_kernel", sd[f"{src}.attn.qkv.weight"].T)
            _set(p, f"{dst}/attn/q_bias", sd[f"{src}.attn.q_bias"])
            _set(p, f"{dst}/attn/v_bias", sd[f"{src}.attn.v_bias"])
            _set(p, f"{dst}/attn/logit_scale", sd[f"{src}.attn.logit_scale"])
            # continuous position bias MLP: Sequential(Linear(2,512), ReLU, Linear(512,nH))
            w, b = _linear(sd, f"{src}.attn.cpb_mlp.0")
            _set(p, f"{dst}/attn/cpb_fc1/kernel", w)
            _set(p, f"{dst}/attn/cpb_fc1/bias", b)
            _set(p, f"{dst}/attn/cpb_fc2/kernel", sd[f"{src}.attn.cpb_mlp.2.weight"].T)
            w, b = _linear(sd, f"{src}.attn.proj")
            _set(p, f"{dst}/attn/proj/kernel", w)
            _set(p, f"{dst}/attn/proj/bias", b)
            for fc in ("fc1", "fc2"):
                w, b = _linear(sd, f"{src}.mlp.{fc}")
                _set(p, f"{dst}/mlp/{fc}/kernel", w)
                _set(p, f"{dst}/mlp/{fc}/bias", b)
        if f"layers.{s}.downsample.reduction.weight" in sd:
            _set(p, f"downsample_{s}/reduction/kernel",
                 sd[f"layers.{s}.downsample.reduction.weight"].T)
            _set(p, f"downsample_{s}/norm/scale", sd[f"layers.{s}.downsample.norm.weight"])
            _set(p, f"downsample_{s}/norm/bias", sd[f"layers.{s}.downsample.norm.bias"])

    _set(p, "norm/scale", sd["norm.weight"])
    _set(p, "norm/bias", sd["norm.bias"])
    return traverse_util.unflatten_dict(p)


def convert_lockstep_encoder(
    sd: Dict[str, np.ndarray],
    *,
    n_sites: int = 12,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
    p1: bool = True,
    p2: bool = True,
    moe_kwargs: Optional[Dict] = None,
    vis_use_gate: Optional[bool] = None,
) -> Tuple[Dict, Dict]:
    """Reference MMIL_Net-style state_dict (swin.* + htsat.* +
    {audio,vis}_moe_adapter_blocks_p{1,2}.{i}.*, net_trans_v3.py:489-637) ->
    (params, batch_stats) for moe.injection.LockstepEncoder.

    This is the weight path for the reference's published AVE checkpoints
    (e.g. best_82.18.pt): backbones + every MoE adapter site."""
    moe_kwargs = moe_kwargs or {}
    p: Dict = {"swin": convert_swinv2_timm(strip_prefix(
        {k: v for k, v in sd.items() if k.startswith("swin.")}, "swin."),
        swin_depths)}
    hp, hbs = convert_htsat(strip_prefix(
        {k: v for k, v in sd.items() if k.startswith("htsat.")}, "htsat."),
        htsat_depths)
    p["htsat"] = hp
    bs: Dict = {"htsat": hbs}

    pairs = []
    if p1:
        pairs += [("audio_moe_adapter_blocks_p1", "audio_moe_p1"),
                  ("vis_moe_adapter_blocks_p1", "vis_moe_p1")]
    if p2:
        pairs += [("audio_moe_adapter_blocks_p2", "audio_moe_p2"),
                  ("vis_moe_adapter_blocks_p2", "vis_moe_p2")]
    for src, dst in pairs:
        kw = dict(moe_kwargs)
        if dst.startswith("vis_") and vis_use_gate is not None:
            # reference vis-side adapters hardcode use_gate=True while the
            # audio side follows opt.is_gate (net_avst_v2.py:580/589)
            kw["use_gate"] = vis_use_gate
        for i in range(n_sites):
            sub = strip_prefix(
                {k: v for k, v in sd.items() if k.startswith(f"{src}.{i}.")},
                f"{src}.{i}.")
            ap, abs_ = convert_moe_adapter(sub, **kw)
            p[f"{dst}_{i}"] = ap
            if abs_:
                bs[f"{dst}_{i}"] = abs_
    return p, bs


def _conv(p, sd, src: str, dst: str) -> None:
    """torch Conv2d (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)."""
    _set(p, f"{dst}/kernel", sd[f"{src}.weight"].transpose(2, 3, 1, 0))
    if f"{src}.bias" in sd:
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])


def convert_pvt_v2(
    sd: Dict[str, np.ndarray],
    depths: Sequence[int] = (3, 6, 40, 3),
    sr_ratios: Sequence[int] = (8, 4, 2, 1),
) -> Dict:
    """Reference PVT-v2 state_dict (avs_s4/model/pvt.py:218-425, pretrained
    load at :413 / config paths avs_s4/config.py:12-36) -> params for
    backbones.pvt.PVTv2."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    for s in range(4):
        pe = f"patch_embed{s + 1}"
        _conv(p, sd, f"{pe}.proj", f"{pe}/proj")
        _ln(p, sd, f"{pe}.norm", f"{pe}/norm")
        for i in range(depths[s]):
            src = f"block{s + 1}.{i}"
            dst = f"block{s + 1}_{i}"
            _ln(p, sd, f"{src}.norm1", f"{dst}/norm1")
            _ln(p, sd, f"{src}.norm2", f"{dst}/norm2")
            _dense(p, sd, f"{src}.attn.q", f"{dst}/attn/q")
            _dense(p, sd, f"{src}.attn.kv", f"{dst}/attn/kv")
            _dense(p, sd, f"{src}.attn.proj", f"{dst}/attn/proj")
            if sr_ratios[s] > 1:
                _conv(p, sd, f"{src}.attn.sr", f"{dst}/attn/sr")
                _ln(p, sd, f"{src}.attn.norm", f"{dst}/attn/norm")
            _dense(p, sd, f"{src}.mlp.fc1", f"{dst}/mlp/fc1")
            _dense(p, sd, f"{src}.mlp.fc2", f"{dst}/mlp/fc2")
            _conv(p, sd, f"{src}.mlp.dwconv.dwconv", f"{dst}/mlp/dwconv/dwconv")
        _ln(p, sd, f"norm{s + 1}", f"norm{s + 1}")
    return traverse_util.unflatten_dict(p)


def _resnet_block(p, bs, sd, src: str, dst: str, convs: int) -> None:
    for c in range(1, convs + 1):
        _conv(p, sd, f"{src}.conv{c}", f"{dst}/conv{c}")
        _bn(p, bs, sd, f"{src}.bn{c}", f"{dst}/bn{c}")
    if f"{src}.downsample.0.weight" in sd:
        _conv(p, sd, f"{src}.downsample.0", f"{dst}/downsample_conv")
        _bn(p, bs, sd, f"{src}.downsample.1", f"{dst}/downsample_bn")


def convert_b2_resnet(
    sd: Dict[str, np.ndarray], depths: Sequence[int] = (3, 4, 6, 3)
) -> Tuple[Dict, Dict]:
    """Reference B2_ResNet (avs_s4/model/resnet.py:82-140; pretrained load in
    ResNet_AVSModel.py:1-60) -> (params, batch_stats) for backbones.resnet.
    B2ResNet, including the layer3_1/layer4_1 branch."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}
    _conv(p, sd, "conv1", "conv1")
    _bn(p, bs, sd, "bn1", "bn1")
    layers = [("layer1", depths[0]), ("layer2", depths[1]),
              ("layer3_1", depths[2]), ("layer4_1", depths[3]),
              ("layer3_2", depths[2]), ("layer4_2", depths[3])]
    for name, depth in layers:
        if f"{name}.0.conv1.weight" not in sd:
            continue
        for i in range(depth):
            _resnet_block(p, bs, sd, f"{name}.{i}", f"{name}/block_{i}", 3)
    return traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(bs)


def convert_resnet18(
    sd: Dict[str, np.ndarray], depths: Sequence[int] = (2, 2, 2, 2)
) -> Tuple[Dict, Dict]:
    """torchvision-style ResNet18 (grounding_gen/visual_net.py:117-231) ->
    (params, batch_stats) for backbones.legacy.ResNet18."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}
    _conv(p, sd, "conv1", "conv1")
    _bn(p, bs, sd, "bn1", "bn1")
    for s in range(4):
        for i in range(depths[s]):
            _resnet_block(p, bs, sd, f"layer{s + 1}.{i}", f"layer{s + 1}_{i}", 2)
    if "fc.weight" in sd:
        _dense(p, sd, "fc", "fc")
    return traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(bs)


# torchvggish VGG nn.Sequential indices (ref: torchvggish/vggish.py:9-33)
_VGGISH_FEATURES = [(0, "conv1"), (3, "conv2"), (6, "conv3_1"), (8, "conv3_2"),
                    (11, "conv4_1"), (13, "conv4_2")]
_VGGISH_EMBEDDINGS = [(0, "fc1_1"), (2, "fc1_2"), (4, "fc2")]


def convert_vggish(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvggish VGG state_dict (ref: avs_s4/torchvggish/vggish.py:143-195,
    frozen audio_extractor in avs_s4/train_v2.py:57-64) -> params for
    backbones.vggish.VGGish."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    for idx, dst in _VGGISH_FEATURES:
        _conv(p, sd, f"features.{idx}", dst)
    for idx, dst in _VGGISH_EMBEDDINGS:
        _dense(p, sd, f"embeddings.{idx}", dst)
    return traverse_util.unflatten_dict(p)


def convert_vggish_pca(sd: Dict[str, np.ndarray]):
    """PCA params file (ref: vggish.py:34-100 Postprocessor) ->
    VGGishPostprocessor."""
    from avmoe_tpu.backbones.vggish import VGGishPostprocessor

    return VGGishPostprocessor(sd["pca_eigen_vectors"], sd["pca_means"])


def _mha(p, sd, src: str, dst: str, num_heads: int) -> None:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    D = sd[f"{src}.in_proj_weight"].shape[1]
    hd = D // num_heads
    wq, wk, wv = np.split(sd[f"{src}.in_proj_weight"], 3, axis=0)
    bq, bk, bv = np.split(sd[f"{src}.in_proj_bias"], 3, axis=0)
    for name, w, b in (("query", wq, bq), ("key", wk, bk), ("value", wv, bv)):
        _set(p, f"{dst}/{name}/kernel", w.T.reshape(D, num_heads, hd))
        _set(p, f"{dst}/{name}/bias", b.reshape(num_heads, hd))
    _set(p, f"{dst}/out/kernel",
         sd[f"{src}.out_proj.weight"].T.reshape(num_heads, hd, D))
    _set(p, f"{dst}/out/bias", sd[f"{src}.out_proj.bias"])


def _dense(p, sd, src: str, dst: str) -> None:
    w, b = _linear(sd, src)
    _set(p, f"{dst}/kernel", w)
    if b is not None:
        _set(p, f"{dst}/bias", b)


def _ln(p, sd, src: str, dst: str) -> None:
    _set(p, f"{dst}/scale", sd[f"{src}.weight"])
    _set(p, f"{dst}/bias", sd[f"{src}.bias"])


def _lstm_dir(p, sd, src: str, dst: str, suffix: str) -> None:
    # torch LSTM packs gates (i,f,g,o) row-blocks in weight_ih/weight_hh with
    # two bias vectors (summed at runtime); flax OptimizedLSTMCell keeps one
    # Dense per gate: i{g} on inputs (no bias) + h{g} on hidden (with bias).
    wih = sd[f"{src}.weight_ih_l0{suffix}"]   # (4H, in)
    whh = sd[f"{src}.weight_hh_l0{suffix}"]   # (4H, H)
    bias = sd[f"{src}.bias_ih_l0{suffix}"] + sd[f"{src}.bias_hh_l0{suffix}"]
    H = whh.shape[1]
    for gi, g in enumerate("ifgo"):
        _set(p, f"{dst}/i{g}/kernel", wih[gi * H:(gi + 1) * H].T)
        _set(p, f"{dst}/h{g}/kernel", whh[gi * H:(gi + 1) * H].T)
        _set(p, f"{dst}/h{g}/bias", bias[gi * H:(gi + 1) * H])


def convert_bilstm(p, sd, src: str, dst: str) -> None:
    _lstm_dir(p, sd, src, f"{dst}/fwd_cell", "")
    _lstm_dir(p, sd, src, f"{dst}/bwd_cell", "_reverse")


def _enc_dec_layer(p, sd, src: str, dst: str, attn_src: str, attn_dst: str,
                   num_heads: int = 4) -> None:
    _mha(p, sd, f"{src}.{attn_src}", f"{dst}/{attn_dst}", num_heads)
    _dense(p, sd, f"{src}.linear1", f"{dst}/ff1")
    _dense(p, sd, f"{src}.linear2", f"{dst}/ff2")
    _ln(p, sd, f"{src}.norm1", f"{dst}/norm1")
    _ln(p, sd, f"{src}.norm2", f"{dst}/norm2")


def convert_temporal_attention(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference TemporalAttention (net_trans_v3.py:180-253) -> params for
    heads.ave.TemporalAttention. The reference DecoderLayer's unused
    self_attn (models.py:133 constructs it; forward never calls it) is
    dropped."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    _dense(p, sd, "a_fc", "a_fc")
    _dense(p, sd, "v_fc", "v_fc")
    convert_bilstm(p, sd, "audio_visual_rnn_layer.audio_rnn", "audio_rnn")
    convert_bilstm(p, sd, "audio_visual_rnn_layer.visual_rnn", "visual_rnn")
    for side in ("video", "audio"):
        _dense(p, sd, f"{side}_encoder.affine_matrix", f"{side}_enc_affine")
        for i in range(2):
            _enc_dec_layer(p, sd, f"{side}_encoder.encoder.layers.{i}",
                           f"{side}_encoder/layer_{i}", "self_attn", "self_attn")
        _dense(p, sd, f"{side}_decoder.affine_matrix", f"{side}_dec_affine")
        _enc_dec_layer(p, sd, f"{side}_decoder.decoder.layers.0",
                       f"{side}_decoder/layer_0", "multihead_attn", "cross_attn")
        _dense(p, sd, f"{side}_gated.0", f"{side}_gated")
    return traverse_util.unflatten_dict(p)


def convert_cmbs(sd: Dict[str, np.ndarray], *, inter: bool = False) -> Dict:
    """Reference CMBS (net_trans_v3.py:256-293) -> params for heads.ave.CMBSHead."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    _dense(p, sd, "video_cas", "video_cas")
    _dense(p, sd, "audio_cas", "audio_cas")
    _dense(p, sd, "localize_module.classifier", "classifier")
    _dense(p, sd, "localize_module.event_classifier", "event_classifier")
    if inter:
        for src, dst in (("AVInter", "av_inter"), ("VAInter", "va_inter")):
            _mha(p, sd, f"{src}.video_multihead", f"{dst}/mha", 4)
            _ln(p, sd, f"{src}.norm1", f"{dst}/norm1")
    return traverse_util.unflatten_dict(p)


def convert_mmil_net(
    sd: Dict[str, np.ndarray],
    *,
    n_sites: int = 8,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
    inter: bool = False,
    encoder_scope: str = "encoder",
) -> Tuple[Dict, Dict]:
    """Full reference MMIL_Net state_dict (the published AVE checkpoints,
    e.g. best_82.18.pt) -> (params, batch_stats) for models.ave.AVEModel."""
    ep, ebs = convert_lockstep_encoder(
        sd, n_sites=n_sites, swin_depths=swin_depths, htsat_depths=htsat_depths)
    params: Dict = {encoder_scope: ep,
                    "temporal_attn": convert_temporal_attention(strip_prefix(
                        {k: v for k, v in sd.items()
                         if k.startswith("temporal_attn.")}, "temporal_attn.")),
                    "cmbs": convert_cmbs(strip_prefix(
                        {k: v for k, v in sd.items() if k.startswith("CMBS.")},
                        "CMBS."), inter=inter)}
    return params, {encoder_scope: ebs}


def graft_backbones(
    variables: Dict,
    *,
    swin_sd: Optional[Dict[str, np.ndarray]] = None,
    htsat_sd: Optional[Dict[str, np.ndarray]] = None,
    encoder_scope: str = "encoder",
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
) -> Dict:
    """Graft converted torch backbone weights into a model's variables tree."""
    params = traverse_util.flatten_dict(variables["params"])
    batch_stats = traverse_util.flatten_dict(variables.get("batch_stats", {}))

    def graft(sub: Dict, scope: Tuple[str, ...], target):
        for k, v in traverse_util.flatten_dict(sub).items():
            key = scope + k
            assert key in target, f"missing {key}"
            assert target[key].shape == v.shape, (key, target[key].shape, v.shape)
            target[key] = v.astype(np.asarray(target[key]).dtype)

    if swin_sd is not None:
        graft(convert_swinv2_timm(swin_sd, swin_depths),
              (encoder_scope, "swin"), params)
    if htsat_sd is not None:
        hp, hbs = convert_htsat(htsat_sd, htsat_depths)
        graft(hp, (encoder_scope, "htsat"), params)
        graft(hbs, (encoder_scope, "htsat"), batch_stats)

    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(params)
    if batch_stats:
        out["batch_stats"] = traverse_util.unflatten_dict(batch_stats)
    return out


# ----------------------------------------------------------- AVS (Pred_endecoder)


def _conv3d_1x1(p, sd, src: str, dst: str) -> None:
    """torch Conv3d k=1 (O, I, 1, 1, 1) -> flax Dense kernel (I, O)."""
    w = sd[f"{src}.weight"]
    _set(p, f"{dst}/kernel", w.reshape(w.shape[0], w.shape[1]).T)
    if f"{src}.bias" in sd:
        _set(p, f"{dst}/bias", sd[f"{src}.bias"])


def convert_tpavi(p, bs, sd, src: str, dst: str) -> None:
    """Reference TPAVIModule 'dot'/dim-3 (TPAVI.py:6-190) ->
    heads.avs.TPAVIModule."""
    _dense(p, sd, f"{src}.align_channel", f"{dst}/align_channel")
    for nm in ("g", "theta", "phi"):
        _conv3d_1x1(p, sd, f"{src}.{nm}", f"{dst}/{nm}")
    # W_z = Sequential(Conv3d k1, BatchNorm3d); flax Conv kernel (1,1,1,I,O)
    w = sd[f"{src}.W_z.0.weight"]
    _set(p, f"{dst}/W_z_conv/kernel", w.transpose(2, 3, 4, 1, 0))
    _set(p, f"{dst}/W_z_conv/bias", sd[f"{src}.W_z.0.bias"])
    _bn(p, bs, sd, f"{src}.W_z.1", f"{dst}/W_z_bn")
    _ln(p, sd, f"{src}.norm_layer", f"{dst}/norm_layer")


def _residual_conv_unit(p, sd, src: str, dst: str) -> None:
    _conv(p, sd, f"{src}.conv1", f"{dst}/conv1")
    _conv(p, sd, f"{src}.conv2", f"{dst}/conv2")


def convert_avs_temporal_attention(p, sd, src: str, dst: str) -> None:
    """Reference AVS 4-scale TemporalAttention (PVT_AVSModel_v2.py:448-583) ->
    heads.avs.MultiScaleTemporalAttention. The audio_decoder/video_decoder
    stacks are converted-SKIPPED: the reference computes their outputs but
    never uses them (only the encoder features feed the gates)."""
    for i in range(4):
        _dense(p, sd, f"{src}.v_fc.{i}", f"{dst}/v_fc_{i}")
        convert_bilstm(p, sd, f"{src}.audio_visual_rnn_layer.{i}.audio_rnn",
                       f"{dst}/audio_rnn_{i}")
        convert_bilstm(p, sd, f"{src}.audio_visual_rnn_layer.{i}.visual_rnn",
                       f"{dst}/visual_rnn_{i}")
        for side in ("video", "audio"):
            _dense(p, sd, f"{src}.{side}_encoder.{i}.affine_matrix",
                   f"{dst}/{side}_enc_affine_{i}")
            for j in range(2):
                _enc_dec_layer(
                    p, sd, f"{src}.{side}_encoder.{i}.encoder.layers.{j}",
                    f"{dst}/{side}_encoder_{i}/layer_{j}", "self_attn", "self_attn")
            _dense(p, sd, f"{src}.{side}_gated.{i}.0", f"{dst}/{side}_gated_{i}")


def convert_pred_endecoder(
    sd: Dict[str, np.ndarray],
    *,
    n_sites: int = 12,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
    tpavi_stages: Sequence[int] = (0, 1, 2, 3),
    moe_kwargs: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """Full reference AVS Pred_endecoder state_dict (avs_s4/model/
    PVT_AVSModel_v2.py:585-955; ms3 variant :772-1139) -> (params,
    batch_stats) for models.avs.AVSModel. Unused reference modules are
    dropped: encoder_backbone (pvt instantiated, never run), conv1-4
    Classifier_Modules and x*_linear (the forward uses x*_linear_ instead),
    and the temporal-attention decoder stacks."""
    moe_kwargs = dict(moe_kwargs or {})
    # AVS base_options defaults: is_bn=0, is_gate=0 (audio; vis stays gated);
    # train_v2.sh: is_self_attention=1 (v1 = per-expert MultiheadAttention)
    moe_kwargs.setdefault("use_bn", False)
    moe_kwargs.setdefault("use_gate", False)
    moe_kwargs.setdefault("self_attention", "mha")
    ep, ebs = convert_lockstep_encoder(
        sd, n_sites=n_sites, swin_depths=swin_depths,
        htsat_depths=htsat_depths, moe_kwargs=moe_kwargs, vis_use_gate=True)
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}
    for i in range(4):
        _dense(p, sd, f"x{i + 1}_linear_", f"stage_proj_{i}")
    _dense(p, sd, "audio_linear", "audio_linear")
    convert_avs_temporal_attention(p, sd, "temporal_attn", "temporal_attn")
    for i in tpavi_stages:
        convert_tpavi(p, bs, sd, f"tpavi_b{i + 1}", f"tpavi_b{i + 1}")
    for i in range(4):
        src = f"path{i + 1}"
        _residual_conv_unit(p, sd, f"{src}.resConfUnit1", f"path_{i}/res1")
        _residual_conv_unit(p, sd, f"{src}.resConfUnit2", f"path_{i}/res2")
    _conv(p, sd, "output_conv.0", "out_conv1")
    _conv(p, sd, "output_conv.2", "out_conv2")
    _conv(p, sd, "output_conv.4", "out_conv3")
    params: Dict = {"encoder": ep, **traverse_util.unflatten_dict(p)}
    stats: Dict = {"encoder": ebs, **traverse_util.unflatten_dict(bs)}
    return params, stats


# ------------------------------------------------- AVVP grouping heads (MGN)


def _grouping_mlp(p, sd, src: str, dst: str) -> None:
    _dense(p, sd, f"{src}.fc1", f"{dst}/fc1")
    _dense(p, sd, f"{src}.fc2", f"{dst}/fc2")


def _proj_attn(p, sd, src: str, dst: str) -> None:
    """grouping.py Attention / AssignAttention (separate q/k/v projections)."""
    for nm in ("q_proj", "k_proj", "v_proj", "proj"):
        _dense(p, sd, f"{src}.{nm}", f"{dst}/{nm}")


def _fused_qkv_attn(p, sd, src: str, dst: str) -> None:
    """grouping.py Attention with qkv_fuse=True (AttnBlock, grouping.py:515-522):
    split the fused (3C, C) qkv weight into the separate q/k/v projections our
    ProjAttention uses (row blocks are [q; k; v])."""
    w = sd[f"{src}.qkv.weight"]
    b = sd.get(f"{src}.qkv.bias")
    C = w.shape[0] // 3
    for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
        _set(p, f"{dst}/{nm}/kernel", w[i * C:(i + 1) * C].T)
        if b is not None:
            _set(p, f"{dst}/{nm}/bias", b[i * C:(i + 1) * C])
    _dense(p, sd, f"{src}.proj", f"{dst}/proj")


def convert_grouping_block(p, sd, src: str, dst: str) -> None:
    """grouping.py GroupingBlock (:167-274) == GroupingBlock_Han (:276-380,
    byte-identical class) -> heads.grouping.GroupingBlock."""
    for ln in ("norm_tokens", "norm_post_tokens", "norm_x", "norm_new_x"):
        _ln(p, sd, f"{src}.{ln}", f"{dst}/{ln}")
    _grouping_mlp(p, sd, f"{src}.mlp_inter", f"{dst}/mlp_inter")
    # pre_assign_attn is the post-norm CrossAttnBlock (norm_q/norm_k Identity)
    _proj_attn(p, sd, f"{src}.pre_assign_attn.attn", f"{dst}/pre_assign_attn/attn")
    _ln(p, sd, f"{src}.pre_assign_attn.norm2", f"{dst}/pre_assign_attn/norm2")
    _ln(p, sd, f"{src}.pre_assign_attn.norm_post", f"{dst}/pre_assign_attn/norm_post")
    _grouping_mlp(p, sd, f"{src}.pre_assign_attn.mlp", f"{dst}/pre_assign_attn/mlp")
    _proj_attn(p, sd, f"{src}.assign", f"{dst}/assign")
    _grouping_mlp(p, sd, f"{src}.mlp_channels", f"{dst}/mlp_channels")
    if f"{src}.reduction.1.weight" in sd:  # Sequential(norm, Linear) when dim != out_dim
        _ln(p, sd, f"{src}.reduction.0", f"{dst}/reduction_norm")
        _set(p, f"{dst}/reduction_fc/kernel", sd[f"{src}.reduction.1.weight"].T)


def convert_modality_trans(
    sd: Dict[str, np.ndarray], *, depth: int, use_han: bool = False
) -> Dict:
    """grouping.py ModalityTrans (:662-775) -> heads.grouping.ModalityTrans."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    for i in range(depth):
        src, dst = f"blocks.{i}", f"block_{i}"
        _ln(p, sd, f"{src}.norm1", f"{dst}/norm1")
        _fused_qkv_attn(p, sd, f"{src}.attn", f"{dst}/attn")
        _ln(p, sd, f"{src}.norm2", f"{dst}/norm2")
        _grouping_mlp(p, sd, f"{src}.mlp", f"{dst}/mlp")
    if use_han:
        convert_grouping_block(p, sd, "han_encoder", "han_encoder")
    convert_grouping_block(p, sd, "grouping", "grouping")
    return traverse_util.unflatten_dict(p)


def convert_avqa_fusion_net(
    sd: Dict[str, np.ndarray],
    *,
    n_sites: int = 12,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
    moe_kwargs: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """Full reference AVQA_Fusion_Net state_dict (AVQA/net_grd_avst/
    net_avst_v2.py:443-833) -> (params, batch_stats) for
    models.avqa.AVQAFusionModel. The reference's unused fc_a1_pure/fc_a2_pure,
    norm3 and the grounding-gen visual_net are dropped."""
    moe_kwargs = dict(moe_kwargs or {})
    # AVQA base_options defaults: is_bn=0, is_gate=0 (audio; vis stays gated),
    # num_conv_group=4; train_v2.sh: 1 multimodal + 2 singlemodal experts
    moe_kwargs.setdefault("use_bn", False)
    moe_kwargs.setdefault("use_gate", False)
    moe_kwargs.setdefault("num_conv_group", 4)
    moe_kwargs.setdefault("num_singlemodal", 2)
    ren: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        for a, b in (("audio_adapter_blocks_", "audio_moe_adapter_blocks_"),
                     ("vis_adapter_blocks_", "vis_moe_adapter_blocks_")):
            if k.startswith(a):
                k = b + k[len(a):]
                break
        ren[k] = v
    ep, ebs = convert_lockstep_encoder(
        ren, n_sites=n_sites, swin_depths=swin_depths,
        htsat_depths=htsat_depths, moe_kwargs=moe_kwargs, vis_use_gate=True)
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name in ("fc_a1", "fc_a2", "fc_gl", "fc_fusion", "fc_ans",
                 "fc1", "fc2", "fc3", "fc4"):
        _dense(flat, sd, name, name)
    _set(flat, "question_encoder/word2vec/embedding",
         sd["question_encoder.word2vec.weight"])
    _lstm_dir(flat, sd, "question_encoder.lstm", "question_encoder/lstm", "")
    _dense(flat, sd, "question_encoder.fc", "question_encoder/fc")
    # question-as-query attention + flat FFN/norm params -> the attn_v/attn_a
    # submodules (ref names: attn_v+linear11/12+norm1, attn_a+linear21/22+norm2)
    for dst, mha_src, l1, l2, ln in (("attn_v", "attn_v", "linear11", "linear12", "norm1"),
                                     ("attn_a", "attn_a", "linear21", "linear22", "norm2")):
        _mha(flat, sd, mha_src, f"{dst}/attn", 4)
        _dense(flat, sd, l1, f"{dst}/linear1")
        _dense(flat, sd, l2, f"{dst}/linear2")
        _ln(flat, sd, ln, f"{dst}/norm")
    params: Dict = {"encoder": ep, **traverse_util.unflatten_dict(flat)}
    return params, {"encoder": ebs}


def convert_mgn_net(
    sd: Dict[str, np.ndarray],
    *,
    n_sites: int = 12,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
    grouping_depths: Sequence[int] = (3, 3, 6),
    moe_kwargs: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """Full reference MGN_Net state_dict (AVVP/nets/mgn.py:227-559) ->
    (params, batch_stats) for models.avvp.MGNModel."""
    moe_kwargs = dict(moe_kwargs or {})
    moe_kwargs.setdefault("use_bn", False)           # AVVP train.sh is_bn=0
    moe_kwargs.setdefault("self_attention", "bmm")   # mgn.py:132-146
    # MGN names its adapter lists audio_adapter_blocks_p{1,2} /
    # vis_adapter_blocks_p{1,2} (mgn.py:395-425); rename into the AVE scheme
    # the lockstep converter expects.
    ren: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        for a, b in (("audio_adapter_blocks_", "audio_moe_adapter_blocks_"),
                     ("vis_adapter_blocks_", "vis_moe_adapter_blocks_")):
            if k.startswith(a):
                k = b + k[len(a):]
                break
        ren[k] = v
    ep, ebs = convert_lockstep_encoder(
        ren, n_sites=n_sites, swin_depths=swin_depths,
        htsat_depths=htsat_depths, moe_kwargs=moe_kwargs)
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name in ("fc_a", "fc_v", "fc_st", "fc_fusion",
                 "fc_prob", "fc_prob_a", "fc_prob_v", "fc_cls"):
        _dense(flat, sd, name, name)
    _set(flat, "audio_token", sd["audio_token"])
    _set(flat, "visual_token", sd["visual_token"])
    params: Dict = {"encoder": ep, **traverse_util.unflatten_dict(flat)}
    d_aud, d_vis, d_av = grouping_depths
    for scope, depth, han in (("audio_cug", d_aud, True),
                              ("visual_cug", d_vis, False),
                              ("av_mcg", d_av, False)):
        params[scope] = convert_modality_trans(
            strip_prefix({k: v for k, v in sd.items()
                          if k.startswith(f"{scope}.")}, f"{scope}."),
            depth=depth, use_han=han)
    return params, {"encoder": ebs}


# ------------------------------------------------- legacy AVE (MMIL v1 / v2)


def convert_dgsct_adapter(
    sd: Dict[str, np.ndarray],
    *,
    num_conv_group: int = 2,
    use_bn: bool = True,
    use_gate: bool = True,
    before_layernorm: bool = True,
    post_layernorm: bool = True,
) -> Tuple[Dict, Dict]:
    """Reference VisualAdapter (net_trans.py:437-666) -> (params, batch_stats)
    for moe.dgsct_adapter.DGSCTAdapter. The unused gate_tk parameter
    (net_trans.py:487, never read in forward) is dropped."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}
    _set(p, "token_proj_kernel", sd["conv_adapter.weight"].reshape(
        sd["conv_adapter.weight"].shape[:2]))
    _set(p, "token_proj_bias", sd["conv_adapter.bias"])
    for name in ("fc", "fc_affine_audio_1", "fc_affine_video_1",
                 "fc_affine_bottleneck", "fc_affine_video_2",
                 "fc_affine_audio_2", "fc_affine_v_s_att",
                 "fc_affine_v_c_att"):
        _dense(p, sd, name, name)
    _set(p, "latent_tokens", sd["my_tokens"])
    _set(p, "gate_av", sd["gate_av"])
    if use_gate:
        _set(p, "gate", sd["gate"])
    if before_layernorm:
        _set(p, "ln_before/scale", sd["ln_before.weight"])
        _set(p, "ln_before/bias", sd["ln_before.bias"])
    if post_layernorm:
        _set(p, "ln_post/scale", sd["ln_post.weight"])
        _set(p, "ln_post/bias", sd["ln_post.bias"])
    _set(p, "bottleneck/down/kernel",
         _grouped_conv1x1(sd["down_sampler.weight"], num_conv_group))
    _set(p, "bottleneck/up/kernel",
         _grouped_conv1x1(sd["up_sampler.weight"], num_conv_group))
    if use_bn:
        for bn in ("bn1", "bn2"):
            _set(p, f"bottleneck/{bn}/scale", sd[f"{bn}.weight"])
            _set(p, f"bottleneck/{bn}/bias", sd[f"{bn}.bias"])
            _set(bs, f"bottleneck/{bn}/mean", sd[f"{bn}.running_mean"])
            _set(bs, f"bottleneck/{bn}/var", sd[f"{bn}.running_var"])
    return traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(bs)


def convert_lavish_adapter(
    sd: Dict[str, np.ndarray],
    *,
    num_conv_group: int = 2,
    use_bn: bool = True,
    use_gate: bool = True,
    before_layernorm: bool = True,
    post_layernorm: bool = True,
) -> Tuple[Dict, Dict]:
    """Reference VisualAdapter_lavish (net_trans.py:668-807) ->
    (params, batch_stats) for models.ave_legacy.LAVisHAdapter."""
    p: Dict[Tuple[str, ...], np.ndarray] = {}
    bs: Dict[Tuple[str, ...], np.ndarray] = {}
    _set(p, "latent_tokens", sd["my_tokens"])
    _set(p, "gate_av", sd["gate_av"])
    if use_gate:
        _set(p, "gate", sd["gate"])
    if before_layernorm:
        _set(p, "ln_before/scale", sd["ln_before.weight"])
        _set(p, "ln_before/bias", sd["ln_before.bias"])
    if post_layernorm:
        _set(p, "ln_post/scale", sd["ln_post.weight"])
        _set(p, "ln_post/bias", sd["ln_post.bias"])
    _set(p, "bottleneck/down/kernel",
         _grouped_conv1x1(sd["down_sampler.weight"], num_conv_group))
    _set(p, "bottleneck/up/kernel",
         _grouped_conv1x1(sd["up_sampler.weight"], num_conv_group))
    if use_bn:
        for bn in ("bn1", "bn2"):
            _set(p, f"bottleneck/{bn}/scale", sd[f"{bn}.weight"])
            _set(p, f"bottleneck/{bn}/bias", sd[f"{bn}.bias"])
            _set(bs, f"bottleneck/{bn}/mean", sd[f"{bn}.running_mean"])
            _set(bs, f"bottleneck/{bn}/var", sd[f"{bn}.running_var"])
    return traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(bs)


def convert_mmil_v1(
    sd: Dict[str, np.ndarray],
    *,
    n_sites: int = 12,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
    inter: bool = False,
    adapter_kwargs: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """Reference MMIL_Net (v1, net_trans.py:809-1048) state_dict ->
    (params, batch_stats) for models.ave_legacy.MMILNetV1. The unused
    adapter_token_downsampler list (constructed :898-902, never called in
    forward_swin) is dropped."""
    adapter_kwargs = adapter_kwargs or {}
    ep: Dict = {"swin": convert_swinv2_timm(strip_prefix(
        {k: v for k, v in sd.items() if k.startswith("swin.")}, "swin."),
        swin_depths)}
    hp, hbs = convert_htsat(strip_prefix(
        {k: v for k, v in sd.items() if k.startswith("htsat.")}, "htsat."),
        htsat_depths)
    ep["htsat"] = hp
    ebs: Dict = {"htsat": hbs}
    for src, dst in (("audio_adapter_blocks_p1", "audio_adapter_p1"),
                     ("vis_adapter_blocks_p1", "vis_adapter_p1"),
                     ("audio_adapter_blocks_p2", "audio_adapter_p2"),
                     ("vis_adapter_blocks_p2", "vis_adapter_p2")):
        kw = dict(adapter_kwargs)
        if dst.startswith("vis_"):
            kw["use_gate"] = True  # hardcoded in the ctor (net_trans.py:921)
        for i in range(n_sites):
            sub = strip_prefix(
                {k: v for k, v in sd.items() if k.startswith(f"{src}.{i}.")},
                f"{src}.{i}.")
            ap, abs_ = convert_dgsct_adapter(sub, **kw)
            ep[f"{dst}_{i}"] = ap
            if abs_:
                ebs[f"{dst}_{i}"] = abs_
    params: Dict = {"encoder": ep,
                    "temporal_attn": convert_temporal_attention(strip_prefix(
                        {k: v for k, v in sd.items()
                         if k.startswith("temporal_attn.")}, "temporal_attn.")),
                    "cmbs": convert_cmbs(strip_prefix(
                        {k: v for k, v in sd.items() if k.startswith("CMBS.")},
                        "CMBS."), inter=inter)}
    return params, {"encoder": ebs}


def convert_mmil_v2(
    sd: Dict[str, np.ndarray],
    *,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    adapter_kwargs: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """Reference MMIL_Net_v2 (LAVisH, net_trans.py:1051-1241, swin flavor)
    state_dict -> (params, batch_stats) for models.ave_legacy.MMILNetV2."""
    adapter_kwargs = adapter_kwargs or {}
    n_blocks = sum(swin_depths)
    params: Dict = {"swin": convert_swinv2_timm(strip_prefix(
        {k: v for k, v in sd.items() if k.startswith("swin.")}, "swin."),
        swin_depths)}
    bs: Dict = {}
    for src, dst in (("audio_adapter_blocks_p1", "audio_adapter_p1"),
                     ("vis_adapter_blocks_p1", "vis_adapter_p1"),
                     ("audio_adapter_blocks_p2", "audio_adapter_p2"),
                     ("vis_adapter_blocks_p2", "vis_adapter_p2")):
        kw = dict(adapter_kwargs)
        if dst.startswith("vis_"):
            kw["use_gate"] = True  # hardcoded in the ctor (net_trans.py:1101)
        for i in range(n_blocks):
            sub = strip_prefix(
                {k: v for k, v in sd.items() if k.startswith(f"{src}.{i}.")},
                f"{src}.{i}.")
            ap, abs_ = convert_lavish_adapter(sub, **kw)
            params[f"{dst}_{i}"] = ap
            if abs_:
                bs[f"{dst}_{i}"] = abs_
    _dense_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    _dense(_dense_flat, sd, "mlp_class", "mlp_class")
    _dense(_dense_flat, sd, "mlp_class_2", "mlp_class_2")
    params.update(traverse_util.unflatten_dict(_dense_flat))
    return params, bs


def convert_grounding_net(
    sd: Dict[str, np.ndarray],
    *,
    swin_depths: Sequence[int] = (2, 2, 18, 2),
    htsat_depths: Sequence[int] = (2, 2, 6, 2),
) -> Tuple[Dict, Dict]:
    """Reference AVQA_AVatt_Grounding (AVQA/grounding_gen/nets_grd_gen.py:
    39-202) state_dict -> (params, batch_stats) for
    models.avqa_grounding.AVQAGroundingModel. Plain frozen backbones (no
    adapters) + the seven trained Dense heads; the unused avgpool/relu4
    have no params."""
    hp, hbs = convert_htsat(strip_prefix(
        {k: v for k, v in sd.items() if k.startswith("htsat.")}, "htsat."),
        htsat_depths)
    params: Dict = {
        "swin": convert_swinv2_timm(strip_prefix(
            {k: v for k, v in sd.items() if k.startswith("swin.")}, "swin."),
            swin_depths),
        "htsat": hp,
    }
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name in ("fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4"):
        _dense(flat, sd, name, name)
    params.update(traverse_util.unflatten_dict(flat))
    return params, {"htsat": hbs}
