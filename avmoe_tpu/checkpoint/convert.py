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
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
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
