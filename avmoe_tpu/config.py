"""Typed configuration tree for AVMoE-TPU.

One dataclass hierarchy replaces the reference's three config mechanisms
(argparse BaseOptions, the mutable module-global `esc_config`, and the AVS
easydict `cfg`); presets reproduce each reference `train.sh`.

Reference hyperparameters are cited against /root/reference:
  * audio constants: AVMOE/AVE/nets/esc_config.py:48-69
  * adapter flags:   AVMOE/AVE/train.sh:1-49, AVMOE/AVE/base_options.py:158-196
  * model geometry:  AVMOE/AVE/nets/net_trans_v3.py:489-637
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# Audio front-end (waveform -> log-mel spectrogram image)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AudioFrontendConfig:
    """Log-mel front-end constants (ref: esc_config.py:48-54, htsat.py:434-453)."""

    sample_rate: int = 32_000
    n_fft: int = 1024
    hop_length: int = 320
    win_length: int = 1024
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 14_000.0
    amin: float = 1e-10
    ref: float = 1.0
    # SpecAugment (ref: htsat.py:451-452)
    time_drop_width: int = 64
    time_stripes_num: int = 2
    freq_drop_width: int = 8
    freq_stripes_num: int = 2


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HTSATConfig:
    """HTS-AT audio Swin transformer (ref: htsat.py:370-492, esc_config.py:62-69)."""

    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    in_chans: int = 1
    num_classes: int = 527
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    remat: bool = False    # rematerialize blocks (memory for compute)
    # remat policy: 'full' recomputes everything; 'dots' saves matmul outputs
    # (checkpoint_dots_with_no_batch_dims) so backward skips the GEMM
    # recompute and only redoes the cheap elementwise ops
    remat_policy: str = "full"
    frontend: AudioFrontendConfig = field(default_factory=AudioFrontendConfig)

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.frontend.n_mels

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        return (
            self.spec_size // self.patch_stride[0],
            self.spec_size // self.patch_stride[1],
        )

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


@dataclass(frozen=True)
class SwinV2Config:
    """Swin-V2 vision transformer, matching timm's swinv2_{base,large}_window12_192_22k
    geometry (ref usage: net_trans_v3.py:513, consumed piecewise :688-726)."""

    img_size: int = 192
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    remat: bool = False    # rematerialize blocks (memory for compute)
    remat_policy: str = "full"  # 'full' | 'dots' (see HTSATConfig.remat_policy)
    pretrained_window_sizes: Tuple[int, ...] = (12, 12, 12, 6)

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        r = self.img_size // self.patch_size
        return (r, r)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @staticmethod
    def large() -> "SwinV2Config":
        return SwinV2Config()

    @staticmethod
    def base() -> "SwinV2Config":
        return SwinV2Config(embed_dim=128, num_heads=(4, 8, 16, 32))


# ---------------------------------------------------------------------------
# MoE adapter fabric
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AdapterConfig:
    """Per-expert adapter knobs (ref: net_trans_v3.py:296-435, train.sh)."""

    downsample: int = 8           # reduction factor (train.sh: Adapter_downsample=8)
    num_conv_group: int = 2       # grouped 1x1 bottleneck (train.sh: num_conv_group=2)
    num_tokens: int = 32          # latent tokens in cross-modal experts
    use_bn: bool = True           # train.sh: is_bn=1
    use_gate: bool = True         # AUDIO-side adapters follow is_gate (train.sh: 1)
    # The reference hardcodes use_gate=True on every VIS-side adapter while the
    # audio side follows opt.is_gate (net_trans_v3.py:604/614, net_avst_v2.py
    # :580/589, PVT_AVSModel_v2.py:711/715) — asymmetric when is_gate=0
    # (AVQA, AVS). vis_use_gate keeps the vis side independently configurable.
    vis_use_gate: bool = True
    before_layernorm: bool = True  # train.sh: is_before_layernorm=1
    post_layernorm: bool = True    # train.sh: is_post_layernorm=1
    # unimodal-expert self-attention flavor:
    #   'none' - AVE default (is_self_attention=0)
    #   'mha'  - AVE optional MultiheadAttention (net_trans_v3.py:343)
    #   'bmm'  - AVVP/AVS gated dot-product self-attn (mgn.py:132-146)
    self_attention: str = "none"


@dataclass(frozen=True)
class MoEConfig:
    """Router + expert mixture (ref: net_trans_v3.py:438-487; LB loss: mgn.py:213-224;
    router noise: avs_s4/model/PVT_AVSModel_v2.py:294-296)."""

    num_multimodal_experts: int = 1
    num_singlemodal_experts: int = 1
    router_hidden: Tuple[int, int] = (128, 32)
    load_balance_loss: bool = False    # AVVP/AVS variants add KL-to-uniform LB loss
    # Reference-exact LB magnitude: the reference's compute_load_balancing_loss
    # (mgn.py:213-224) builds `uniform` from a (1, E) tensor's size(0)==1, so it
    # actually computes -sum_e log(mean_p_e), not a KL. lb_loss_compat=True
    # reproduces that buggy-but-published magnitude so reference-trained
    # configs replicate exactly; False keeps the corrected KL-to-uniform.
    lb_loss_compat: bool = False
    router_noise_std: float = 0.0      # AVS adds 0.01 gaussian noise at train time
    adapter: AdapterConfig = field(default_factory=AdapterConfig)

    @property
    def num_experts(self) -> int:
        return self.num_multimodal_experts + self.num_singlemodal_experts


@dataclass(frozen=True)
class InjectionConfig:
    """Where adapters attach in the lock-step dual-backbone loop
    (ref: net_trans_v3.py:599-637, 683-722)."""

    audio_adapter_p1: bool = True   # around the attention sub-block
    audio_adapter_p2: bool = True   # around the MLP sub-block
    num_skip: int = 2               # stages with (idx+1) % num_skip == 0 run w/o adapters
    # sequence parallelism: shard the token axis of both streams over this
    # mesh axis (windows are independent, so XLA partitions window attention
    # with halo exchanges only at shifted-window rolls). None = off.
    token_shard_axis: Optional[str] = None


# ---------------------------------------------------------------------------
# Task-level configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AVEConfig:
    """AVE event localization (ref: AVMOE/AVE/train.sh, net_trans_v3.py:489-762)."""

    num_classes: int = 28
    num_segments: int = 10          # 10 x 1s segments per clip
    audio_len: int = 32_000         # samples per segment
    d_model: int = 256
    is_cmbs: bool = True
    is_temporal_att: bool = True
    is_inter_in_cmbs: bool = False
    swin: SwinV2Config = field(default_factory=SwinV2Config.large)
    htsat: HTSATConfig = field(default_factory=HTSATConfig)
    moe: MoEConfig = field(default_factory=MoEConfig)
    injection: InjectionConfig = field(default_factory=InjectionConfig)


@dataclass(frozen=True)
class AVVPConfig:
    """AVVP weakly-supervised parsing (ref: AVMOE/AVVP/train.sh, mgn.py:227-559).

    Notable deltas vs AVE: adapters in EVERY stage (num_skip=1), no BatchNorm
    in adapters (train.sh is_bn=0), bmm self-attention unimodal experts,
    KL load-balance loss on."""

    num_classes: int = 25
    num_segments: int = 10
    audio_len: int = 32_000
    dim: int = 128
    st_dim: int = 512              # r2plus1d clip features
    depth_aud: int = 3
    depth_vis: int = 3
    depth_av: int = 6
    unimodal_assign: str = "soft"   # 'soft' | 'hard'
    crossmodal_assign: str = "soft"
    swin: SwinV2Config = field(default_factory=SwinV2Config.large)
    htsat: HTSATConfig = field(default_factory=HTSATConfig)
    # lb_loss_compat=True: this config replicates the reference's published
    # train.sh settings, whose lambda_LB was tuned against the reference's
    # own (buggy-magnitude) LB loss — the published weight only transfers at
    # the compat magnitude (ADVICE r3).
    moe: MoEConfig = field(default_factory=lambda: MoEConfig(
        load_balance_loss=True, lb_loss_compat=True,
        adapter=AdapterConfig(use_bn=False, self_attention="bmm"),
    ))
    injection: InjectionConfig = field(default_factory=lambda: InjectionConfig(num_skip=1))


def tiny_avvp_config() -> "AVVPConfig":
    return AVVPConfig(
        num_segments=2,
        audio_len=4000,
        dim=32,
        st_dim=16,
        depth_aud=1, depth_vis=1, depth_av=1,
        swin=tiny_swin(),
        htsat=tiny_htsat(),
        moe=MoEConfig(
            load_balance_loss=True, lb_loss_compat=True,
            adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=8,
                                  use_bn=False, self_attention="bmm"),
        ),
        injection=InjectionConfig(num_skip=1),
    )


@dataclass(frozen=True)
class AVQAConfig:
    """AVQA question answering (ref: AVMOE/AVQA/train_v2.sh,
    net_grd_avst/net_avst_v2.py:443-833).

    Notable deltas vs AVE: 2 latent tokens, no output gate (is_gate=0),
    2 unimodal experts, adapters in every stage, 50-way answer head
    (evaluated over the 42-word answer vocab)."""

    answer_vocab: int = 42
    fc_class: int = 50
    qst_vocab: int = 93
    max_qst_len: int = 30
    word_embed: int = 1536
    qst_hidden: int = 1536
    d_feat: int = 1536
    num_segments: int = 10
    audio_len: int = 32_000
    swin: SwinV2Config = field(default_factory=SwinV2Config.large)
    htsat: HTSATConfig = field(default_factory=HTSATConfig)
    moe: MoEConfig = field(default_factory=lambda: MoEConfig(
        num_multimodal_experts=1, num_singlemodal_experts=2,
        # AVQA base_options.py defaults: is_bn=0, is_gate=0 (audio side only;
        # vis adapters stay gated), num_conv_group=4; train_v2.sh: num_tokens=2
        adapter=AdapterConfig(num_tokens=2, use_gate=False, use_bn=False,
                              num_conv_group=4),
    ))
    injection: InjectionConfig = field(default_factory=lambda: InjectionConfig(num_skip=1))


def tiny_avqa_config() -> "AVQAConfig":
    return AVQAConfig(
        answer_vocab=6, fc_class=8, qst_vocab=20, max_qst_len=6,
        word_embed=16, qst_hidden=16, d_feat=128,  # == tiny swin num_features
        num_segments=2, audio_len=4000,
        swin=tiny_swin(), htsat=tiny_htsat(),
        moe=MoEConfig(
            num_multimodal_experts=1, num_singlemodal_experts=2,
            adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=2,
                                  use_gate=False, use_bn=False),
        ),
        injection=InjectionConfig(num_skip=1),
    )


@dataclass(frozen=True)
class AVSConfig:
    """AVS sound-source segmentation, S4/MS3 (ref: avs_s4/train_v2.sh,
    avs_{s4,ms3}/model/PVT_AVSModel_v2.py).

    Deltas vs AVE: 5 frames per clip, adapters in every stage, MHA
    self-attention in unimodal experts (is_self_attention=1), noisy router,
    LB loss on, TPAVI on all 4 pyramid stages."""

    setting: str = "s4"             # 's4' | 'ms3'
    num_segments: int = 5
    audio_len: int = 32_000
    img_size: int = 224             # dataloader size; model resizes to swin's 192
    channel: int = 256              # decoder width
    mask_size: int = 224
    tpavi_stages: Tuple[int, ...] = (0, 1, 2, 3)
    tpavi_vv_flag: bool = False
    tpavi_va_flag: bool = True
    # decoder pyramid target sizes per stage (pvt-style)
    pyramid_sizes: Tuple[int, ...] = (56, 28, 14, 7)
    sa_loss_flag: bool = False
    lambda_1: float = 0.0
    sa_loss_stages: Tuple[int, ...] = ()
    sa_loss_kind: str = "cosine"   # 'cosine' | 'euclidean' | 'kl' (MS3)
    closer_loss: bool = False      # nearest-audio pairing (MS3)
    # masked-AV flavor knobs: S4's loss hardcodes both True
    # (avs_s4/loss.py:30-78); MS3 exposes --norm_fea_flag/--threshold_flag
    # whose published recipe leaves both OFF (avs_ms3/train_v2.sh)
    sa_norm_fea: bool = True
    sa_threshold: bool = True
    # LB weight in the TRAIN total. The reference computes the router LB loss
    # but only adds it when --use_load_balacing_loss=1: the published S4
    # recipe leaves it OFF (avs_s4/train_v2.sh passes nothing, default 0),
    # MS3's recipe turns it on at 0.01 (avs_ms3/train_v2.sh:10-11). The MS3
    # CLI branch sets 0.01; override via --load_balancing_loss_weight.
    lb_loss_weight: float = 0.0
    # temporal-attention gate strength: S4 hardcodes 0.05
    # (avs_s4/model/PVT_AVSModel_v2.py:451); MS3 exposes --gamma, default 0.1
    # (avs_ms3/base_options.py:77, model :638)
    temporal_gamma: float = 0.05
    swin: SwinV2Config = field(default_factory=SwinV2Config.large)
    htsat: HTSATConfig = field(default_factory=HTSATConfig)
    # lb_loss_compat=True: published lambda_LB values were tuned against the
    # reference's own LB magnitude (see AVVPConfig note / ADVICE r3)
    moe: MoEConfig = field(default_factory=lambda: MoEConfig(
        load_balance_loss=True, lb_loss_compat=True, router_noise_std=0.01,
        # AVS base_options.py defaults: is_bn=0, is_gate=0 (audio side only;
        # vis adapters stay gated). num_tokens=87: the AVS MoEAdapter never
        # forwards opt.num_tokens, so every expert keeps the num_tk=87
        # ctor default (PVT_AVSModel_v2.py:255,266 vs the AVE ctor :605)
        adapter=AdapterConfig(self_attention="mha", use_bn=False,
                              use_gate=False, num_tokens=87),
    ))
    injection: InjectionConfig = field(default_factory=lambda: InjectionConfig(num_skip=1))


def tiny_avs_config() -> "AVSConfig":
    return AVSConfig(
        num_segments=2,
        audio_len=4000,
        img_size=64,
        channel=32,
        mask_size=64,
        pyramid_sizes=(16, 8, 4, 2),  # doubling chain -> FPN ends at mask_size/2
        swin=tiny_swin(),
        htsat=tiny_htsat(),
        moe=MoEConfig(
            load_balance_loss=True, lb_loss_compat=True, router_noise_std=0.01,
            # num_tokens=87 mirrors prod: the reference AVS adapters always
            # use the num_tk=87 default (see AVSConfig note)
            adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=87,
                                  self_attention="mha", use_bn=False,
                                  use_gate=False),
        ),
        injection=InjectionConfig(num_skip=1),
    )


@dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (ref: main_trans_v3.py:322-348, train.sh)."""

    batch_size: int = 2
    accum_steps: int = 8
    epochs: int = 50
    lr: float = 5e-4
    lr_mlp: float = 5e-6
    decay: float = 0.35            # StepLR gamma
    decay_epoch: int = 3           # StepLR step size
    early_stop: int = 20
    seed: int = 999
    mixup_alpha: float = 0.5
    dtype: str = "float32"         # compute dtype for backbone matmuls


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------


def ave_train_preset() -> Tuple[AVEConfig, TrainConfig]:
    """Reproduces AVMOE/AVE/train.sh hyperparameters."""
    return AVEConfig(), TrainConfig()


# HTS-AT pretrained-checkpoint flavors, mirroring the reference's
# `--backbone_type` knob which mutates the module-global esc_config and picks
# a checkpoint file (ref: net_trans_v3.py:516-545, esc_config.py:48-69).
# Values: (sample_rate, hop_length, num_classes, expected ckpt filename for
# checkpoint.convert.convert_htsat).
HTSAT_BACKBONE_FLAVORS = {
    "esc-50": (32_000, 320, 50, "HTSAT_ESC_exp=1_fold=1_acc=0.985.ckpt"),
    "audioset": (32_000, 320, 527, "HTSAT_AudioSet_Saved_1.ckpt"),
    "scv2": (16_000, 160, 35, "HTSAT_SCV2_Saved_3.ckpt"),
}


def htsat_backbone_preset(backbone_type: str = "audioset") -> Tuple[HTSATConfig, str]:
    """(HTSATConfig, checkpoint filename) for a named `backbone_type` flavor.

    The reference reaches its flavors by mutating esc_config in the model
    ctor; here each flavor is a frozen config + the torch checkpoint name the
    converter expects. Geometry (spec 256 / patch 4 / depths 2262 / dim 96)
    is shared by all three flavors (esc_config.py:62-69)."""
    try:
        sr, hop, classes, ckpt = HTSAT_BACKBONE_FLAVORS[backbone_type]
    except KeyError:
        raise NotImplementedError(
            f"backbone_type {backbone_type!r}: expected one of "
            f"{sorted(HTSAT_BACKBONE_FLAVORS)}") from None
    cfg = HTSATConfig(
        num_classes=classes,
        frontend=AudioFrontendConfig(sample_rate=sr, hop_length=hop),
    )
    return cfg, ckpt


def swin_model_preset(model_size: str = "large") -> SwinV2Config:
    """Swin-V2 flavor for the reference's `--model_size` knob
    (ref: net_trans_v3.py:493-498 -> timm swinv2_{large,base}_window12_192_22k)."""
    if model_size == "large":
        return SwinV2Config.large()
    if model_size in ("base", "small"):  # ref calls the base flavor "small"
        return SwinV2Config.base()
    raise NotImplementedError(
        f"model_size {model_size!r}: expected 'large' or 'base'/'small'")


def ave_flavor_config(backbone_type: str = "audioset",
                      model_size: str = "large") -> Tuple[AVEConfig, str]:
    """AVEConfig with named backbone flavors + the HTS-AT ckpt filename
    (one-call equivalent of the reference's --backbone_type/--model_size)."""
    htsat, ckpt = htsat_backbone_preset(backbone_type)
    return dataclasses.replace(
        AVEConfig(), htsat=htsat, swin=swin_model_preset(model_size)), ckpt


def _tiny_frontend() -> AudioFrontendConfig:
    return AudioFrontendConfig(
        sample_rate=4000, n_fft=256, hop_length=125, win_length=256,
        n_mels=16, fmin=50.0, fmax=1800.0,
        time_drop_width=8, time_stripes_num=2, freq_drop_width=2, freq_stripes_num=2,
    )


def tiny_htsat() -> HTSATConfig:
    """Structure-preserving miniature HTS-AT for tests / dry runs.

    spec 64, mel 16 -> freq_ratio 4 (same as prod); patches 16x16;
    depths (2,2,6,2) shape preserved but dims tiny.
    """
    return HTSATConfig(
        spec_size=64, patch_size=4, patch_stride=(4, 4), embed_dim=16,
        depths=(2, 2, 6, 2), num_heads=(2, 2, 2, 2), window_size=4,
        drop_path_rate=0.0, frontend=_tiny_frontend(),
    )


def tiny_swin() -> SwinV2Config:
    return SwinV2Config(
        img_size=64, patch_size=4, embed_dim=16, depths=(2, 2, 18, 2),
        num_heads=(2, 2, 2, 2), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0, 0, 0),
    )


def tiny_ave_config() -> AVEConfig:
    return AVEConfig(
        num_segments=2,
        audio_len=4000,
        d_model=32,
        swin=tiny_swin(),
        htsat=tiny_htsat(),
        moe=MoEConfig(adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=8)),
    )


def replace(cfg, **kwargs):
    """Functional config update."""
    return dataclasses.replace(cfg, **kwargs)


# --- "mini" configs: tiny model dims, REAL dataset geometry ------------------
# Dress-rehearsal configs: same miniature dims as the tiny_* configs but with
# the reference datasets' true clip geometry (10x1s segments @ 32 kHz for
# AVE/AVVP/AVQA, 5 segments for AVS), so the CLIs can be driven end-to-end
# from on-disk data in the exact reference formats (tools/make_mini_datasets).


def _mini_frontend() -> AudioFrontendConfig:
    # 32k samples / hop 1000 = the same 32-frame x 16-mel spectrogram
    # geometry as _tiny_frontend, so tiny_htsat() is reused unchanged.
    return AudioFrontendConfig(
        sample_rate=32000, n_fft=1024, hop_length=1000, win_length=1024,
        n_mels=16, fmin=50.0, fmax=14000.0,
        time_drop_width=8, time_stripes_num=2, freq_drop_width=2,
        freq_stripes_num=2,
    )


def _mini_htsat() -> HTSATConfig:
    return dataclasses.replace(tiny_htsat(), frontend=_mini_frontend())


def mini_ave_config() -> AVEConfig:
    return dataclasses.replace(
        tiny_ave_config(), num_segments=10, audio_len=32000,
        htsat=_mini_htsat())


def mini_avvp_config() -> "AVVPConfig":
    return dataclasses.replace(
        tiny_avvp_config(), num_segments=10, audio_len=32000,
        htsat=_mini_htsat())


def mini_avqa_config() -> "AVQAConfig":
    # vocab sizes sized for the miniature MUSIC-AVQA json; max_qst_len is the
    # reader's fixed pad length (data/avqa.py MAX_QST_LEN)
    return dataclasses.replace(
        tiny_avqa_config(), num_segments=10, audio_len=32000,
        max_qst_len=14, qst_vocab=64, answer_vocab=6,
        htsat=_mini_htsat())


def mini_avs_config() -> "AVSConfig":
    return dataclasses.replace(
        tiny_avs_config(), num_segments=5, audio_len=32000,
        htsat=_mini_htsat())
