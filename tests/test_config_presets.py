"""Named backbone-flavor presets mirror the reference's flag surface
(ref: AVMOE/AVE/nets/net_trans_v3.py:493-545, base_options.py:180-184)."""

import pytest

from avmoe_tpu.config import (
    AVEConfig,
    HTSAT_BACKBONE_FLAVORS,
    ave_flavor_config,
    htsat_backbone_preset,
    swin_model_preset,
)


@pytest.mark.parametrize("flavor,sr,hop,classes", [
    ("esc-50", 32_000, 320, 50),
    ("audioset", 32_000, 320, 527),
    ("scv2", 16_000, 160, 35),
])
def test_htsat_backbone_flavors(flavor, sr, hop, classes):
    cfg, ckpt = htsat_backbone_preset(flavor)
    assert cfg.frontend.sample_rate == sr
    assert cfg.frontend.hop_length == hop
    assert cfg.num_classes == classes
    assert ckpt == HTSAT_BACKBONE_FLAVORS[flavor][3]
    # geometry shared across flavors (esc_config.py:62-69)
    assert cfg.spec_size == 256 and cfg.embed_dim == 96
    assert cfg.depths == (2, 2, 6, 2)


def test_htsat_backbone_unknown_flavor():
    with pytest.raises(NotImplementedError):
        htsat_backbone_preset("nsynth")


def test_swin_model_sizes():
    large = swin_model_preset("large")
    base = swin_model_preset("base")
    assert large.embed_dim == 192 and large.num_heads == (6, 12, 24, 48)
    assert base.embed_dim == 128 and base.num_heads == (4, 8, 16, 32)
    # the reference's --model_size calls the base flavor "small"
    assert swin_model_preset("small") == base
    with pytest.raises(NotImplementedError):
        swin_model_preset("tiny")


def test_ave_flavor_config_composes():
    cfg, ckpt = ave_flavor_config("scv2", "base")
    assert isinstance(cfg, AVEConfig)
    assert cfg.htsat.frontend.sample_rate == 16_000
    assert cfg.swin.embed_dim == 128
    assert ckpt == "HTSAT_SCV2_Saved_3.ckpt"
    # default flavor matches the reference's "go this part" audioset branch
    cfg2, _ = ave_flavor_config()
    assert cfg2.htsat.num_classes == 527
    assert cfg2 == AVEConfig()


# ------------------------------------------------- AVS CLI recipe defaults
#
# The AVS driver resolves per-setting defaults mirroring the published
# recipes (avs_s4/train_v2.sh: masked-AV + LB off; avs_ms3/train_v2.sh:
# --masked_av_flag --lambda_1 0.5 --kl_flag, --use_load_balacing_loss 1,
# norm/threshold flags unset).

def _avs_cfg(argv):
    import sys
    from unittest import mock

    from avmoe_tpu.cli.train_avs import build_config, parse_args
    with mock.patch.object(sys, "argv", ["train_avs"] + argv):
        return build_config(parse_args())


def test_avs_cli_s4_recipe_defaults():
    cfg = _avs_cfg(["--setting", "s4"])
    assert cfg.setting == "s4"
    assert not cfg.sa_loss_flag and cfg.lambda_1 == 0.0
    assert cfg.sa_loss_stages == ()
    # S4's loss hardcodes both (avs_s4/loss.py:30-78)
    assert cfg.sa_norm_fea and cfg.sa_threshold
    assert cfg.sa_loss_kind == "cosine"
    assert cfg.lb_loss_weight == 0.0
    assert cfg.moe.adapter.self_attention == "mha"  # S4 "v1" expert attn


def test_avs_cli_ms3_recipe_defaults():
    cfg = _avs_cfg(["--setting", "ms3"])
    assert cfg.setting == "ms3"
    assert cfg.sa_loss_flag and cfg.lambda_1 == 0.5
    assert cfg.sa_loss_stages == (0, 1, 2, 3)
    # recipe leaves --norm_fea_flag/--threshold_flag unset
    assert not cfg.sa_norm_fea and not cfg.sa_threshold
    assert cfg.sa_loss_kind == "kl"          # --kl_flag
    assert cfg.lb_loss_weight == 0.01
    assert cfg.moe.adapter.self_attention == "token"
    assert cfg.temporal_gamma == 0.1


def test_avs_cli_overrides_beat_recipe_defaults():
    cfg = _avs_cfg(["--setting", "ms3", "--no_sa_loss",
                    "--load_balancing_loss_weight", "0.5"])
    assert not cfg.sa_loss_flag and cfg.sa_loss_stages == ()
    assert cfg.lb_loss_weight == 0.5
    cfg = _avs_cfg(["--setting", "s4", "--sa_loss_flag", "--lambda_1", "0.3",
                    "--sa_loss_kind", "euclidean", "--sa_threshold", "0",
                    "--masked_av_stages", "1", "2"])
    assert cfg.sa_loss_flag and cfg.lambda_1 == 0.3
    assert cfg.sa_loss_kind == "euclidean"
    assert cfg.sa_norm_fea and not cfg.sa_threshold
    assert cfg.sa_loss_stages == (1, 2)  # ref --masked_av_stages
