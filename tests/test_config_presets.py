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
