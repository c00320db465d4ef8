"""HTS-AT standalone tagging + long/short audio inference modes."""

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.backbones.htsat import HTSATEncoder
from avmoe_tpu.config import replace, tiny_htsat


def _enc():
    cfg = replace(tiny_htsat(), num_classes=7)
    enc = HTSATEncoder(cfg)
    wave = jnp.zeros((1, 4000))
    variables = enc.init(jax.random.PRNGKey(0), wave)
    return cfg, enc, variables


def test_standalone_tagging_outputs():
    cfg, enc, variables = _enc()
    out = enc.apply(variables, jnp.zeros((2, 4000)))
    assert out["clipwise_output"].shape == (2, 7)
    assert out["framewise_output"].shape[0] == 2
    assert out["framewise_output"].shape[-1] == 7
    assert out["latent_output"].shape == (2, cfg.num_features)
    p = np.asarray(out["clipwise_output"])
    assert ((p >= 0) & (p <= 1)).all()


def test_long_audio_crop_average():
    cfg, enc, variables = _enc()
    # 4000 samples -> 33 frames; max_t = 4*64=256 frames -> need > 256 frames
    long_wave = jnp.asarray(
        np.random.RandomState(0).randn(1, 40_000).astype(np.float32) * 0.1)
    out = enc.apply(variables, long_wave, method="forward_long_audio")
    assert out["clipwise_output"].shape == (1, 7)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()


def test_repeat_mode_short_audio():
    cfg, enc, variables = _enc()
    short = jnp.asarray(np.random.RandomState(1).randn(1, 1000).astype(np.float32))
    out = enc.apply(variables, short, method="forward_repeat_mode")
    assert out["clipwise_output"].shape == (1, 7)
