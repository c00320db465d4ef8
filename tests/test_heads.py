"""Shape/sanity tests for task heads (small dims)."""

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.heads.ave import CMBSHead, TemporalAttention
from avmoe_tpu.heads.audio_guided import AudioGuidedAttention
from avmoe_tpu.heads.avs import (
    ASPPClassifier,
    FeatureFusionBlock,
    MultiScaleTemporalAttention,
    TPAVIModule,
    resize_bicubic,
    resize_bilinear,
)


def test_temporal_attention_and_cmbs():
    B, T = 2, 5
    ta = TemporalAttention(video_input_dim=24, audio_input_dim=12, d_model=16,
                           video_fc_dim=20, audio_fc_dim=8)
    fv = jnp.ones((B, T, 24))
    fa = jnp.ones((B, T, 12))
    v = ta.init({"params": jax.random.PRNGKey(0)}, fv, fa)
    vis, aud, gate = ta.apply(v, fv, fa)
    assert vis.shape == (B, T, 16) and aud.shape == (B, T, 16)
    assert gate.shape == (B, T, 1)

    cmbs = CMBSHead(num_classes=7, d_model=16)
    cv = cmbs.init(jax.random.PRNGKey(1), vis, aud)
    is_ev, ev, av = cmbs.apply(cv, vis, aud)
    assert is_ev.shape == (B, T)
    assert ev.shape == (B, 7) and av.shape == (B, 7)


def test_cmbs_inter_variant():
    cmbs = CMBSHead(num_classes=4, d_model=8, inter=True)
    x = jnp.ones((2, 3, 8))
    v = cmbs.init(jax.random.PRNGKey(0), x, x)
    is_ev, ev, av = cmbs.apply(v, x, x)
    assert ev.shape == (2, 4)


def test_audio_guided_attention():
    m = AudioGuidedAttention(video_dim=16, audio_dim=8, hidden_dim=8)
    video = jnp.ones((2, 3, 4, 4, 16))
    audio = jnp.ones((2, 3, 8))
    v = m.init(jax.random.PRNGKey(0), video, audio)
    out = m.apply(v, video, audio)
    assert out.shape == (2, 3, 16)


def test_resize_helpers():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    up = resize_bilinear(x, 16, 16)
    assert up.shape == (1, 16, 16, 3)
    down = resize_bicubic(x, 4, 4)
    assert down.shape == (1, 4, 4, 3)
    # corners preserved with align_corners=True
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(x[0, 0, 0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(up[0, -1, -1]), np.asarray(x[0, -1, -1]),
                               rtol=1e-5)


def test_tpavi_identity_at_init():
    """W_z is zero-init, so TPAVI starts as LayerNorm(x) + aligned audio."""
    m = TPAVIModule(in_channels=8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4, 4, 8).astype(np.float32))
    a = jnp.ones((1, 2, 4))
    v = m.init(jax.random.PRNGKey(0), x, a)
    z, af = m.apply(v, x, a)
    assert z.shape == x.shape
    assert af.shape == (1, 2, 8)


def test_fpn_chain():
    maps = [jnp.ones((2, s, s, 8)) for s in (16, 8, 4, 2)]
    top = FeatureFusionBlock(8)
    fuse = FeatureFusionBlock(8)
    v_top = top.init(jax.random.PRNGKey(0), maps[3])
    x = top.apply(v_top, maps[3])
    assert x.shape == (2, 4, 4, 8)
    v_fuse = fuse.init(jax.random.PRNGKey(1), x, maps[2])
    x = fuse.apply(v_fuse, x, maps[2])
    assert x.shape == (2, 8, 8, 8)


def test_aspp():
    m = ASPPClassifier(4)
    x = jnp.ones((1, 8, 8, 6))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 8, 8, 4)


def test_multiscale_temporal_attention():
    B, T = 2, 3
    maps = [jnp.ones((B * T, s, s, 8)) for s in (8, 4, 2, 2)]
    audio = jnp.ones((B, T, 6))
    m = MultiScaleTemporalAttention(d_model=8, num_segments=T)
    v = m.init({"params": jax.random.PRNGKey(0)}, maps, audio)
    new_maps, audio_out = m.apply(v, maps, audio)
    assert len(new_maps) == 4
    assert new_maps[0].shape == maps[0].shape
    assert audio_out.shape == (B * T, 6)
