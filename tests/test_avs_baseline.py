"""AVS baseline models (true PVT / ResNet encoders) + VGGish smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_avs_baseline_resnet_forward():
    from avmoe_tpu.models.avs_baseline import AVSBaselineModel

    model = AVSBaselineModel(backbone="resnet", channel=16, num_segments=2,
                             tpavi_stages=(0,))
    B, T = 1, 2
    imgs = jnp.ones((B, T, 64, 64, 3))
    audio = jnp.ones((B, T, 128))
    v = model.init({"params": jax.random.PRNGKey(0)}, imgs, audio)
    out = model.apply(v, imgs, audio)
    # 64 input -> pyramid 16,8,4,2 -> FPN up to 32 -> output conv 2x -> 64
    assert out["mask_logits"].shape == (B * T, 64, 64)
    assert np.isfinite(np.asarray(out["mask_logits"])).all()


def test_pvt_backbone_pyramid():
    from avmoe_tpu.backbones.pvt import pvt_v2_b0

    m = pvt_v2_b0()
    x = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    outs = m.apply(v, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert outs[0].shape[-1] == 32 and outs[3].shape[-1] == 256


def test_vggish_embedding():
    from avmoe_tpu.backbones.vggish import VGGish

    m = VGGish()
    x = jnp.ones((2, 96, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 128)
    assert (np.asarray(out) >= 0).all()  # final relu


def test_vggish_postprocessor():
    from avmoe_tpu.backbones.vggish import VGGishPostprocessor

    rng = np.random.RandomState(0)
    pca = np.linalg.qr(rng.randn(128, 128))[0].astype(np.float32)
    means = rng.randn(128).astype(np.float32)
    post = VGGishPostprocessor(pca, means)
    out = post(rng.randn(4, 128).astype(np.float32))
    assert out.shape == (4, 128)
    assert out.min() >= 0 and out.max() <= 255


def test_legacy_backbones():
    from avmoe_tpu.backbones.legacy import NetVLAD, PHMLinear, ResNet18, SimpleViT

    x = jnp.ones((1, 32, 32, 3))
    r18 = ResNet18(num_classes=5)
    v = r18.init({"params": jax.random.PRNGKey(0)}, x)
    assert r18.apply(v, x).shape == (1, 5)

    vit = SimpleViT(embed_dim=16, depth=1, num_heads=2, patch=8)
    v = vit.init({"params": jax.random.PRNGKey(0)}, x)
    assert vit.apply(v, x).shape == (1, 16, 16)

    nv = NetVLAD(num_clusters=4, dim=8)
    feat = jnp.ones((2, 4, 4, 8))
    v = nv.init(jax.random.PRNGKey(0), feat)
    out = nv.apply(v, feat)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               rtol=1e-4)

    phm = PHMLinear(n=2, in_features=8, out_features=6)
    v = phm.init(jax.random.PRNGKey(0), jnp.ones((3, 8)))
    assert phm.apply(v, jnp.ones((3, 8))).shape == (3, 6)
