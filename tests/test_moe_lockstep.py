"""Shape/behavior tests for Swin blocks, MoE adapters and the lock-step encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.config import (
    AdapterConfig,
    InjectionConfig,
    MoEConfig,
    tiny_ave_config,
    tiny_htsat,
    tiny_swin,
)
from avmoe_tpu.moe.adapter import GroupedDense, MoEAdapter
from avmoe_tpu.moe.injection import LockstepEncoder, pair_stage_blocks, plan_injection
from avmoe_tpu.ops.swin import SwinBlock


def test_grouped_dense_blockdiag():
    gd = GroupedDense(features=8, num_groups=2)
    x = jnp.ones((2, 3, 8))
    params = gd.init(jax.random.PRNGKey(0), x)
    out = gd.apply(params, x)
    assert out.shape == (2, 3, 8)
    # group 0 output must not depend on group 1 input
    x2 = x.at[..., 4:].set(5.0)
    out2 = gd.apply(params, x2)
    np.testing.assert_allclose(out[..., :4], out2[..., :4], rtol=1e-6)
    assert not np.allclose(out[..., 4:], out2[..., 4:])


@pytest.mark.parametrize("version", ["v1", "v2"])
def test_swin_block_shapes(version):
    blk = SwinBlock(
        dim=16, input_resolution=(8, 8), num_heads=2, window_size=4,
        shift_size=2, version=version,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 16).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_swin_block_window_autoshrink():
    # resolution 2 < window 4 -> window shrinks, shift drops to 0
    blk = SwinBlock(dim=16, input_resolution=(2, 2), num_heads=2,
                    window_size=4, shift_size=2, version="v2")
    x = jnp.ones((1, 4, 16))
    params = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(params, x).shape == (1, 4, 16)


def test_moe_adapter_gating():
    cfg = MoEConfig(
        num_multimodal_experts=2, num_singlemodal_experts=1,
        load_balance_loss=True,
        adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=4),
    )
    m = MoEAdapter(dim=16, other_dim=24, num_tokens=32, other_num_tokens=48, cfg=cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 16).astype(np.float32))
    other = jnp.asarray(np.random.RandomState(2).randn(2, 48, 24).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, other)
    out, aux = m.apply(variables, x, other)
    assert out.shape == (2, 32, 16)
    assert aux["gating_probs"].shape == (2, 3)
    np.testing.assert_allclose(np.asarray(aux["gating_probs"]).sum(-1), 1.0, rtol=1e-5)
    assert aux["expert_index"].shape == (2,)
    assert np.isfinite(float(aux["lb_loss"]))
    # experts are zero-gated at init -> output is exactly zero
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # batch_stats get stacked per expert
    assert "batch_stats" in variables


def test_pair_stage_blocks():
    assert pair_stage_blocks(2, 2) == [(0, 0), (1, 1)]
    p = pair_stage_blocks(18, 6)
    assert len(p) == 18
    assert p[2] == (2, 0) and p[5] == (5, 1) and p[17] == (17, 5)
    assert all(a is None for (v, a) in p if v % 3 != 2)


def test_plan_injection_matches_reference_counts():
    cfg = tiny_ave_config()
    sites = plan_injection(cfg.swin, cfg.htsat, cfg.injection)
    # num_skip=2: stage 0 contributes 2 sites, stage 2 contributes 6
    assert len(sites) == 8
    assert [s.stage for s in sites] == [0, 0, 2, 2, 2, 2, 2, 2]
    assert sites[0].vis_dim == cfg.swin.embed_dim
    assert sites[2].vis_dim == cfg.swin.embed_dim * 4
    assert sites[0].vis_tokens == (cfg.swin.img_size // 4) ** 2


def test_lockstep_encoder_forward():
    cfg = tiny_ave_config()
    enc = LockstepEncoder(cfg.swin, cfg.htsat, cfg.moe, cfg.injection)
    B = 2  # flattened clip*segments
    wave = jnp.asarray(np.random.RandomState(0).randn(B, cfg.audio_len).astype(np.float32))
    imgs = jnp.asarray(
        np.random.RandomState(1).rand(B, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32)
    )
    variables = enc.init(jax.random.PRNGKey(0), wave, imgs)
    f_v, f_a, tele = enc.apply(variables, wave, imgs)
    assert f_v.shape == (B, cfg.swin.num_features)
    assert f_a.shape == (B, cfg.htsat.num_features)
    assert tele["audio_p1"].shape == (8, B, cfg.moe.num_experts)
    assert tele["video_p2"].shape == (8, B, cfg.moe.num_experts)
    assert np.isfinite(np.asarray(f_v)).all() and np.isfinite(np.asarray(f_a)).all()


def test_lockstep_encoder_train_mode_updates_bn():
    cfg = tiny_ave_config()
    enc = LockstepEncoder(cfg.swin, cfg.htsat, cfg.moe, cfg.injection)
    B = 2
    wave = jnp.zeros((B, cfg.audio_len))
    imgs = jnp.zeros((B, cfg.swin.img_size, cfg.swin.img_size, 3))
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "specaug": jax.random.PRNGKey(2)},
        wave, imgs, train=True,
    )
    (f_v, f_a, tele), updates = enc.apply(
        variables, wave, imgs, train=True,
        rngs={"dropout": jax.random.PRNGKey(3), "specaug": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in updates
    assert f_v.shape == (B, cfg.swin.num_features)
