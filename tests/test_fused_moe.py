"""Fused gated combine (bottleneck-rank expert mixture) vs the reference
unfused path: exact algebra, so only dtype-rounding differences are allowed.

Covers all four (use_bn, post_layernorm) flag combinations and both f32
(tight tolerance) and bf16 (stream tolerance) compute dtypes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.config import AdapterConfig, MoEConfig
from avmoe_tpu.moe.adapter import MoEAdapter


def _randomize(tree, rng, scale=0.5):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for leaf in leaves:
        out.append(jnp.asarray(
            rng.normal(0.0, scale, leaf.shape).astype(np.float32)))
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("use_bn,post_ln", [(True, True), (True, False),
                                            (False, True), (False, False)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_combine_matches_unfused(use_bn, post_ln, dtype):
    cfg = MoEConfig(
        num_multimodal_experts=2, num_singlemodal_experts=2,
        adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=4,
                              use_bn=use_bn, post_layernorm=post_ln))
    B, N, C, M, Co = 2, 24, 32, 16, 48
    adapter = MoEAdapter(dim=C, other_dim=Co, num_tokens=N, other_num_tokens=M,
                         cfg=cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    other = jnp.asarray(rng.normal(0, 1, (B, M, Co)).astype(np.float32))

    variables = adapter.init(jax.random.PRNGKey(0), x, other, False)
    # randomize params AND batch stats so gates/affines are all non-trivial
    params = _randomize(variables["params"], rng)
    vars_r = {"params": params}
    if "batch_stats" in variables:
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.abs(rng.normal(0.5, 0.2, a.shape)
                                         ).astype(np.float32)),
            variables["batch_stats"])
        vars_r["batch_stats"] = stats

    os.environ["AVMOE_FUSED_MOE"] = "0"
    ref, aux_ref = adapter.apply(vars_r, x, other, False)
    os.environ["AVMOE_FUSED_MOE"] = "1"
    try:
        out, aux = adapter.apply(vars_r, x, other, False)
    finally:
        os.environ["AVMOE_FUSED_MOE"] = "0"

    np.testing.assert_allclose(np.asarray(aux["gating_probs"]),
                               np.asarray(aux_ref["gating_probs"]),
                               rtol=1e-5, atol=1e-6)
    ref_f = np.asarray(ref, np.float32)
    out_f = np.asarray(out, np.float32)
    if dtype == jnp.float32:
        np.testing.assert_allclose(out_f, ref_f, rtol=2e-4, atol=2e-4)
    else:
        # bf16 streams: compare against the magnitude of the output
        denom = max(np.abs(ref_f).max(), 1e-3)
        assert np.abs(out_f - ref_f).max() / denom < 0.05, (
            np.abs(out_f - ref_f).max(), denom)


@pytest.mark.parametrize("sa", ["none", "token", "bmm", "mha"])
@pytest.mark.parametrize("before_ln", [True, False])
def test_fused_trunk_variants(sa, before_ln):
    """Round-3 fused TRUNK (ln_before folded into the down kernel; latent
    -attention deltas at rank T): parity vs the materialized trunk across
    unimodal self-attention flavors and the before_layernorm flag. 'bmm' and
    'mha' fall back to the materialized trunk - included to pin the fallback."""
    cfg = MoEConfig(
        num_multimodal_experts=2, num_singlemodal_experts=2,
        adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=4,
                              use_bn=True, post_layernorm=True,
                              before_layernorm=before_ln, self_attention=sa))
    B, N, C, M, Co = 2, 24, 32, 16, 48
    adapter = MoEAdapter(dim=C, other_dim=Co, num_tokens=N, other_num_tokens=M,
                         cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    other = jnp.asarray(rng.normal(0, 1, (B, M, Co)).astype(np.float32))

    variables = adapter.init(jax.random.PRNGKey(0), x, other, False)
    params = _randomize(variables["params"], rng)
    vars_r = {"params": params}
    if "batch_stats" in variables:
        vars_r["batch_stats"] = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.abs(rng.normal(0.5, 0.2, a.shape)
                                         ).astype(np.float32)),
            variables["batch_stats"])

    os.environ["AVMOE_FUSED_MOE"] = "0"
    ref, _ = adapter.apply(vars_r, x, other, False)
    os.environ["AVMOE_FUSED_MOE"] = "1"
    try:
        out, _ = adapter.apply(vars_r, x, other, False)
    finally:
        os.environ["AVMOE_FUSED_MOE"] = "0"
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("sa", ["none", "token"])
def test_fused_train_value_grads_and_stats_match(sa):
    """AVMOE_FUSED_MOE_TRAIN: train-mode fused combine must reproduce the
    materialized path's loss value, parameter gradients AND updated running
    batch_stats (bn2's batch stats are computed in closed form from z)."""
    cfg = MoEConfig(
        num_multimodal_experts=2, num_singlemodal_experts=2,
        adapter=AdapterConfig(downsample=4, num_conv_group=2, num_tokens=4,
                              use_bn=True, post_layernorm=True,
                              self_attention=sa))
    B, N, C, M, Co = 2, 24, 32, 16, 48
    adapter = MoEAdapter(dim=C, other_dim=Co, num_tokens=N, other_num_tokens=M,
                         cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)).astype(np.float32))
    other = jnp.asarray(rng.normal(0, 1, (B, M, Co)).astype(np.float32))

    variables = adapter.init(jax.random.PRNGKey(0), x, other, True)
    params = _randomize(variables["params"], rng)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.abs(rng.normal(0.5, 0.2, a.shape)
                                     ).astype(np.float32)),
        variables["batch_stats"])

    def loss_fn(p):
        out, new_vars = adapter.apply(
            {"params": p, "batch_stats": stats}, x, other, True,
            mutable=["batch_stats"])
        y, aux = out
        return jnp.sum(jnp.square(y)) + 0.1 * jnp.sum(aux["gating_probs"]), (
            new_vars["batch_stats"])

    os.environ["AVMOE_FUSED_MOE_TRAIN"] = "0"
    (l_ref, bs_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)
    os.environ["AVMOE_FUSED_MOE_TRAIN"] = "1"
    try:
        (l_out, bs_out), g_out = jax.value_and_grad(loss_fn, has_aux=True)(params)
    finally:
        os.environ["AVMOE_FUSED_MOE_TRAIN"] = "0"

    np.testing.assert_allclose(float(l_out), float(l_ref), rtol=1e-4)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_out)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(ka))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(bs_ref),
            jax.tree_util.tree_leaves_with_path(bs_out)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(ka))
