"""Rematerialized blocks: grads still flow and match non-remat outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.config import replace, tiny_ave_config
from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_remat_forward_matches_and_grads_flow(policy):
    cfg = tiny_ave_config()
    cfg_r = replace(
        cfg,
        swin=replace(cfg.swin, remat=True, remat_policy=policy),
        htsat=replace(cfg.htsat, remat=True, remat_policy=policy))
    B, T = 1, cfg.num_segments
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3)
                       .astype(np.float32))

    model = AVEModel(cfg)
    model_r = AVEModel(cfg_r)
    variables = model.init(jax.random.PRNGKey(0), wave, imgs)
    out = model.apply(variables, wave, imgs)
    out_r = model_r.apply(variables, wave, imgs)  # same param tree layout
    np.testing.assert_allclose(np.asarray(out["event_logits"]),
                               np.asarray(out_r["event_logits"]),
                               rtol=1e-5, atol=1e-5)

    # grads flow through the remat boundary
    labels = jnp.asarray(np.eye(cfg.num_classes + 1, dtype=np.float32)[
        rng.randint(0, cfg.num_classes + 1, (B, T))])
    loss_fn = make_ave_loss_fn(model_r)

    def scalar_loss(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        loss, _ = loss_fn(v, {"wave": wave, "images": imgs, "labels": labels},
                          {"dropout": jax.random.PRNGKey(1),
                           "specaug": jax.random.PRNGKey(2)})
        return loss

    grads = jax.grad(scalar_loss)(variables["params"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
