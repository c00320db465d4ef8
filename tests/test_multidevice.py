"""Multi-device correctness: dp sharding and sp token sharding must be
numerically equivalent to single-device execution (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.config import InjectionConfig, replace, tiny_ave_config
from avmoe_tpu.models.ave import AVEModel
from avmoe_tpu.parallel.mesh import make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ave_config()
    model = AVEModel(cfg)
    B, T = 8, cfg.num_segments
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(
        rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), wave, imgs)
    single = jax.jit(lambda v, w, im: model.apply(v, w, im)["event_logits"])(
        variables, wave, imgs)
    return cfg, model, variables, wave, imgs, np.asarray(single)


def test_dp_sharded_matches_single_device(setup):
    cfg, model, variables, wave, imgs, single = setup
    mesh = make_mesh(8)
    v_rep = replicate(variables, mesh)
    batch = shard_batch({"wave": wave, "images": imgs}, mesh)
    out = jax.jit(lambda v, w, im: model.apply(v, w, im)["event_logits"])(
        v_rep, batch["wave"], batch["images"])
    np.testing.assert_allclose(np.asarray(out), single, rtol=2e-3, atol=2e-3)


def test_sp_token_sharding_matches(setup):
    cfg, model, variables, wave, imgs, single = setup
    cfg_sp = replace(cfg, injection=replace(cfg.injection,
                                            token_shard_axis="model"))
    model_sp = AVEModel(cfg_sp)
    mesh = make_mesh(8, model=2)
    try:
        jax.set_mesh(mesh)
    except Exception:
        pytest.skip("jax.set_mesh unavailable")
    v_rep = replicate(variables, mesh)
    batch = shard_batch({"wave": wave, "images": imgs}, mesh)
    out = jax.jit(lambda v, w, im: model_sp.apply(v, w, im)["event_logits"])(
        v_rep, batch["wave"], batch["images"])
    np.testing.assert_allclose(np.asarray(out), single, rtol=2e-3, atol=2e-3)
