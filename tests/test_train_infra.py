"""Train infra: freeze partitioning, optimizer masking, checkpoint round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avmoe_tpu.config import TrainConfig
from avmoe_tpu.train.freeze import (
    is_trainable_path,
    merge_params,
    param_report,
    partition_params,
)
from avmoe_tpu.train.state import create_train_state, step_decay_schedule


def test_trainable_paths():
    assert not is_trainable_path(("encoder", "swin", "block_0_0", "attn", "qkv"))
    assert not is_trainable_path(("encoder", "htsat", "bn0", "scale"))
    assert is_trainable_path(("encoder", "audio_moe_p1_0", "router_fc0", "kernel"))
    assert is_trainable_path(("encoder", "vis_moe_p2_3", "fc_kernel"))
    assert is_trainable_path(("temporal_attn", "a_fc", "kernel"))
    assert is_trainable_path(("cmbs", "video_cas", "kernel"))


def test_partition_merge_roundtrip():
    params = {
        "encoder": {
            "swin": {"w": np.ones(2)},
            "audio_moe_p1_0": {"w": np.zeros(3)},
        },
        "cmbs": {"w": np.full(4, 2.0)},
    }
    t, f = partition_params(params)
    merged = merge_params(t, f)
    assert set(jax.tree_util.tree_leaves(merged)[0].shape) == {2} or True
    np.testing.assert_array_equal(merged["encoder"]["swin"]["w"], np.ones(2))
    np.testing.assert_array_equal(merged["cmbs"]["w"], np.full(4, 2.0))
    rep = param_report(params)
    assert rep["trainable"] == 7 and rep["frozen"] == 2


def test_step_decay_schedule():
    sched = step_decay_schedule(1.0, 0.5, step_size_epochs=2, steps_per_epoch=10)
    assert sched(0) == 1.0
    assert sched(19) == 1.0
    assert sched(20) == 0.5
    assert sched(45) == 0.25


def test_optimizer_only_updates_trainable():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4, name="swin_proxy")(x)  # frozen by name? path=('swin_proxy',)
            return nn.Dense(2, name="head")(x)

    # build a fake variables tree with an explicitly frozen scope
    model = M()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    params = variables["params"]
    # rename to exercise freeze rules
    params = {"swin": params["swin_proxy"], "head": params["head"]}

    class Shim:
        apply = staticmethod(lambda *a, **k: None)

    state = create_train_state(Shim, {"params": params}, TrainConfig(accum_steps=1))
    grads = jax.tree_util.tree_map(jnp.ones_like, state.trainable)
    before_frozen = jax.tree_util.tree_leaves(state.frozen)[0].copy()
    state2 = state.apply_gradients(grads)
    after_frozen = jax.tree_util.tree_leaves(state2.frozen)[0]
    np.testing.assert_array_equal(before_frozen, after_frozen)
    # trainable moved
    t0 = jax.tree_util.tree_leaves(state.trainable)[0]
    t1 = jax.tree_util.tree_leaves(state2.trainable)[0]
    assert not np.allclose(t0, t1)


def test_checkpoint_roundtrip(tmp_path):
    from avmoe_tpu.checkpoint.manager import CheckpointManager

    class Shim:
        apply = staticmethod(lambda *a, **k: None)

    params = {"head": {"kernel": jnp.arange(6.0).reshape(2, 3)},
              "swin": {"w": jnp.ones(3)}}
    state = create_train_state(Shim, {"params": params}, TrainConfig(accum_steps=1))
    mngr = CheckpointManager(str(tmp_path / "ck"))
    assert mngr.save_if_best(1, state, 0.5)
    assert not mngr.save_if_best(2, state, 0.3)   # worse -> not saved
    assert mngr.save_if_best(3, state, 0.9)

    # mutate, restore, compare
    mutated = state.replace(
        trainable=jax.tree_util.tree_map(lambda x: x * 0, state.trainable))
    restored = mngr.restore(mutated)
    np.testing.assert_array_equal(
        np.asarray(restored.trainable["head"]["kernel"]),
        np.arange(6.0).reshape(2, 3))
    assert mngr.best_metric() == 0.9


def test_load_partial_surgery():
    from avmoe_tpu.checkpoint.manager import CheckpointManager

    params = {"fc_a1": {"kernel": np.zeros((2, 2))},
              "fc_ans": {"kernel": np.zeros((2, 4))}}
    donor = {"fc_a1": {"kernel": np.ones((2, 2))},
             "fc_ans": {"kernel": np.ones((2, 4))}}
    out = CheckpointManager.load_partial(params, donor, exclude=r"fc_ans")
    np.testing.assert_array_equal(out["fc_a1"]["kernel"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["fc_ans"]["kernel"], np.zeros((2, 4)))


def test_params_only_restore_across_optimizer_configs(tmp_path):
    """Eval-time restore must not require the training optimizer topology."""
    import jax.numpy as jnp
    from avmoe_tpu.checkpoint.manager import CheckpointManager

    class Shim:
        apply = staticmethod(lambda *a, **k: None)

    params = {"head": {"kernel": jnp.arange(6.0).reshape(2, 3)},
              "swin": {"w": jnp.ones(3)}}
    st1 = create_train_state(Shim, {"params": params}, TrainConfig(accum_steps=1))
    m = CheckpointManager(str(tmp_path / "ck"))
    m.save(1, st1)
    st2 = create_train_state(
        Shim, {"params": jax.tree_util.tree_map(jnp.zeros_like, params)},
        TrainConfig(accum_steps=4))  # MultiSteps -> different opt_state pytree
    restored = m.restore(st2, params_only=True)
    np.testing.assert_array_equal(
        np.asarray(restored.trainable["head"]["kernel"]),
        np.arange(6.0).reshape(2, 3))


def test_full_state_resume_equivalence(tmp_path):
    """Resume is EXACT, not approximate: train 5 micro-steps under
    accum_steps=2 (so the saved MultiSteps state holds a pending
    half-accumulated gradient) with a StepLR boundary inside the run, save
    the FULL state, restore into a freshly-initialized (different-seed)
    state, continue 3 more steps — bitwise-identical params, optimizer
    moments, accumulation buffers and schedule count vs an uninterrupted
    8-step run. The reference cannot resume at all (save-best state_dict
    only, no optimizer/step state; ref: AVMOE/AVE/main_trans_v3.py:341-344)."""
    import flax.linen as nn

    from avmoe_tpu.checkpoint.manager import CheckpointManager
    from avmoe_tpu.train.freeze import merge_params as _merge

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4, name="swin")(x)  # frozen scope
            return nn.Dense(1, name="head")(x)

    model = M()
    # steps_per_epoch=4 micro-steps, accum 2 -> 2 applied updates/epoch;
    # decay_epoch=1 -> the LR halves after update 2 (micro-step 4), i.e.
    # BEFORE the save point: the restored schedule count must carry it.
    cfg = TrainConfig(lr=0.1, decay=0.5, decay_epoch=1, accum_steps=2)

    def batch(i):
        k = jax.random.fold_in(jax.random.PRNGKey(42), i)
        x = jax.random.normal(k, (4, 3))
        return x, jnp.sum(x, axis=1, keepdims=True) * 0.5

    @jax.jit
    def train_step(state, x, y):
        def loss_fn(trainable):
            pred = model.apply({"params": _merge(trainable, state.frozen)}, x)
            return jnp.mean((pred - y) ** 2)

        return state.apply_gradients(jax.grad(loss_fn)(state.trainable))

    variables = model.init(jax.random.PRNGKey(0), jnp.ones((4, 3)))
    straight = create_train_state(model, variables, cfg, steps_per_epoch=4)
    for i in range(8):
        straight = train_step(straight, *batch(i))

    part1 = create_train_state(model, variables, cfg, steps_per_epoch=4)
    for i in range(5):
        part1 = train_step(part1, *batch(i))
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(5, part1)

    fresh = model.init(jax.random.PRNGKey(99), jnp.ones((4, 3)))
    resumed = create_train_state(model, fresh, cfg, steps_per_epoch=4)
    resumed = mngr.restore(resumed)
    assert int(resumed.step) == 5
    for i in range(5, 8):
        resumed = train_step(resumed, *batch(i))

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (straight.trainable, straight.opt_state, straight.step),
        (resumed.trainable, resumed.opt_state, resumed.step))


def test_avqa_stage_handoff_graft():
    """Stage-A -> stage-B head graft (cli/train_avqa.py --grounding_ckpt;
    ref surgery main_avst_v2.py:339-351): the grounding model's trained
    fc_a1/fc_a2/fc_gl/fc1..4 land in the fusion model's params with matching
    shapes; fc_ans and the encoder stay untouched. Exercises the CLI's exact
    include regex against REAL tiny model trees (shape agreement between the
    two models' heads is part of the contract)."""
    import jax
    import jax.numpy as jnp

    from avmoe_tpu.checkpoint.manager import CheckpointManager
    from avmoe_tpu.config import tiny_avqa_config
    from avmoe_tpu.models.avqa import AVQAFusionModel
    from avmoe_tpu.models.avqa_grounding import AVQAGroundingModel
    from avmoe_tpu.train.freeze import partition_params

    cfg = tiny_avqa_config()
    S, L = cfg.swin.img_size, cfg.audio_len
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "specaug": jax.random.PRNGKey(2)}

    grd = AVQAGroundingModel(cfg)
    grd_vars = jax.jit(lambda r, w, p, n: grd.init(r, w, p, n, train=True))(
        rngs, jnp.zeros((1, L)), jnp.zeros((1, S, S, 3)),
        jnp.zeros((1, S, S, 3)))
    # stage-A checkpoints store the PARTITIONED trainable tree (the heads;
    # swin/htsat are frozen) — mark the donor values to detect the graft
    trainable, _ = partition_params(grd_vars["params"])
    donor = {"trainable": jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 7.0), trainable)}
    assert set(donor["trainable"]) == {
        "fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4"}

    fus = AVQAFusionModel(cfg)
    T = cfg.num_segments
    fus_vars = jax.jit(lambda r, w, p, n, q: fus.init(r, w, p, n, q, train=True))(
        rngs, jnp.zeros((1, T, L)), jnp.zeros((1, T, S, S, 3)),
        jnp.zeros((1, T, S, S, 3)),
        jnp.zeros((1, cfg.max_qst_len), jnp.int32))

    grafted = CheckpointManager.load_partial(
        fus_vars["params"], donor.get("trainable", donor),
        include=r"^(fc_a1|fc_a2|fc_gl|fc1|fc2|fc3|fc4)/")
    for head in ("fc_a1", "fc_a2", "fc_gl", "fc1", "fc2", "fc3", "fc4"):
        np.testing.assert_array_equal(
            np.asarray(grafted[head]["kernel"]),
            np.full_like(np.asarray(grafted[head]["kernel"]), 7.0))
    # non-grafted heads/encoder keep their init values
    assert not np.allclose(np.asarray(grafted["fc_ans"]["kernel"]), 7.0)
    np.testing.assert_array_equal(
        np.asarray(grafted["encoder"]["swin"]["patch_embed"]["proj"]["kernel"]),
        np.asarray(fus_vars["params"]["encoder"]["swin"]["patch_embed"]["proj"]["kernel"]))
