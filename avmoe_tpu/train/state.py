"""Train state: partitioned params (trainable/frozen), batch stats, optimizer.

Replaces the reference's Adam + StepLR + grad-accumulation driver pattern
(ref: AVMOE/AVE/main_trans_v3.py:322-348, 136-138) with an optax chain:
  * step-decay learning-rate schedule (StepLR equivalent),
  * optax.MultiSteps for gradient accumulation,
  * optimizer state only over the trainable subtree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util
from flax.core import FrozenDict

from avmoe_tpu.config import TrainConfig
from avmoe_tpu.train.freeze import merge_params, partition_params


class AVMoETrainState(struct.PyTreeNode):
    step: jax.Array
    trainable: Any
    frozen: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @property
    def params(self):
        return merge_params(self.trainable, self.frozen)

    def apply_gradients(self, grads) -> "AVMoETrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.trainable)
        new_trainable = optax.apply_updates(self.trainable, updates)
        return self.replace(
            step=self.step + 1, trainable=new_trainable, opt_state=new_opt_state
        )


def step_decay_schedule(base_lr: float, gamma: float, step_size_epochs: int,
                        steps_per_epoch: int) -> optax.Schedule:
    """StepLR: lr * gamma^(epoch // step_size) evaluated per optimizer step."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    # Under MultiSteps the inner optimizer's count advances once per APPLIED
    # update (every accum_steps micro-steps), so the schedule must be phrased
    # in updates/epoch, not micro-steps/epoch.
    updates_per_epoch = max(steps_per_epoch // max(cfg.accum_steps, 1), 1)

    def _adam(base_lr: float) -> optax.GradientTransformation:
        return optax.adam(learning_rate=step_decay_schedule(
            base_lr, cfg.decay, cfg.decay_epoch, updates_per_epoch))

    if cfg.lr_mlp != cfg.lr:
        # Per-group LR: the reference AVE driver builds Adam(param_group)
        # with lr_mlp on every param whose name contains 'mlp_class'
        # (ref: AVMOE/AVE/main_trans_v3.py:307-321). Only AVE actually uses
        # the groups — AVVP/AVQA build the list but optimize
        # model.parameters() at a single lr (AVVP/main.py:487,
        # AVQA/net_grd_avst/main_avst_v2.py:410); their CLIs pass lr_mlp=lr.
        def _labels(params):
            flat = traverse_util.flatten_dict(params)
            lab = {k: ("mlp_class" if any("mlp_class" in part for part in k)
                       else "base") for k in flat}
            return traverse_util.unflatten_dict(lab)

        tx = optax.multi_transform(
            {"base": _adam(cfg.lr), "mlp_class": _adam(cfg.lr_mlp)}, _labels)
    else:
        tx = _adam(cfg.lr)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def create_train_state(
    model,
    variables: Dict,
    cfg: TrainConfig,
    steps_per_epoch: int = 1,
    tx: Optional[optax.GradientTransformation] = None,
    frozen_scopes: Optional[tuple] = None,
) -> AVMoETrainState:
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    if frozen_scopes is None:
        trainable, frozen = partition_params(params)
    else:
        trainable, frozen = partition_params(params, frozen_scopes)
    tx = tx or make_optimizer(cfg, steps_per_epoch)
    return AVMoETrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(trainable),
        tx=tx,
        apply_fn=model.apply,
    )
