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
from flax import struct
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
    sched = step_decay_schedule(cfg.lr, cfg.decay, cfg.decay_epoch, updates_per_epoch)
    tx = optax.adam(learning_rate=sched)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def create_train_state(
    model,
    variables: Dict,
    cfg: TrainConfig,
    steps_per_epoch: int = 1,
    tx: Optional[optax.GradientTransformation] = None,
) -> AVMoETrainState:
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    trainable, frozen = partition_params(params)
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
