"""Jitted train/eval steps with frozen-backbone gradient partitioning.

The loss is differentiated ONLY w.r.t. the trainable subtree; frozen backbone
weights flow through as non-diff constants (activations still backprop through
them to reach the adapters, but no parameter-grad buffers are materialized -
the memory-efficient TPU equivalent of requires_grad=False)."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from avmoe_tpu.train.freeze import merge_params
from avmoe_tpu.train.state import AVMoETrainState


def make_train_step(
    loss_fn: Callable,
    *,
    rng_streams: Tuple[str, ...] = ("dropout", "specaug", "router", "gumbel", "mixup"),
    donate: bool = True,
) -> Callable:
    """Build a jitted train step.

    Args:
      loss_fn: (variables, batch, rngs, mutable) -> (loss, (aux, new_batch_stats)).
        Must call model.apply with mutable=['batch_stats'] itself.
    Returns:
      train_step(state, batch, rng) -> (state, metrics)
    """

    def train_step(state: AVMoETrainState, batch: Dict, rng: jax.Array):
        keys = jax.random.split(rng, len(rng_streams))
        rngs = {name: k for name, k in zip(rng_streams, keys)}

        def inner(trainable):
            variables = {
                "params": merge_params(trainable, state.frozen),
                "batch_stats": state.batch_stats,
            }
            loss, (aux, new_bs) = loss_fn(variables, batch, rngs)
            return loss, (aux, new_bs)

        (loss, (aux, new_bs)), grads = jax.value_and_grad(inner, has_aux=True)(
            state.trainable
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        metrics = {"loss": loss, **aux}
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(eval_fn: Callable) -> Callable:
    """eval_fn: (variables, batch) -> metrics dict. Returns jitted step."""

    def eval_step(state: AVMoETrainState, batch: Dict):
        variables = {
            "params": merge_params(state.trainable, state.frozen),
            "batch_stats": state.batch_stats,
        }
        return eval_fn(variables, batch)

    return jax.jit(eval_step)
