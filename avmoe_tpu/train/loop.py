"""Generic epoch-based training loop: train -> eval -> save-best -> early-stop.

Mirrors the reference driver shape (ref: AVMOE/AVE/main_trans_v3.py:328-348)
on top of jitted steps, the prefetching BatchLoader, orbax checkpoints and
expert telemetry."""

from __future__ import annotations

import logging
from collections import deque
from typing import Callable, Dict, Optional

import jax
import numpy as np

from avmoe_tpu.telemetry.experts import ExpertUsageTracker
from avmoe_tpu.telemetry.meters import AverageMeter, Timer

log = logging.getLogger("avmoe_tpu")


def train_and_evaluate(
    *,
    state,
    train_step: Callable,
    eval_step: Callable,
    train_loader,
    eval_loader,
    epochs: int,
    seed: int = 0,
    early_stop: int = 0,
    metric_key: str = "accuracy",
    checkpoints=None,          # CheckpointManager or None
    expert_tracker: Optional[ExpertUsageTracker] = None,
    log_every: int = 50,
    writer=None,               # optional metrics writer (wandb-like .log(dict))
):
    rng = jax.random.PRNGKey(seed)
    best = -np.inf
    stall = 0
    timer = Timer()

    for epoch in range(1, epochs + 1):
        meter = AverageMeter()
        # Metric readback is deferred behind a small in-flight queue: syncing
        # on the loss every step costs a full dispatch round-trip per step
        # (~45 ms through the TPU tunnel; measured 267 vs 205 ms/step on the
        # flagship AVE config). Depth 3 keeps a few steps in flight while
        # meters stay only a few steps stale.
        pending = deque()
        drained = -1  # index of the newest step whose metrics are in the meter
        for i, batch in enumerate(train_loader):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            pending.append(metrics)
            if len(pending) > 3:
                m = pending.popleft()
                drained = i - 3
                meter.add(**{k: float(v) for k, v in m.items()
                             if np.ndim(v) == 0})
            if i % log_every == 0 and meter.count("loss"):
                # loss average lags the dispatch frontier by the queue depth;
                # 'thru step N' names the newest step actually in the average
                log.info("epoch %d step %d loss %.4f (thru step %d)",
                         epoch, i, meter.get("loss"), drained)
        for m in pending:
            meter.add(**{k: float(v) for k, v in m.items() if np.ndim(v) == 0})

        eval_meter = AverageMeter()
        if expert_tracker is not None:
            expert_tracker.reset()
        # same deferred-readback pipelining as the train loop: keep a few
        # dispatched eval steps in flight before syncing on their scalars
        pending = deque()

        def _drain_eval(m):
            telemetry = m.pop("telemetry", None)
            eval_meter.add(**{k: float(v) for k, v in m.items()
                              if np.ndim(v) == 0})
            if expert_tracker is not None and telemetry is not None:
                expert_tracker.update(telemetry)

        for batch in eval_loader:
            pending.append(eval_step(state, batch))
            if len(pending) > 3:
                _drain_eval(pending.popleft())
        for m in pending:
            _drain_eval(m)

        val = eval_meter.get(metric_key)
        train_loss = meter.get("loss")
        log.info("epoch %d done in %.1fs: train_loss %.4f val_%s %.4f",
                 epoch, timer.lap(), train_loss, metric_key, val)
        if writer is not None:
            writer.log({"epoch": epoch, "train_loss": train_loss,
                        f"val_{metric_key}": val})

        stall += 1
        if val >= best:
            best = val
            stall = 0
            if checkpoints is not None:
                checkpoints.save_if_best(int(state.step), state, val)
        if early_stop and stall >= early_stop:
            log.info("early stop at epoch %d (best %.4f)", epoch, best)
            break
    return state, best
