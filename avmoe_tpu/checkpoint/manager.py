"""Orbax-backed full train-state checkpointing with resume.

Upgrades the reference's save-best-state_dict-only scheme (no optimizer/step
state, no resume - ref: AVMOE/AVE/main_trans_v3.py:341-344) to full-state
checkpoints: params (trainable + frozen), batch stats, optimizer state and
step, plus best-metric tracking and a `load_partial` surgery API covering the
reference's cross-stage checkpoint handoffs (AVQA grounding-gen -> AVST remap,
ref: main_avst_v2.py:339-360)."""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util

from avmoe_tpu.train.state import AVMoETrainState


def jnp_like(template, value):
    """Cast a restored array to the template's dtype (restores come back as
    numpy; keep the state's dtypes)."""
    import jax.numpy as jnp

    return jnp.asarray(value, dtype=np.asarray(template).dtype)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self._best_path = os.path.join(self.directory, "best.json")

    # -- full-state save / resume ------------------------------------------

    def save(self, step: int, state: AVMoETrainState, metrics: Optional[Dict] = None):
        payload = {
            "trainable": state.trainable,
            "frozen": state.frozen,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mngr.save(step, args=ocp.args.StandardSave(payload), metrics=metrics)
        self._mngr.wait_until_finished()

    def restore(self, state: AVMoETrainState, step: Optional[int] = None,
                params_only: bool = False) -> AVMoETrainState:
        """Full-state restore; with params_only=True only params/batch_stats
        are taken (evaluation from a checkpoint trained with a different
        optimizer config, e.g. another accum_itr)."""
        step = step if step is not None else self._mngr.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        if params_only:
            raw = self._mngr.restore(step)  # structure-free restore
            return state.replace(
                trainable=jax.tree_util.tree_map(
                    lambda t, s: jnp_like(s, t), raw["trainable"], state.trainable),
                frozen=jax.tree_util.tree_map(
                    lambda t, s: jnp_like(s, t), raw["frozen"], state.frozen),
                batch_stats=jax.tree_util.tree_map(
                    lambda t, s: jnp_like(s, t), raw["batch_stats"],
                    state.batch_stats),
            )
        template = {
            "trainable": state.trainable,
            "frozen": state.frozen,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(**restored)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    # -- best-metric tracking (the reference's save-if-best loop) -----------

    def save_if_best(self, step: int, state: AVMoETrainState, metric: float) -> bool:
        best = self.best_metric()
        if best is None or metric >= best:
            self.save(step, state, metrics={"metric": float(metric)})
            with open(self._best_path, "w") as f:
                json.dump({"step": int(step), "metric": float(metric)}, f)
            return True
        return False

    def best_metric(self) -> Optional[float]:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return float(json.load(f)["metric"])
        return None

    # -- partial load / remap surgery ---------------------------------------

    @staticmethod
    def load_partial(
        params: Dict,
        donor: Dict,
        *,
        include: Optional[str] = None,
        exclude: Optional[str] = None,
        rename: Optional[Dict[str, str]] = None,
    ) -> Dict:
        """Copy donor params into `params` where paths match.

        include/exclude are regexes over '/'-joined paths; `rename` maps donor
        path prefixes to target prefixes (the 'load grounding heads, drop
        fc_ans' style surgery)."""
        flat = dict(traverse_util.flatten_dict(params))
        donor_flat = traverse_util.flatten_dict(donor)
        inc = re.compile(include) if include else None
        exc = re.compile(exclude) if exclude else None
        applied = 0
        for k, v in donor_flat.items():
            path = "/".join(k)
            if rename:
                for src, dst in rename.items():
                    if path.startswith(src):
                        path = dst + path[len(src):]
                        break
            key = tuple(path.split("/"))
            if inc and not inc.search(path):
                continue
            if exc and exc.search(path):
                continue
            if key in flat and flat[key].shape == v.shape:
                flat[key] = v
                applied += 1
        assert applied > 0, "load_partial matched nothing"
        return traverse_util.unflatten_dict(flat)
