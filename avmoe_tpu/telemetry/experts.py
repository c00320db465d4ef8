"""Expert-routing telemetry: per-layer activation counts and gate statistics.

Reproduces the reference's expert-usage accounting - per-layer argmax counts
accumulated during eval and dumped as .npy, plus mean gating probabilities
(ref: AVMOE/AVE/main_trans_v3.py:155-226, avs_s4/train_v2.py:286-392) - but
as device arrays reduced post-step instead of Python .tolist() loops, so the
step stays jittable.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


class ExpertUsageTracker:
    """Accumulates (site, batch, expert) gating-prob stacks across eval steps."""

    def __init__(self, num_experts: int):
        self.num_experts = num_experts
        self.counts: Dict[str, np.ndarray] = {}
        self.prob_sums: Dict[str, np.ndarray] = {}
        self.n_samples: Dict[str, int] = {}

    def update(self, telemetry: Dict) -> None:
        """telemetry: {'audio_p1': (S, B, E), 'video_p1': ..., ...} device arrays."""
        for key, probs in telemetry.items():
            if key == "lb_loss" or probs.ndim != 3 or probs.shape[0] == 0:
                continue
            probs = np.asarray(probs)  # (S, B, E)
            S, B, E = probs.shape
            onehot = np.eye(E, dtype=np.int64)[probs.argmax(-1)]  # (S, B, E)
            if key not in self.counts:
                self.counts[key] = np.zeros((S, E), dtype=np.int64)
                self.prob_sums[key] = np.zeros((S, E), dtype=np.float64)
                self.n_samples[key] = 0
            self.counts[key] += onehot.sum(axis=1)
            self.prob_sums[key] += probs.sum(axis=1)
            self.n_samples[key] += B

    def summary(self) -> Dict[str, Dict[str, np.ndarray]]:
        out = {}
        for key in self.counts:
            n = max(self.n_samples[key], 1)
            out[key] = {
                "activation_counts": self.counts[key],
                "activation_fraction": self.counts[key] / n,
                "mean_gating_probs": self.prob_sums[key] / n,
            }
        return out

    def save(self, directory: str, prefix: str = "expert_stats") -> None:
        """Dump per-stream stats as .npy (the reference's telemetry artifact)."""
        os.makedirs(directory, exist_ok=True)
        for key, stats in self.summary().items():
            for stat_name, arr in stats.items():
                np.save(os.path.join(directory, f"{prefix}_{key}_{stat_name}.npy"), arr)

    def reset(self) -> None:
        self.counts.clear()
        self.prob_sums.clear()
        self.n_samples.clear()
