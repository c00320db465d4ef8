"""AVQA accuracy with the 9 question-type splits
(ref: AVMOE/AVQA/net_grd_avst/main_avst_v2.py:222-306)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np


class AVQAAccuracy:
    """Accumulates overall + per-(modality, question-type) accuracy."""

    def __init__(self):
        self.correct = defaultdict(int)
        self.total = defaultdict(int)

    def update(self, pred: np.ndarray, answer: np.ndarray, qtypes: List[str]):
        for p, a, t in zip(np.asarray(pred), np.asarray(answer), qtypes):
            ok = int(p == a)
            self.correct["overall"] += ok
            self.total["overall"] += 1
            if t:
                self.correct[t] += ok
                self.total[t] += 1

    def summary(self) -> Dict[str, float]:
        return {
            k: 100.0 * self.correct[k] / max(self.total[k], 1)
            for k in self.total
        }
