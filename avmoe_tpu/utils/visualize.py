"""Prediction/expert visualization utilities.

Re-creation of the reference's plotting helpers (ref: AVMOE/AVE/utils/
vis_pred.py:20 - per-clip prediction-vs-GT timelines; AVS test_v2.py:225-232
t-SNE feature dumps). matplotlib is optional: import is deferred."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def plot_prediction_timeline(
    pred: np.ndarray,        # (T,) predicted class per segment
    target: np.ndarray,      # (T,) gt class per segment
    num_classes: int,
    save_path: str,
    title: str = "",
) -> None:
    """Two-row timeline (GT vs prediction) per 1s segment."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = len(pred)
    fig, ax = plt.subplots(figsize=(max(6, T * 0.6), 1.6))
    cmap = plt.get_cmap("tab20", num_classes + 1)
    for t in range(T):
        ax.add_patch(plt.Rectangle((t, 1.05), 1, 0.9, color=cmap(int(target[t]))))
        ax.add_patch(plt.Rectangle((t, 0.0), 1, 0.9, color=cmap(int(pred[t]))))
    ax.set_xlim(0, T)
    ax.set_ylim(0, 2)
    ax.set_yticks([0.45, 1.5])
    ax.set_yticklabels(["pred", "gt"])
    ax.set_xlabel("segment")
    if title:
        ax.set_title(title)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_tsne(
    features: np.ndarray,     # (N, D)
    labels: np.ndarray,       # (N,) int labels
    save_path: str,
    perplexity: float = 30.0,
    title: str = "t-SNE",
) -> np.ndarray:
    """Embed + scatter features colored by label; returns the 2-D embedding."""
    from avmoe_tpu.utils.tsne import tsne

    emb = tsne(features, perplexity=min(perplexity, max(len(features) // 4, 2)))
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=8)
    ax.set_title(title)
    fig.colorbar(sc, ax=ax, shrink=0.8)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return emb
