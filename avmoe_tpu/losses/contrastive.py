"""Contrastive loss library for AVE (ref: AVMOE/AVE/criterion.py:406-576).

The reference instantiates these in train() alongside the main criterion
(main_trans_v3.py:84-87); provided for API parity and experimentation:

  * contrastive_loss  - margin-based pair loss (criterion.py:406-439)
  * info_nce_loss     - video-level InfoNCE with 10x10 positive blocks
                        (criterion.py:441-525): all 10 segments of a clip are
                        mutual positives across the two modalities
  * mask_info_nce_loss- InfoNCE with a caller-provided positive mask
                        (criterion.py:527-576)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def contrastive_loss(x0: jax.Array, x1: jax.Array, y: jax.Array,
                     margin: float = 1.0) -> jax.Array:
    """y=1: pull together (squared dist); y=0: push beyond margin."""
    diff = x0 - x1
    dist_sq = jnp.sum(diff * diff, axis=1)
    dist = jnp.sqrt(jnp.maximum(dist_sq, 1e-12))
    mdist = jnp.clip(margin - dist, 0.0)
    loss = y * dist_sq + (1 - y) * mdist * mdist
    return loss.sum() / 2.0 / x0.shape[0]


def info_nce_loss(q: jax.Array, k: jax.Array, tau: float = 0.05,
                  segments: int = 10) -> jax.Array:
    """(B, T, C) audio/visual features; positives are the TxT block of the
    same clip across modalities."""
    B = q.shape[0]
    qf = _l2norm(q.reshape(B * segments, -1))
    kf = _l2norm(k.reshape(B * segments, -1))
    sim = qf @ kf.T  # (BT, BT)
    clip_id = jnp.repeat(jnp.arange(B), segments)
    pos_w = (clip_id[:, None] == clip_id[None, :]).astype(sim.dtype)
    neg_w = 1.0 - pos_w
    e = jnp.exp(sim / tau)
    pos = (e * pos_w).sum(axis=1)
    neg = (e * neg_w).sum(axis=1)
    return jnp.mean(-jnp.log(pos / (pos + neg + 1e-8) + 1e-8))


def mask_info_nce_loss(q: jax.Array, k: jax.Array, mask: jax.Array,
                       tau: float = 0.05) -> jax.Array:
    """InfoNCE with explicit positive mask (rows beyond the mask are negatives)."""
    qf = _l2norm(q.reshape(q.shape[0], -1), axis=1)
    kf = _l2norm(k.reshape(k.shape[0], -1), axis=1)
    sim = qf @ kf.T
    pad = sim.shape[0] - mask.shape[0]
    if pad > 0:
        mask = jnp.concatenate([mask, jnp.zeros((pad, sim.shape[1]), mask.dtype)], axis=0)
    neg_w = 1.0 - mask
    e = jnp.exp(sim / tau)
    pos = (e * mask).sum(axis=1)
    neg = (e * neg_w).sum(axis=1)
    return jnp.mean(-jnp.log(pos / (pos + neg + 1e-8) + 1e-8))
