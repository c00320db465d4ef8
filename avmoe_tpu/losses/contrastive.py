"""Contrastive loss library for AVE (ref: AVMOE/AVE/criterion.py:406-576).

The reference instantiates these in train() alongside the main criterion
(main_trans_v3.py:84-87); provided for API parity and experimentation:

  * contrastive_loss  - margin-based pair loss (criterion.py:406-439)
  * info_nce_loss     - video-level InfoNCE with 10x10 positive blocks
                        (criterion.py:441-525): all 10 segments of a clip are
                        mutual positives across the two modalities
  * mask_info_nce_loss- InfoNCE with a caller-provided positive mask
                        (criterion.py:527-576)
  * yb_loss           - modality-swap contrastive ratio loss over pooled
                        class probabilities (criterion.py:328-404)
  * yb_loss2          - augmented-sample BCE selection loss
                        (criterion.py:70-297; only the well-defined
                        vision/audio/mix paths - the reference's 'mix'
                        branch references an undefined `gg_joint`, a latent
                        NameError we do not reproduce)
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


def _pool_seg(x: jax.Array, how: str) -> jax.Array:
    return x.max(axis=1) if how == "max" else x.mean(axis=1)


def yb_loss(all_prob: jax.Array, audio_idx: jax.Array, vis_idx: jax.Array,
            target: jax.Array, *, exp: bool = False, pos_pool: str = "max",
            neg_pool: str = "max") -> jax.Array:
    """Modality-swap contrastive ratio loss (ref: AVMOE/AVE/criterion.py:328-404,
    dead code in the reference's main path - instantiated at
    main_trans_v3.py:84-87 but never called).

    all_prob (N, S, 2, C): per-segment class probs, dim 2 = (audio, visual).
    Rows [R:] (R = N - len(audio_idx)) are the augmented/mixed negatives.
    Pairs (audio_idx[i], vis_idx[i]) only contribute when their targets are
    class-disjoint. The reference boolean-filters pos/neg independently
    (shape-unsafe); we use the joint nonzero mask, the only case where its
    elementwise ratio is well-defined.
    """
    K = audio_idx.shape[0]
    R = all_prob.shape[0] - K
    C = all_prob.shape[-1]
    gate = ((target[audio_idx] * target[vis_idx]).sum(-1) == 0)
    gate = gate.astype(all_prob.dtype)[:, None]                    # (K, 1)

    pos_a = _pool_seg(all_prob[audio_idx, :, 0, :], pos_pool)      # (K, C)
    pos_v = _pool_seg(all_prob[vis_idx, :, 1, :], pos_pool)
    neg = _pool_seg(all_prob[R:], neg_pool)                        # (K, 2, C)
    if exp:
        pos_a, pos_v, neg = jnp.exp(pos_a), jnp.exp(pos_v), jnp.exp(neg)
    neg_a, neg_v = neg[:, 1, :], neg[:, 0, :]

    zeros = jnp.zeros((R, C), all_prob.dtype)
    a_pos = zeros.at[audio_idx].set(gate * pos_a) * target
    v_pos = zeros.at[vis_idx].set(gate * pos_v) * target
    a_neg = zeros.at[audio_idx].add(gate * neg_a) * target
    v_neg = zeros.at[vis_idx].add(gate * neg_v) * target

    def ratio_term(pos, negv):
        m = ((pos != 0) & (negv != 0)).astype(pos.dtype)
        term = -jnp.log(pos / (pos + negv + 1e-12) + 1e-12)
        return (term * m).sum() / jnp.maximum(m.sum(), 1.0)

    return ratio_term(v_pos, v_neg) + ratio_term(a_pos, a_neg)


def yb_loss2(prob_x1: jax.Array, prob_x2: jax.Array,
             rand_idx: jax.Array, sample_idx: jax.Array, target: jax.Array,
             *, aug_type: str = "vision", eps: float = 1e-7) -> jax.Array:
    """Augmented-sample selection BCE (ref: AVMOE/AVE/criterion.py:70-297,
    dead code in the reference's main path).

    'vision'/'audio': mean BCE(prob_x2[i], target[sample_idx[i]]).
    'mix'/'yybag': prob_x1/x2 hold 4 augmentation variants stacked along dim 0
    (variant j of pair i at row i + j*K); per pair, pick the variant whose
    max target-masked prob is largest and BCE it against the pair's target.
    The reference's third ('joint') term reads an undefined variable
    (criterion.py:184, latent NameError) and is intentionally not reproduced.
    """
    K = sample_idx.shape[0]

    def bce(p, t):
        p = jnp.clip(p, eps, 1.0 - eps)
        return -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p)).mean(axis=-1)

    if aug_type in ("vision", "audio"):
        return bce(prob_x2[:K], target[sample_idx]).mean()
    if aug_type in ("mix", "yybag"):
        v_x2 = prob_x2[:4 * K].reshape(4, K, -1)                   # (4, K, C)
        v_x1 = prob_x1[:4 * K].reshape(4, K, -1)
        t_s, t_r = target[sample_idx], target[rand_idx]            # (K, C)
        j_s = jnp.argmax((v_x2 * t_s[None]).max(-1), axis=0)       # (K,)
        j_r = jnp.argmax((v_x1 * t_r[None]).max(-1), axis=0)
        sel_x2 = jnp.take_along_axis(v_x2, j_s[None, :, None], axis=0)[0]
        sel_x1 = jnp.take_along_axis(v_x1, j_r[None, :, None], axis=0)[0]
        return jnp.concatenate([bce(sel_x2, t_s), bce(sel_x1, t_r)]).mean()
    raise ValueError(aug_type)


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
