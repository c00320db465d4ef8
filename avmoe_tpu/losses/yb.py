"""YB contrastive-bag losses (ref: AVMOE/AVE/criterion.py:70 YBLoss2, :328 YBLoss).

These are instantiated by the reference's train loop (main_trans_v3.py:86-87)
but never invoked by the main training path; they are kept here for
loss-library completeness. The reference implementation is a Python loop with
data-dependent boolean indexing; this version is a vectorized, jittable
distillation with masked arithmetic:

* `yb_loss` — weakly-supervised audio/visual bag contrast. For each (audio_i,
  visual_i) pair whose multi-hot targets are disjoint, the positive bag is the
  pooled own-modality probability and the negative bag the pooled
  swapped-modality probability of the tail (augmented) batch entries; the loss
  is a masked mean of -log(pos/(pos+neg)) over target-active classes
  (criterion.py:344-404). The reference's `x[x != 0]` gather becomes a shared
  validity mask (selected pair x active class); entries where a probability is
  exactly 0.0 are not dropped, a measure-zero deviation.
* `yb_loss2` — flavor dispatch on `aug_type` (criterion.py:80-310):
    'vision'/'audio' : mean BCE(prob_x2[i], target[sample_idx[i]])
    'ada'            : label-correlation InfoNCE over L2-normalized features
                       with corr = smooth where target_a @ target_v.T != 0
    'mimix'          : InfoNCE with a binarized self-correlation mask of
                       target[rand_idx] (incl. the reference's row-sum==0
                       quirk, criterion.py:292-300)
  The reference's 'mix'/'yybag' branches reference `gg_joint`/`joint_label`
  whose definitions are commented out (criterion.py:163-169 vs :184) and raise
  NameError if executed; they are dead even by the reference's standards and
  are not reproduced.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bce(p, t, eps=1e-12):
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def _pool(x, kind: str, axis: int):
    return jnp.max(x, axis=axis) if kind == "max" else jnp.mean(x, axis=axis)


def yb_loss(all_prob, audio_idx, vis_idx, target, *, exp: bool = False,
            pos_pool: str = "max", neg_pool: str = "max", eps: float = 1e-12):
    """criterion.py:328-404. all_prob (B_ext, S, 2, C); the last len(audio_idx)
    rows of all_prob are the augmented negatives. target (B, C) multi-hot.
    Returns scalar loss."""
    n = audio_idx.shape[0]
    C = all_prob.shape[-1]
    sel = (target[audio_idx] * target[vis_idx]).sum(-1) == 0  # (n,) disjoint pairs

    a_pos_v = _pool(all_prob[audio_idx, :, 0, :], pos_pool, 1)   # (n, C)
    v_pos_v = _pool(all_prob[vis_idx, :, 1, :], pos_pool, 1)     # (n, C)
    tail = _pool(all_prob[-n:, :, :, :], neg_pool, 1)            # (n, 2, C)
    a_neg_v, v_neg_v = tail[:, 1, :], tail[:, 0, :]
    if exp:
        a_pos_v, v_pos_v = jnp.exp(a_pos_v), jnp.exp(v_pos_v)
        a_neg_v, v_neg_v = jnp.exp(a_neg_v), jnp.exp(v_neg_v)

    B_main = all_prob.shape[0] - n
    # scatter pooled bags to their batch rows. Only SELECTED pairs write (the
    # ref loop's `if sel:` body); among selected duplicates the LAST write
    # wins, matching the loop order. jnp .at[].set is implementation-defined
    # for duplicate indices, so last-write-wins is made explicit via a
    # one-hot argmax over pairs (n and B are a handful of rows here).
    def scatter(idx, vals):
        oh = (idx[:, None] == jnp.arange(B_main)[None, :]) & sel[:, None]  # (n, B)
        row_mask = oh.any(0)                                               # (B,)
        last = (n - 1) - jnp.argmax(oh[::-1], axis=0)                      # (B,)
        out = jnp.where(row_mask[:, None], vals[last], 0.0)
        return out, row_mask

    a_pos, a_m = scatter(audio_idx, a_pos_v)
    v_pos, v_m = scatter(vis_idx, v_pos_v)
    # negatives accumulate (+=) across pairs hitting the same row
    a_neg = jnp.zeros((B_main, C)).at[audio_idx].add(
        jnp.where(sel[:, None], a_neg_v, 0.0))
    v_neg = jnp.zeros((B_main, C)).at[vis_idx].add(
        jnp.where(sel[:, None], v_neg_v, 0.0))

    t = target[:B_main]
    cls = t != 0

    def stream(pos, neg, row_mask):
        m = cls & row_mask[:, None]
        term = -jnp.log(jnp.clip(pos, eps) / jnp.clip(pos + neg, eps))
        return (term * m).sum() / jnp.maximum(m.sum(), 1)

    return stream(v_pos * t, v_neg * t, v_m) + stream(a_pos * t, a_neg * t, a_m)


def yb_loss2(aug_type: str, *, prob_x1=None, prob_x2=None, rand_idx=None,
             sample_idx=None, target=None, target_pair=None, x1=None, x2=None,
             smooth: float = 1.0, tmp: float = 0.1, eps: float = 1e-10):
    """criterion.py:70-310 live flavors. See module docstring.

    'vision'/'audio': prob_x2 (n, C) vs target[sample_idx] (multi-hot probs).
    'ada': x1/x2 (n, D) features; target_pair = (target_audio, target_vis).
    'mimix': x1/x2 (n, D); target (B, C) with rand_idx rows forming the mask.
    """
    if aug_type in ("vision", "audio"):
        n = sample_idx.shape[0]
        return _bce(prob_x2[:n], target[sample_idx]).mean()

    if aug_type == "ada":
        ta, tv = target_pair
        f1 = x1 / jnp.clip(jnp.linalg.norm(x1, axis=-1, keepdims=True), 1e-12)
        f2 = x2 / jnp.clip(jnp.linalg.norm(x2, axis=-1, keepdims=True), 1e-12)
        corr = jnp.where(ta @ tv.T != 0, smooth, 0.0)
        sim = jnp.exp(f1 @ f2.T / tmp)
        pos = (sim * corr).sum(1) + eps
        neg = (sim * (1.0 - corr)).sum(1) + eps
        return (-jnp.log(pos / (pos + neg))).mean()

    if aug_type == "mimix":
        tr = jnp.clip(target[rand_idx] * 2.0, 0.0, 1.0)
        corr = jnp.where(tr @ tr.T != 0, 1.0, 0.0)
        corr_copy = corr
        exact_same = target[sample_idx].sum(-1)  # (n,)
        corr = jnp.where(corr == exact_same[None, :], 1.0, corr)
        f1 = x1 / jnp.clip(jnp.linalg.norm(x1, axis=-1, keepdims=True), 1e-12)
        f2 = x2 / jnp.clip(jnp.linalg.norm(x2, axis=-1, keepdims=True), 1e-12)
        sim = jnp.exp(f1 @ f2.T / tmp)
        pos = (sim * corr).sum(1) + eps
        neg = (sim * (1.0 - corr_copy)).sum(1)
        return (-jnp.log(pos / (pos + neg))).mean()

    raise ValueError(f"unsupported aug_type {aug_type!r} "
                     "(the reference's 'mix'/'yybag' branches are dead code)")
