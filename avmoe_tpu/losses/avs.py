"""AVS segmentation losses (channels-last).

Re-creation of the reference loss suites:
  * S4 (ref: avs_s4/loss.py:7-116): first-frame IoU-BCE + optional
    masked-audio-visual cosine similarity term.
  * MS3 (ref: avs_ms3/loss.py:7-170): all-frame IoU-BCE + masked-AV loss with
    euclidean / KL variants and the `closer_loss` nearest-audio pairing.

Masks are (B*T, H, W) logits; GT masks binary (B*T, H, W) (S4 supervises only
frame 0 of each clip at train time).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bce(probs: jax.Array, targets: jax.Array, eps: float = 1e-7) -> jax.Array:
    p = jnp.clip(probs, eps, 1 - eps)
    return -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p)).mean()


def f1_iou_bce_loss(pred_logits: jax.Array, first_gt: jax.Array,
                    num_frames: int = 5) -> jax.Array:
    """BCE on the FIRST frame of each clip (S4 weak supervision,
    ref: avs_s4/loss.py:7-27). pred (B*T, H, W); first_gt (B, H, W)."""
    pred = jax.nn.sigmoid(pred_logits)
    first = pred.reshape(-1, num_frames, *pred.shape[1:])[:, 0]
    return _bce(first, first_gt)


def f5_iou_bce_loss(pred_logits: jax.Array, gt: jax.Array) -> jax.Array:
    """BCE on all frames (MS3, ref: avs_ms3/loss.py:7-20). pred (B*T, H, W);
    gt (B*T, H, W) or batched (B, T, H, W)."""
    gt = gt.reshape(pred_logits.shape)
    return _bce(jax.nn.sigmoid(pred_logits), gt)


def _masked_visual_feature(pred_logits: jax.Array, v_map: jax.Array,
                           pooling: str, threshold: bool,
                           sigmoid_after_pool: bool) -> jax.Array:
    """Pool pred masks to the feature-map size, mask the visual map, average.

    The reference's S4 flavor sigmoids the full-res mask before pooling
    (avs_s4/loss.py:44); MS3 pools the raw logits and sigmoids the pooled
    result (avs_ms3/loss.py:47-50) - these don't commute, so both orders
    are supported. v_map (B*T, H, W, C); returns (B*T, C)."""
    BT, H, W, C = v_map.shape
    x = pred_logits[..., None]  # (BT, 224, 224, 1)
    if not sigmoid_after_pool:
        x = jax.nn.sigmoid(x)
    ph, pw = x.shape[1] // H, x.shape[2] // W
    # pool via reshape (pool sizes always divide): equivalent to
    # AdaptiveAvg/MaxPool2d but avoids reduce_window, whose backward
    # compiles pathologically slowly on CPU and tiles poorly on TPU
    xg = x.reshape(x.shape[0], H, ph, W, pw, x.shape[-1])
    if pooling == "avg":
        down = xg.mean(axis=(2, 4))
    else:
        down = xg.max(axis=(2, 4))
    if sigmoid_after_pool:
        down = jax.nn.sigmoid(down)
    if threshold:
        down = (down > 0.5).astype(v_map.dtype)
        n_obj = down.sum(axis=(1, 2))
        return (v_map * down).sum(axis=(1, 2)) / (n_obj + 1e-6)
    return (v_map * down).mean(axis=(1, 2))


def masked_av_loss(
    pred_logits: jax.Array,
    a_fea_list: Sequence[Optional[jax.Array]],   # each (B, T, C)
    v_map_list: Sequence[jax.Array],             # each (B*T, H, W, C)
    count_stages: Sequence[int],
    *,
    pooling: str = "avg",
    norm_fea: bool = True,
    threshold: bool = True,
    kind: str = "cosine",                         # 'cosine' | 'euclidean' | 'kl'
    closer: bool = False,
    setting: str = "s4",                          # 's4' | 'ms3'
) -> jax.Array:
    """Audio <-> masked-visual matching loss.

    * S4 cosine flavor (Loss_AVM_AV): thresholded masks + -log(relu(cos)),
      sigmoid applied before pooling (ref: avs_s4/loss.py:30-78).
    * MS3 euclidean/KL flavors: soft masks, raw logits pooled then sigmoided
      (ref: avs_ms3/loss.py:23-76).
    * `closer` (Loss_AVM_VV, ref: avs_ms3/loss.py:79-131): audio only selects
      the nearest-neighbor indices; the distance/KL term compares each masked
      visual feature v against v[idxs], NOT against the audio feature.
    """
    total = 0.0
    sigmoid_after_pool = setting == "ms3"
    for stage in count_stages:
        a = a_fea_list[stage].reshape(-1, a_fea_list[stage].shape[-1])  # (BT, C)
        # threshold is honored for every kind (the MS3 reference gates it on
        # --threshold_flag independently of euclidean/kl, avs_ms3/loss.py:52);
        # the closer flavor always takes the soft-mask mean path (:79-131)
        v = _masked_visual_feature(pred_logits, v_map_list[stage], pooling,
                                   threshold and not closer,
                                   sigmoid_after_pool)
        if norm_fea:
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        if closer:
            dists = jnp.linalg.norm(a[:, None] - a[None, :], axis=-1)
            dists = dists + 10.0 * jnp.eye(a.shape[0])
            idxs = jnp.argmin(dists, axis=0)
            target = v[idxs]   # nearest-audio neighbor's VISUAL feature
        else:
            target = a
        if kind == "cosine":
            cos = jnp.sum(v * target, axis=-1)
            total += (-jnp.log(jax.nn.relu(cos) + 1e-6)).mean()
        elif kind == "euclidean":
            total += jnp.linalg.norm(target - v, axis=-1).mean()
        elif kind == "kl":
            p = jax.nn.softmax(v, axis=-1)
            q = jax.nn.softmax(target, axis=-1)
            total += jnp.sum(q * (jnp.log(q + 1e-12) - jnp.log(p + 1e-12)))
        else:
            raise ValueError(kind)
    return total / max(len(count_stages), 1)


def iou_semantic_aware_loss(
    pred_logits: jax.Array,
    gt_mask: jax.Array,
    a_fea_list: Sequence[Optional[jax.Array]],
    v_map_list: Sequence[jax.Array],
    *,
    setting: str = "s4",                 # 's4' | 'ms3'
    num_frames: int = 5,
    lambda_1: float = 0.0,
    count_stages: Sequence[int] = (),
    sa_loss_flag: bool = False,
    pooling: str = "avg",
    kind: str = "cosine",
    closer: bool = False,
    norm_fea: bool = True,
    threshold: bool = True,
) -> Tuple[jax.Array, Dict]:
    """Combined segmentation loss (ref: avs_s4/loss.py:80-116,
    avs_ms3/loss.py:133-170). S4's masked-AV flavor hardcodes
    norm_fea/threshold True (avs_s4/loss.py:30-78); MS3 exposes them as
    flags whose published recipe leaves both OFF (train_v2.sh vs
    train_v2.py:38-39 defaults)."""
    if setting == "s4":
        iou = f1_iou_bce_loss(pred_logits, gt_mask, num_frames)
    else:
        iou = f5_iou_bce_loss(pred_logits, gt_mask)
    total = iou
    aux = {"iou_loss": iou}
    if sa_loss_flag and lambda_1 > 0 and count_stages:
        sa = masked_av_loss(pred_logits, a_fea_list, v_map_list, count_stages,
                            pooling=pooling, kind=kind, closer=closer,
                            norm_fea=norm_fea, threshold=threshold,
                            setting=setting)
        total = total + lambda_1 * sa
        aux["sa_loss"] = sa
    return total, aux
