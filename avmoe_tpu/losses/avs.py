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
    """BCE on all frames (MS3, ref: avs_ms3/loss.py:7-20). Shapes (B*T, H, W)."""
    return _bce(jax.nn.sigmoid(pred_logits), gt)


def _masked_visual_feature(pred_logits: jax.Array, v_map: jax.Array,
                           pooling: str, threshold: bool) -> jax.Array:
    """Pool pred masks to the feature-map size, mask the visual map, average.
    v_map (B*T, H, W, C); returns (B*T, C)."""
    BT, H, W, C = v_map.shape
    probs = jax.nn.sigmoid(pred_logits)[..., None]  # (BT, 224, 224, 1)
    ph, pw = probs.shape[1] // H, probs.shape[2] // W
    if pooling == "avg":
        down = jax.lax.reduce_window(
            probs, 0.0, jax.lax.add, (1, ph, pw, 1), (1, ph, pw, 1), "VALID"
        ) / (ph * pw)
    else:
        down = jax.lax.reduce_window(
            probs, -jnp.inf, jax.lax.max, (1, ph, pw, 1), (1, ph, pw, 1), "VALID")
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
) -> jax.Array:
    """Audio <-> masked-visual matching loss (S4 cosine flavor uses
    thresholded masks + -log(relu(cos)); MS3 euclidean/KL flavors use soft
    masks; `closer` swaps each target with its nearest-audio neighbor's
    visual feature - ref: avs_ms3/loss.py:76-131)."""
    total = 0.0
    for stage in count_stages:
        a = a_fea_list[stage].reshape(-1, a_fea_list[stage].shape[-1])  # (BT, C)
        v = _masked_visual_feature(pred_logits, v_map_list[stage], pooling,
                                   threshold and kind == "cosine")
        if norm_fea:
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        if closer:
            dists = jnp.linalg.norm(a[:, None] - a[None, :], axis=-1)
            dists = dists + 10.0 * jnp.eye(a.shape[0])
            idxs = jnp.argmin(dists, axis=0)
        if norm_fea:
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        if closer:
            v = v[idxs]
        if kind == "cosine":
            cos = jnp.sum(v * a, axis=-1)
            total += (-jnp.log(jax.nn.relu(cos) + 1e-6)).mean()
        elif kind == "euclidean":
            total += jnp.linalg.norm(a - v, axis=-1).mean()
        elif kind == "kl":
            p = jax.nn.softmax(v, axis=-1)
            q = jax.nn.softmax(a, axis=-1)
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
) -> Tuple[jax.Array, Dict]:
    """Combined segmentation loss (ref: avs_s4/loss.py:80-116,
    avs_ms3/loss.py:133-170)."""
    if setting == "s4":
        iou = f1_iou_bce_loss(pred_logits, gt_mask, num_frames)
    else:
        iou = f5_iou_bce_loss(pred_logits, gt_mask)
    total = iou
    aux = {"iou_loss": iou}
    if sa_loss_flag and lambda_1 > 0 and count_stages:
        sa = masked_av_loss(pred_logits, a_fea_list, v_map_list, count_stages,
                            pooling=pooling, kind=kind, closer=closer)
        total = total + lambda_1 * sa
        aux["sa_loss"] = sa
    return total, aux
