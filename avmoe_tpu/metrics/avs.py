"""AVS segmentation metrics: mask IoU and 255-point F-measure.

Re-creation of the reference's utility metrics (ref: AVMOE/AVS/avs_scripts/
avs_s4/utils/utility.py:45-120): thresholded IoU with the all-background
special case, and the max-F-measure over a 255-threshold precision/recall
sweep (beta^2 = 0.3), skipping all-black ground truths.
Pure jax (jit-friendly) with numpy-facing wrappers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mask_iou(pred_logits: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """pred_logits, target: (N, H, W). Mean IoU; clips with empty GT score
    background-IoU over total pixels (ref :45-73)."""
    pred = (jax.nn.sigmoid(pred_logits) > 0.5).astype(jnp.int32)
    target = target.astype(jnp.int32)
    num_pixels = pred.shape[-1] * pred.shape[-2]
    no_obj = target.sum(axis=(1, 2)) == 0
    inter = (pred * target).sum(axis=(1, 2))
    union = jnp.maximum(pred, target).sum(axis=(1, 2))
    inter_no_obj = ((1 - target) * (1 - pred)).sum(axis=(1, 2))
    inter = jnp.where(no_obj, inter_no_obj, inter)
    union = jnp.where(no_obj, num_pixels, union)
    return (inter / (union + eps)).mean()


def eval_fmeasure(pred_logits: jax.Array, gt: jax.Array, pr_num: int = 255,
                  beta2: float = 0.3) -> jax.Array:
    """Max F-measure over pr_num thresholds, averaged over non-empty-GT images
    (ref :76-115). pred_logits, gt: (N, H, W)."""
    probs = jax.nn.sigmoid(pred_logits)
    ths = jnp.linspace(0.0, 1.0 - 1e-10, pr_num)

    def per_image(p, y):
        yp = (p[None] >= ths[:, None, None]).astype(jnp.float32)  # (pr, H, W)
        tp = (yp * y[None]).sum(axis=(1, 2))
        prec = tp / (yp.sum(axis=(1, 2)) + 1e-20)
        rec = tp / (y.sum() + 1e-20)
        f = (1 + beta2) * prec * rec / (beta2 * prec + rec)
        return jnp.nan_to_num(f)

    valid = gt.mean(axis=(1, 2)) > 0.0
    scores = jax.vmap(per_image)(probs, gt.astype(jnp.float32))  # (N, pr)
    n = jnp.maximum(valid.sum(), 1)
    mean_curve = (scores * valid[:, None]).sum(axis=0) / n
    return mean_curve.max()


def save_mask(pred_logits: np.ndarray, save_dir: str, names) -> None:
    """Binarize and save predicted masks as PNGs (ref :118-140)."""
    import os

    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    masks = (1 / (1 + np.exp(-np.asarray(pred_logits))) > 0.5).astype(np.uint8) * 255
    for m, name in zip(masks, names):
        Image.fromarray(m).save(os.path.join(save_dir, f"{name}.png"))
