"""AVE training loss: segment BCE + clip-level CE on event class + CAS CE.

ref: AVMOE/AVE/main_trans_v3.py:115-128 - from (B, T, C+1) one-hot labels
(background = last class) derive:
  labels_bce   (B, T)  any-foreground indicator per segment,
  labels_event (B,)    clip event class (max foreground argmax over time),
then  loss = BCE(is_event) + CE(event_logits) + CE(av_score).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from avmoe_tpu.losses.classification import (
    binary_cross_entropy_with_logits,
    cross_entropy_with_logits,
)


def ave_labels(labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, T, C+1) one-hot -> (labels_bce (B, T), labels_event (B,))."""
    fg = labels[..., :-1]
    labels_bce = fg.max(axis=-1)                    # (B, T)
    seg_cls = jnp.argmax(fg, axis=-1)               # (B, T); bg rows -> 0
    labels_event = seg_cls.max(axis=-1)             # (B,)
    return labels_bce, labels_event


def ave_loss(outputs: Dict, labels: jax.Array, lb_weight: float = 0.0) -> Tuple[jax.Array, Dict]:
    labels_bce, labels_event = ave_labels(labels)
    loss_is_event = binary_cross_entropy_with_logits(outputs["is_event_logits"], labels_bce)
    loss_event_class = cross_entropy_with_logits(outputs["event_logits"], labels_event)
    loss_cas = cross_entropy_with_logits(outputs["av_score"], labels_event)
    loss = loss_is_event + loss_event_class + loss_cas
    aux = {
        "loss_is_event": loss_is_event,
        "loss_event_class": loss_event_class,
        "loss_cas": loss_cas,
    }
    if lb_weight:
        lb = outputs["telemetry"]["lb_loss"]
        loss = loss + lb_weight * lb
        aux["loss_lb"] = lb
    return loss, aux
