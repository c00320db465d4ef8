"""AVE supervised accuracy (ref: AVMOE/AVE/main_trans_v3.py:356-372).

Per segment: predict background (class C) when sigmoid(is_event) <= 0.5,
else the clip-level argmax event class; accuracy over all B*T segments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ave_accuracy(
    is_event_logits: jax.Array,  # (B, T)
    event_logits: jax.Array,     # (B, C)
    labels: jax.Array,           # (B, T, C+1) one-hot, bg last
) -> jax.Array:
    num_classes = event_logits.shape[-1]
    targets = jnp.argmax(labels, axis=-1)                       # (B, T)
    is_event = jax.nn.sigmoid(is_event_logits) > 0.5            # (B, T)
    event_class = jnp.argmax(event_logits, axis=-1)             # (B,)
    pred = jnp.where(is_event, event_class[:, None], num_classes)
    return (pred == targets).mean() * 100.0
