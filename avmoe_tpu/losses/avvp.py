"""AVVP training loss (ref: AVMOE/AVVP/main.py:47-79):

  BCE(global_prob, weak labels) + BCE(audio probs, labels smoothed a=1.0)
  + BCE(visual probs, labels smoothed v=0.9) + CE(class-token logits, diag)
  + sum of router load-balance losses.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from avmoe_tpu.losses.classification import binary_cross_entropy, cross_entropy_with_logits


def avvp_loss(
    outputs: Dict,
    labels: jax.Array,          # (B, 25) weak multi-labels in {0,1}
    *,
    smooth_a: float = 0.0,      # a=1.0 in ref => no smoothing on audio
    smooth_v: float = 0.1,      # v=0.9 in ref => 0.1 smoothing on visual
    lb_weight: float = 1.0,
) -> Tuple[jax.Array, Dict]:
    eps = 1e-7
    global_prob = jnp.clip(outputs["global_prob"], eps, 1 - eps)
    a_prob = jnp.clip(outputs["a_prob"], eps, 1 - eps)
    v_prob = jnp.clip(outputs["v_prob"], eps, 1 - eps)

    pa = (1.0 - smooth_a) * labels + smooth_a * 0.5
    pv = (1.0 - smooth_v) * labels + smooth_v * 0.5

    loss_av = binary_cross_entropy(global_prob, labels)
    loss_a = binary_cross_entropy(a_prob, pa)
    loss_v = binary_cross_entropy(v_prob, pv)

    n_cls = outputs["aud_cls_logits"].shape[-1]
    diag = jnp.arange(n_cls)
    loss_cls_aud = cross_entropy_with_logits(outputs["aud_cls_logits"], diag)
    loss_cls_vis = cross_entropy_with_logits(outputs["vis_cls_logits"], diag)

    loss = loss_av + loss_a + loss_v + loss_cls_aud + loss_cls_vis
    aux = {
        "loss_av": loss_av, "loss_a": loss_a, "loss_v": loss_v,
        "loss_cls_aud": loss_cls_aud, "loss_cls_vis": loss_cls_vis,
    }
    lb = outputs["telemetry"]["lb_loss"]
    loss = loss + lb_weight * lb
    aux["loss_lb"] = lb
    return loss, aux
