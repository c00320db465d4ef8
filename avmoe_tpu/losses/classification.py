"""Shared classification losses (BCE / CE / label smoothing)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def binary_cross_entropy_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean sigmoid BCE (== torch BCEWithLogitsLoss default reduction)."""
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def cross_entropy_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax CE with integer labels (== torch CrossEntropyLoss)."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def binary_cross_entropy(probs: jax.Array, targets: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Mean BCE on probabilities (== torch BCELoss)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p)).mean()


def label_smoothed_bce(probs: jax.Array, targets: jax.Array, smooth: float) -> jax.Array:
    """BCE on probabilities with AVVP-style label clamping
    (ref: AVMOE/AVVP/main.py:51-55 uses v = (1 - a) * v + a / 2 smoothing)."""
    t = (1.0 - smooth) * targets + smooth / 2.0
    return binary_cross_entropy(probs, t)


def asymmetric_loss(
    probs: jax.Array,
    targets: jax.Array,
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
    eps: float = 1e-8,
) -> jax.Array:
    """Asymmetric multi-label loss (ref: AVMOE/AVE/nets/utils.py:25-72,
    Ben-Baruch et al.). Takes PROBABILITIES (the reference comments out its
    own sigmoid). Negative probabilities are margin-shifted by `clip` and
    down-weighted with a higher focusing exponent; the focal weight is
    computed with the clip-shifted negative probability and does not carry
    gradients (reference wraps it in torch.set_grad_enabled(False))."""
    p = probs
    p_neg = jnp.clip(1.0 - p + clip, max=1.0)
    loss_pos = targets * jnp.log(jnp.clip(p, min=eps))
    loss_neg = (1.0 - targets) * jnp.log(jnp.clip(p_neg, min=eps))
    pt = p * targets + p_neg * (1.0 - targets)
    gamma = gamma_pos * targets + gamma_neg * (1.0 - targets)
    focus = jax.lax.stop_gradient(jnp.power(1.0 - pt, gamma))
    return -(focus * (loss_pos + loss_neg)).mean()
