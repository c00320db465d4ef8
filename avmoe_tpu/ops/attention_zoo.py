"""Attention library for parity with the AVVP attention zoo
(ref: AVMOE/AVVP/nets/attentions.py:10-226 - ScaledDotProduct / Additive /
LocationAware scoring + multi-head wrappers; a utility library, mostly unused
by MGN but part of the reference's public surface)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ScaledDotProductAttention(nn.Module):
    """softmax(Q K^T / sqrt(d)) V."""

    @nn.compact
    def __call__(self, query, key, value, mask: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        d = query.shape[-1]
        score = jnp.einsum("bqd,bkd->bqk", query, key) / jnp.sqrt(d)
        if mask is not None:
            score = jnp.where(mask, score, -1e9)
        attn = jax.nn.softmax(score, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", attn, value), attn


class AdditiveAttention(nn.Module):
    """Bahdanau scoring: v^T tanh(W_q q + W_k k + b)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, query, key, value) -> Tuple[jax.Array, jax.Array]:
        q = nn.Dense(self.hidden_dim, use_bias=False, name="query_proj")(query)
        k = nn.Dense(self.hidden_dim, use_bias=False, name="key_proj")(key)
        bias = self.param("bias", nn.initializers.uniform(0.1), (self.hidden_dim,))
        score = nn.Dense(1, name="score_proj")(
            jnp.tanh(q[:, :, None] + k[:, None, :] + bias))[..., 0]
        attn = jax.nn.softmax(score, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", attn, value), attn


class LocationAwareAttention(nn.Module):
    """Location-sensitive attention (Chorowski et al.): adds a conv over the
    previous alignment to the additive score."""

    hidden_dim: int
    conv_out_channel: int = 10
    smoothing: bool = False

    @nn.compact
    def __call__(self, query, value, last_attn: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        B, k_len = value.shape[0], value.shape[1]
        if last_attn is None:
            last_attn = jnp.zeros((B, k_len))
        conv_attn = nn.Conv(self.conv_out_channel, (3,), padding=1,
                            name="loc_conv")(last_attn[..., None])
        q = nn.Dense(self.hidden_dim, use_bias=False, name="query_proj")(query)
        v = nn.Dense(self.hidden_dim, use_bias=False, name="value_proj")(value)
        l = nn.Dense(self.hidden_dim, use_bias=False, name="loc_proj")(conv_attn)
        bias = self.param("bias", nn.initializers.uniform(0.1), (self.hidden_dim,))
        score = nn.Dense(1, use_bias=True, name="score_proj")(
            jnp.tanh(q[:, None] + v + l + bias))[..., 0]
        if self.smoothing:
            s = jax.nn.sigmoid(score)
            attn = s / s.sum(axis=-1, keepdims=True)
        else:
            attn = jax.nn.softmax(score, axis=-1)
        context = jnp.einsum("bk,bkd->bd", attn, value)
        return context, attn


class MultiHeadAttention(nn.Module):
    """Generic q/k/v-projected MHA returning (context, attn)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, query, key, value) -> Tuple[jax.Array, jax.Array]:
        B, Q, _ = query.shape
        H, D = self.num_heads, self.dim // self.num_heads
        q = nn.Dense(self.dim, name="query_proj")(query).reshape(B, Q, H, D)
        k = nn.Dense(self.dim, name="key_proj")(key).reshape(B, -1, H, D)
        v = nn.Dense(self.dim, name="value_proj")(value).reshape(B, -1, H, D)
        score = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(D)
        attn = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Q, self.dim)
        return ctx, attn
