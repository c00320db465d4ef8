"""GroupViT-style grouping heads for AVVP (MGN).

Re-creation of the reference's grouping stack (ref: AVMOE/AVVP/nets/
grouping.py): AttnBlock transformers over [tokens ; group-tokens], an
AssignAttention block with soft / hard(straight-through) / gumbel assignment,
and ModalityTrans which wires blocks + optional HAN cross-modal encoder +
grouping. Assignment softmax runs over the GROUP axis (dim=-2), then rows are
re-normalized over the token axis (grouping.py:120-150)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.ops.swin import DropPath, Mlp


def _scatter_one(zeros: jax.Array, idx: jax.Array, axis: int) -> jax.Array:
    iota = jax.lax.broadcasted_iota(jnp.int32, zeros.shape, zeros.ndim + axis if axis < 0 else axis)
    return jnp.where(iota == idx, 1.0, 0.0)


def gumbel_softmax(key: jax.Array, logits: jax.Array, tau: float = 1.0,
                   hard: bool = False, axis: int = -1) -> jax.Array:
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y = (logits + g) / tau
    y_soft = jax.nn.softmax(y, axis=axis)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = _scatter_one(jnp.zeros_like(logits), idx, axis % logits.ndim)
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft


class ProjAttention(nn.Module):
    """q/k/v-projected multi-head attention (grouping.py Attention)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, query, key=None, value=None, *, train: bool = False):
        if key is None:
            key = query
        if value is None:
            value = key
        B, N, C = query.shape
        H = self.num_heads
        D = C // H
        q = nn.Dense(C, use_bias=self.qkv_bias, name="q_proj")(query).reshape(B, N, H, D)
        k = nn.Dense(C, use_bias=self.qkv_bias, name="k_proj")(key).reshape(B, -1, H, D)
        v = nn.Dense(C, use_bias=self.qkv_bias, name="v_proj")(value).reshape(B, -1, H, D)
        attn = jnp.einsum("bnhd,bshd->bhns", q, k) * (D ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=dropout_det(train))(attn)
        out = jnp.einsum("bhns,bshd->bnhd", attn, v).reshape(B, N, C)
        out = nn.Dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=dropout_det(train))(out)


class AttnBlock(nn.Module):
    """Pre-norm self-attention transformer block (grouping.py AttnBlock)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dp = DropPath(self.drop_path)
        h = ProjAttention(self.dim, self.num_heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), train=train)
        x = x + dp(h, train=train)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), train=train)
        return x + dp(h, train=train)


class CrossAttnBlock(nn.Module):
    """Cross-attention block, post-norm variant (grouping.py CrossAttnBlock)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, query, key, *, train: bool = False):
        x = query + ProjAttention(self.dim, self.num_heads, name="attn")(
            query, key, train=train)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), train=train)
        return nn.LayerNorm(epsilon=1e-5, name="norm_post")(x)


class AssignAttention(nn.Module):
    """Token->group assignment attention (grouping.py:70-165).

    Softmax over groups (axis=-2), optional gumbel/hard (straight-through),
    then row-normalize over tokens. Returns (grouped, attn_dict)."""

    dim: int
    hard: bool = False
    gumbel: bool = False
    gumbel_tau: float = 1.0
    assign_eps: float = 1.0

    @nn.compact
    def __call__(self, query, key, *, train: bool = False, return_attn: bool = False):
        B, S2, C = query.shape
        q = nn.Dense(C, name="q_proj")(query)
        k = nn.Dense(C, name="k_proj")(key)
        v = nn.Dense(C, name="v_proj")(key)
        raw = jnp.einsum("bgc,btc->bgt", q, k) * (C ** -0.5)  # (B, groups, tokens)

        def assigned(logits):
            if self.gumbel and train:
                return gumbel_softmax(self.make_rng("gumbel"), logits,
                                      tau=self.gumbel_tau, hard=self.hard, axis=-2)
            if self.hard:
                y_soft = jax.nn.softmax(logits, axis=-2)
                idx = jnp.argmax(y_soft, axis=-2, keepdims=True)
                y_hard = _scatter_one(jnp.zeros_like(logits), idx, logits.ndim - 2)
                return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
            return jax.nn.softmax(logits, axis=-2)

        attn = assigned(raw)
        attn_dict: Optional[Dict[str, jax.Array]] = None
        if return_attn:
            soft = jax.nn.softmax(raw, axis=-2)
            attn_dict = {"hard": attn, "soft": 1.0 + jax.nn.softmax(soft, axis=-1)}
        attn = attn / (attn.sum(axis=-1, keepdims=True) + self.assign_eps)
        out = jnp.einsum("bgt,btc->bgc", attn, v)
        out = nn.Dense(C, name="proj")(out)
        return out, attn_dict


class GroupingBlock(nn.Module):
    """Group tokens + input tokens -> new group features (grouping.py:167-274)."""

    dim: int
    out_dim: int
    num_heads: int
    num_group_token: int
    num_output_group: int
    hard: bool = False
    gumbel: bool = False

    @nn.compact
    def __call__(self, x, group_tokens, *, train: bool = False, return_attn: bool = False):
        group_tokens = nn.LayerNorm(epsilon=1e-5, name="norm_tokens")(group_tokens)
        x = nn.LayerNorm(epsilon=1e-5, name="norm_x")(x)
        # project S1 group tokens -> S2 output groups (MLP over the token axis)
        g = group_tokens.transpose(0, 2, 1)
        g = Mlp(int(0.5 * self.dim), self.num_output_group, name="mlp_inter")(g)
        projected = nn.LayerNorm(epsilon=1e-5, name="norm_post_tokens")(g.transpose(0, 2, 1))
        projected = CrossAttnBlock(self.dim, self.num_heads, name="pre_assign_attn")(
            projected, x, train=train)
        new_x, attn_dict = AssignAttention(
            self.dim, hard=self.hard, gumbel=self.gumbel, name="assign",
        )(projected, x, train=train, return_attn=return_attn)
        new_x = new_x + projected
        reduced = new_x if self.dim == self.out_dim else nn.Dense(
            self.out_dim, use_bias=False, name="reduction_fc")(
                nn.LayerNorm(epsilon=1e-5, name="reduction_norm")(new_x))
        new_x = reduced + Mlp(int(4.0 * self.dim), self.out_dim, name="mlp_channels")(
            nn.LayerNorm(epsilon=1e-5, name="norm_new_x")(new_x), train=train)
        return new_x, attn_dict


class ModalityTrans(nn.Module):
    """Transformer + (optional HAN cross-modal block) + grouping
    (grouping.py:662-775). Input x (B, L, C), learnable class token set
    (S1, C) passed by the caller; returns (grouped (B, S2, C), attn_dict,
    pre-grouping tokens)."""

    dim: int
    depth: int
    num_heads: int = 8
    num_group_tokens: int = 25
    num_output_groups: int = 25
    hard_assignment: bool = False
    use_han: bool = False
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x, group_token, x_other=None, *, train: bool = False,
                 return_attn: bool = False):
        B = x.shape[0]
        # group_token: (S1, C) learnable class tokens OR (B, S1, C) features
        # (the cross-modal stage passes grouped visual features as group
        # tokens - ref: mgn.py:534 av_mcg(x1, x2))
        if group_token.ndim == 2:
            gt = jnp.broadcast_to(group_token[None], (B,) + group_token.shape)
        else:
            gt = group_token
        cat = jnp.concatenate([x, gt], axis=1)
        for i in range(self.depth):
            cat = AttnBlock(self.dim, self.num_heads, drop_path=self.drop_path,
                            name=f"block_{i}")(cat, train=train)
        x_attn = cat[:, : -self.num_group_tokens]
        gt = cat[:, -self.num_group_tokens:]

        if self.use_han and x_other is not None:
            # HAN: group x_attn using the OTHER modality's tokens as group
            # tokens (ref call: han_encoder(x_attn, x_other), grouping.py:758)
            x_attn, _ = GroupingBlock(
                dim=self.dim, out_dim=self.dim, num_heads=8,
                num_group_token=x_other.shape[1],
                num_output_group=x_other.shape[1],
                hard=not self.hard_assignment, gumbel=not self.hard_assignment,
                name="han_encoder",
            )(x_attn, x_other, train=train)

        out, attn_dict = GroupingBlock(
            dim=self.dim, out_dim=self.dim, num_heads=self.num_heads,
            num_group_token=self.num_group_tokens,
            num_output_group=self.num_output_groups,
            hard=self.hard_assignment, gumbel=self.hard_assignment,
            name="grouping",
        )(x_attn, gt, train=train, return_attn=return_attn)
        return out, attn_dict, x_attn
