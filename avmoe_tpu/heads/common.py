"""Vanilla post-norm transformer encoder/decoder stacks used by task heads.

Batch-first (B, T, C) re-creation of the reference's CMRAN-derived
Encoder/Decoder (ref: AVMOE/AVE/nets/models.py:14-160). The decoder's
signature quirk - keys/values are the concatenation of memory and target -
is preserved (models.py:147)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        det = dropout_det(train)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dropout_rate=self.dropout, deterministic=det,
            name="self_attn",
        )(x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + nn.Dropout(self.dropout, deterministic=det)(h))
        h = nn.Dense(self.dim_feedforward, name="ff1")(x)
        h = nn.Dropout(self.dropout, deterministic=det)(nn.relu(h))
        h = nn.Dense(self.d_model, name="ff2")(h)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + nn.Dropout(self.dropout, deterministic=det)(h))
        return x


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, *, train: bool = False):
        det = dropout_det(train)
        mem = jnp.concatenate([memory, tgt], axis=1)  # keys/values include target
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dropout_rate=self.dropout, deterministic=det,
            name="cross_attn",
        )(tgt, mem)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + nn.Dropout(self.dropout, deterministic=det)(h))
        h = nn.Dense(self.dim_feedforward, name="ff1")(tgt)
        h = nn.Dropout(self.dropout, deterministic=det)(nn.relu(h))
        h = nn.Dense(self.d_model, name="ff2")(h)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + nn.Dropout(self.dropout, deterministic=det)(h))
        return tgt


class TransformerEncoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                name=f"layer_{i}",
            )(x, train=train)
        return x


class TransformerDecoder(nn.Module):
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, *, train: bool = False):
        for i in range(self.num_layers):
            tgt = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                name=f"layer_{i}",
            )(tgt, memory, train=train)
        return tgt


class BiLSTM(nn.Module):
    """Single-layer bidirectional LSTM over (B, T, C) -> (B, T, 2*hidden)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, name="fwd_cell"))
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, name="bwd_cell"),
                     reverse=True, keep_order=True)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)
