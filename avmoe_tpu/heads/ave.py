"""AVE task head: temporal attention + CMBS localization.

Batch-first re-creation of the reference head stack
(ref: AVMOE/AVE/nets/net_trans_v3.py:42-293):

  TemporalAttention - Bi-LSTMs per modality, intra-modal transformer encoders,
  cross-modal decoders (query = own modality, memory = other), sigmoid gates.
  CMBS - per-segment CAS scores with top-k mean pooling, supervised localize
  module, optional audio-video interaction blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.heads.common import BiLSTM, TransformerDecoder, TransformerEncoder


class TemporalAttention(nn.Module):
    """(B, T, C_v), (B, T, 768) -> gated (B, T, d_model) per modality
    (ref: net_trans_v3.py:180-253)."""

    video_input_dim: int = 1536   # swin-v2-large pooled features
    audio_input_dim: int = 768    # htsat pooled features
    d_model: int = 256
    video_fc_dim: int = 512
    audio_fc_dim: int = 128
    gamma: float = 0.1

    @nn.compact
    def __call__(self, visual, audio, *, train: bool = False):
        det = dropout_det(train)
        audio = nn.Dense(self.audio_fc_dim, name="a_fc")(audio)
        visual = nn.Dense(self.video_fc_dim, name="v_fc")(visual)
        visual = nn.Dropout(0.2, deterministic=det)(nn.relu(visual))

        audio_rnn = BiLSTM(self.d_model // 2, name="audio_rnn")(audio)  # (B,T,256)
        visual_rnn = BiLSTM(self.d_model, name="visual_rnn")(visual)    # (B,T,512)

        # intra-modal encoders (key/value features)
        video_kv = nn.Dense(self.d_model, name="video_enc_affine")(visual_rnn)
        video_kv = TransformerEncoder(self.d_model, 4, 2, 1024, name="video_encoder")(
            video_kv, train=train)
        audio_kv = nn.Dense(self.d_model, name="audio_enc_affine")(audio_rnn)
        audio_kv = TransformerEncoder(self.d_model, 4, 2, 1024, name="audio_encoder")(
            audio_kv, train=train)

        # cross-modal decoders (query = own modality, memory = other's kv)
        audio_q = nn.Dense(self.d_model, name="audio_dec_affine")(audio_rnn)
        audio_q = TransformerDecoder(self.d_model, 4, 1, 1024, name="audio_decoder")(
            audio_q, video_kv, train=train)
        video_q = nn.Dense(self.d_model, name="video_dec_affine")(visual_rnn)
        video_q = TransformerDecoder(self.d_model, 4, 1, 1024, name="video_decoder")(
            video_q, audio_kv, train=train)

        audio_gate = nn.sigmoid(nn.Dense(1, name="audio_gated")(audio_kv))
        video_gate = nn.sigmoid(nn.Dense(1, name="video_gated")(video_kv))
        av_gate = audio_gate * video_gate

        video_q = video_q + audio_gate * video_q * self.gamma
        audio_q = audio_q + video_gate * audio_q * self.gamma
        return video_q, audio_q, av_gate


class WeaklyLocalizationModule(nn.Module):
    """Weakly-supervised localization head (ref: net_trans_v3.py:138-160):
    per-segment event scores gate clip-level class logits, max-pooled over
    time into softmax event scores."""

    num_classes: int = 28

    @nn.compact
    def __call__(self, fused: jax.Array):
        """fused (B, T, C) -> (is_event (B, T), raw_logits (B, cls+1),
        event_scores (B, cls+1))."""
        is_event = nn.Dense(1, name="classifier")(fused)[..., 0]     # (B, T)
        pooled = fused.max(axis=1)
        raw_logits = nn.Dense(self.num_classes + 1, name="event_classifier")(pooled)
        fused_logits = jax.nn.sigmoid(is_event)[..., None] * raw_logits[:, None]
        logits = fused_logits.max(axis=1)
        return is_event, raw_logits, jax.nn.softmax(logits, axis=-1)


class AudioVideoInter(nn.Module):
    """Optional CMBS interaction block (ref: net_trans_v3.py:163-177)."""

    d_model: int
    n_head: int = 4

    @nn.compact
    def __call__(self, video, audio, *, train: bool = False):
        det = dropout_det(train)
        global_feat = video * audio
        memory = jnp.concatenate([audio, video], axis=1)
        mid = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, dropout_rate=0.2, deterministic=det, name="mha",
        )(global_feat, memory)
        return nn.LayerNorm(epsilon=1e-5, name="norm1")(
            global_feat + nn.Dropout(0.1, deterministic=det)(mid))


class CMBSHead(nn.Module):
    """CAS top-k scoring + supervised localization (ref: net_trans_v3.py:113-135,
    256-293). Inputs are (B, T, d_model); returns
    (is_event_logits (B, T), event_logits (B, n_cls), av_score (B, n_cls))."""

    num_classes: int = 28
    d_model: int = 256
    topk: int = 4
    gamma: float = 0.3
    inter: bool = False

    @nn.compact
    def __call__(self, visual, audio, *, train: bool = False):
        video_cas = nn.Dense(self.num_classes, name="video_cas")(visual)  # (B,T,cls)
        audio_cas = nn.Dense(self.num_classes, name="audio_cas")(audio)
        k = min(self.topk, video_cas.shape[1])
        score_video = jax.lax.top_k(video_cas.transpose(0, 2, 1), k)[0].mean(-1)  # (B,cls)
        score_audio = jax.lax.top_k(audio_cas.transpose(0, 2, 1), k)[0].mean(-1)
        av_score = (score_video + score_audio) / 2.0

        if self.inter:
            v2 = AudioVideoInter(self.d_model, name="av_inter")(visual, audio, train=train)
            a2 = AudioVideoInter(self.d_model, name="va_inter")(audio, visual, train=train)
            visual, audio = v2, a2

        fused = (visual + audio) / 2.0
        is_event_logits = nn.Dense(1, name="classifier")(fused)[..., 0]  # (B, T)
        pooled = fused.max(axis=1)  # max over time
        event_logits = nn.Dense(self.num_classes, name="event_classifier")(pooled)
        event_logits = event_logits + self.gamma * av_score
        return is_event_logits, event_logits, av_score
