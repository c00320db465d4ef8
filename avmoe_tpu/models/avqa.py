"""AVQA: audio-visual question answering fusion model.

Re-creation of the reference's AVQA_Fusion_Net (ref: AVMOE/AVQA/net_grd_avst/
net_avst_v2.py:419-833): lock-step backbones + MoE adapters over the positive
frames; negative frames through the FROZEN vision backbone (stop-gradient);
LSTM question encoder; audio->visual spatial grounding with pos/neg matching
heads; question-as-query cross-attention fusion -> answer logits.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.config import AVQAConfig
from avmoe_tpu.moe.injection import LockstepEncoder


class QstEncoder(nn.Module):
    """Embedding + LSTM question encoder (ref: net_avst_v2.py:419-440):
    concat(last hidden, last cell) -> fc -> tanh'd question feature."""

    vocab: int
    word_embed: int
    hidden: int
    embed_size: int

    @nn.compact
    def __call__(self, question: jax.Array) -> jax.Array:  # (B, L) int tokens
        emb = nn.Embed(self.vocab, self.word_embed, name="word2vec")(question)
        emb = jnp.tanh(emb)
        cell = nn.OptimizedLSTMCell(self.hidden, name="lstm")
        rnn = nn.RNN(cell, return_carry=True, name="rnn")
        (carry_c, carry_h), _ = rnn(emb)
        qst = jnp.concatenate([carry_h, carry_c], axis=-1)  # (B, 2*hidden)
        qst = jnp.tanh(qst)
        return nn.Dense(self.embed_size, name="fc")(qst)


class _QueryAttentionFFN(nn.Module):
    """Question-as-query MHA + FFN + LayerNorm (ref: net_avst_v2.py:804-822)."""

    dim: int

    @nn.compact
    def __call__(self, q, kv, *, train: bool = False):
        det = dropout_det(train)
        att = nn.MultiHeadDotProductAttention(
            num_heads=4, dropout_rate=0.1, deterministic=det, name="attn",
        )(q[:, None, :], kv)[:, 0]
        src = nn.Dense(self.dim, name="linear1")(att)
        src = nn.Dense(self.dim, name="linear2")(
            nn.Dropout(0.1, deterministic=det)(nn.relu(src)))
        att = att + nn.Dropout(0.1, deterministic=det)(src)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(att)


class AVQAFusionModel(nn.Module):
    cfg: AVQAConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.d_feat
        self.encoder = LockstepEncoder(
            c.swin, c.htsat, c.moe, c.injection, dtype=self.dtype, name="encoder")
        self.fc_a1 = nn.Dense(d, name="fc_a1")
        self.fc_a2 = nn.Dense(d, name="fc_a2")
        self.fc_gl = nn.Dense(d, name="fc_gl")
        self.fc_fusion = nn.Dense(d, name="fc_fusion")
        self.match_mlp = [
            nn.Dense(512, name="fc1"), nn.Dense(256, name="fc2"),
            nn.Dense(128, name="fc3"), nn.Dense(2, name="fc4"),
        ]
        self.question_encoder = QstEncoder(
            c.qst_vocab, c.word_embed, c.qst_hidden, d, name="question_encoder")
        self.attn_v = _QueryAttentionFFN(d, name="attn_v")
        self.attn_a = _QueryAttentionFFN(d, name="attn_a")
        self.fc_ans = nn.Dense(c.fc_class, name="fc_ans")

    def _ground(self, audio_feat: jax.Array, grid: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Audio-guided spatial grounding (ref: net_avst_v2.py:752-770).

        audio_feat (B', C); grid (B', HW, C) -> (grounded feat (B', C), match in)
        """
        before = grid.mean(axis=1)  # avgpool over positions
        v = grid / jnp.maximum(
            jnp.linalg.norm(grid, axis=-1, keepdims=True), 1e-12)
        a = audio_feat / jnp.maximum(
            jnp.linalg.norm(audio_feat, axis=-1, keepdims=True), 1e-12)
        att = jax.nn.softmax(jnp.einsum("bpc,bc->bp", v, a), axis=-1)
        after = jnp.einsum("bp,bpc->bc", att, v)
        grd = jnp.tanh(jnp.concatenate([before, after], axis=-1))
        return self.fc_gl(grd)

    def _match(self, audio_feat: jax.Array, visual_grd: jax.Array) -> jax.Array:
        feat = jnp.concatenate([audio_feat, visual_grd], axis=-1)
        for i, layer in enumerate(self.match_mlp):
            feat = layer(feat)
            if i < len(self.match_mlp) - 1:
                feat = nn.relu(feat)
        return feat  # (B', 2)

    def __call__(
        self,
        wave: jax.Array,          # (B, T, L)
        visual_posi: jax.Array,   # (B, T, H, W, 3)
        visual_nega: jax.Array,   # (B, T, H, W, 3)
        question: jax.Array,      # (B, Lq) int32
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> Dict:
        c = self.cfg
        B, T = wave.shape[0], wave.shape[1]

        # positive frames through the adapter-injected lock-step encoder;
        # keep the final visual token GRID (pre-pooling) for grounding
        f_v_grid, f_a_tokens, telemetry = self.encoder.forward_tokens(
            wave.reshape(B * T, -1),
            visual_posi.reshape((B * T,) + visual_posi.shape[2:]),
            train=train, mixup_lambda=mixup_lambda,
        )
        f_a = f_a_tokens.mean(axis=1)  # (B*T, 768)
        # negative frames: frozen backbone only, no gradient (ref :709-712)
        f_v_nega = jax.lax.stop_gradient(
            self.encoder.swin.forward_features(
                self.encoder.swin.embed(
                    visual_nega.reshape((B * T,) + visual_nega.shape[2:])),
                train=False))

        audio = f_a.reshape(B, T, -1)                          # (B, T, 768)
        audio_feat = self.fc_a2(nn.relu(self.fc_a1(audio)))    # (B, T, d)
        audio_feat_pure = audio_feat
        audio_flat = audio_feat.reshape(B * T, -1)

        visual_grd_posi = self._ground(audio_flat, f_v_grid)
        visual_grd_nega = self._ground(audio_flat, f_v_nega)
        out_match_posi = self._match(audio_flat, visual_grd_posi)
        out_match_nega = self._match(audio_flat, visual_grd_nega)

        qst = self.question_encoder(question)                  # (B, d)
        v_seq = visual_grd_posi.reshape(B, T, -1)
        a_seq = audio_feat_pure

        v_att = self.attn_v(qst, v_seq, train=train)
        a_att = self.attn_a(qst, a_seq, train=train)
        feat = jnp.concatenate(
            [a_att + a_seq.mean(axis=1), v_att + v_seq.mean(axis=1)], axis=-1)
        feat = self.fc_fusion(jnp.tanh(feat))
        combined = jnp.tanh(feat * qst)
        out_qa = self.fc_ans(combined)                         # (B, fc_class)

        return {
            "qa_logits": out_qa,
            "match_posi": out_match_posi,  # (B*T, 2)
            "match_nega": out_match_nega,
            "telemetry": telemetry,
        }


def make_avqa_loss_fn(model: AVQAFusionModel, match_weight: float = 0.5):
    """CE(answer) + 0.5 * CE(posi/nega match) (ref: main_avst_v2.py:105-107)."""
    import optax

    def loss_fn(variables, batch, rngs):
        mixup_lambda = batch.get("mixup_lambda")
        if mixup_lambda is None and "mixup" in rngs:
            B, T = batch["wave"].shape[0], batch["wave"].shape[1]
            mixup_lambda = jax.random.beta(
                rngs["mixup"], 0.5, 0.5, (B * T,)).astype(jnp.float32)
        rngs = {k: v for k, v in rngs.items() if k != "mixup"}
        out, upd = model.apply(
            variables, batch["wave"], batch["visual_posi"], batch["visual_nega"],
            batch["question"], train=True,
            mixup_lambda=mixup_lambda,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss_qa = optax.softmax_cross_entropy_with_integer_labels(
            out["qa_logits"], batch["answer"]).mean()
        match_logits = jnp.concatenate([out["match_posi"], out["match_nega"]], axis=0)
        match_labels = jnp.concatenate([
            jnp.ones(out["match_posi"].shape[0], jnp.int32),
            jnp.zeros(out["match_nega"].shape[0], jnp.int32)])
        loss_match = optax.softmax_cross_entropy_with_integer_labels(
            match_logits, match_labels).mean()
        loss = loss_qa + match_weight * loss_match
        acc = (jnp.argmax(out["qa_logits"][:, : model.cfg.answer_vocab], -1)
               == batch["answer"]).mean() * 100.0
        return loss, ({"loss_qa": loss_qa, "loss_match": loss_match,
                       "accuracy": acc}, upd["batch_stats"])

    return loss_fn
