"""AVVP: weakly-supervised audio-visual video parsing (MGN) model.

Dual lock-step backbones + MoE adapters in every stage, then class-aware
grouping heads (ref: AVMOE/AVVP/nets/mgn.py:227-559):

  f_a -> fc_a --------------------------------+
  f_v -> fc_v  ┐                              |
  video_st -> fc_st ┴-> concat -> fc_fusion -> visual grouping (25 tokens)
  audio grouping (HAN vs visual) -> cross-modal AV grouping -> probs

Unlike the reference, grouping runs per-clip over the T=10 segment axis
(the reference flattens the whole batch into one sequence - comment at
mgn.py:518 says [B, 10, C]; we implement the documented intent, not the
batch-mixing artifact - SURVEY.md §3.5 'bugs to not copy').

Outputs: aud/vis class-token logits (25, 25), global/audio/visual event
probs (B, 25), per-segment frame probs (B, 10, 25), telemetry w/ LB loss.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.config import AVVPConfig
from avmoe_tpu.heads.grouping import ModalityTrans
from avmoe_tpu.moe.injection import LockstepEncoder


class MGNModel(nn.Module):
    cfg: AVVPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.dim
        self.encoder = LockstepEncoder(
            c.swin, c.htsat, c.moe, c.injection, dtype=self.dtype, name="encoder"
        )
        self.fc_a = nn.Dense(d, name="fc_a")
        self.fc_v = nn.Dense(d, name="fc_v")
        self.fc_st = nn.Dense(d, name="fc_st")
        self.fc_fusion = nn.Dense(d, name="fc_fusion")

        self.audio_token = self.param(
            "audio_token", nn.initializers.zeros, (c.num_classes, d))
        self.visual_token = self.param(
            "visual_token", nn.initializers.zeros, (c.num_classes, d))

        hard = c.unimodal_assign == "hard"
        hard_cross = c.crossmodal_assign == "hard"
        self.audio_cug = ModalityTrans(
            d, depth=c.depth_aud, num_heads=8, num_group_tokens=c.num_classes,
            num_output_groups=c.num_classes, hard_assignment=hard, use_han=True,
            name="audio_cug")
        self.visual_cug = ModalityTrans(
            d, depth=c.depth_vis, num_heads=8, num_group_tokens=c.num_classes,
            num_output_groups=c.num_classes, hard_assignment=hard, use_han=False,
            name="visual_cug")
        self.av_mcg = ModalityTrans(
            d, depth=c.depth_av, num_heads=8, num_group_tokens=c.num_classes,
            num_output_groups=c.num_classes, hard_assignment=hard_cross,
            use_han=False, name="av_mcg")

        self.fc_prob = nn.Dense(1, name="fc_prob")
        self.fc_prob_a = nn.Dense(1, name="fc_prob_a")
        self.fc_prob_v = nn.Dense(1, name="fc_prob_v")
        self.fc_cls = nn.Dense(c.num_classes, name="fc_cls")

    def __call__(
        self,
        wave: jax.Array,        # (B, T, L)
        images: jax.Array,      # (B, T, H, W, 3)
        video_st: jax.Array,    # (B, T, 512) r2plus1d features
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> Dict:
        c = self.cfg
        B, T = wave.shape[0], wave.shape[1]
        f_v, f_a, telemetry = self.encoder(
            wave.reshape(B * T, -1),
            images.reshape((B * T,) + images.shape[2:]),
            train=train,
            mixup_lambda=mixup_lambda,
        )
        f_v = f_v.reshape(B, T, -1)
        f_a = f_a.reshape(B, T, -1)

        x1_0 = self.fc_a(f_a)                                   # (B, T, d)
        x2_0 = self.fc_fusion(
            jnp.concatenate([self.fc_v(f_v), self.fc_st(video_st)], axis=-1))

        x2, attn_vis, _ = self.visual_cug(
            x2_0, self.visual_token, train=train, return_attn=True)
        x1, attn_aud, _ = self.audio_cug(
            x1_0, self.audio_token, x_other=x2_0, train=train, return_attn=True)
        x, _, _ = self.av_mcg(x1, x2, train=train, return_attn=True)

        global_prob = nn.sigmoid(self.fc_prob(x))[..., 0]       # (B, 25)
        aud_cls_logits = self.fc_cls(self.audio_token)          # (25, 25)
        vis_cls_logits = self.fc_cls(self.visual_token)

        # soft assignment maps: (B, groups=25, segments=T)
        attn_a = attn_aud[c.unimodal_assign][:, :, :T]
        attn_v = attn_vis[c.unimodal_assign][:, :, :T]

        a_prob_tok = nn.sigmoid(self.fc_prob_a(x1))             # (B, 25, 1)
        a_frame_prob = (a_prob_tok * attn_a).transpose(0, 2, 1)  # (B, T, 25)
        a_prob = a_prob_tok[..., 0]                             # (B, 25)

        v_prob_tok = nn.sigmoid(self.fc_prob_v(x2))
        v_frame_prob = (v_prob_tok * attn_v).transpose(0, 2, 1)
        v_prob = v_prob_tok[..., 0]

        return {
            "aud_cls_logits": aud_cls_logits,
            "vis_cls_logits": vis_cls_logits,
            "global_prob": global_prob,
            "a_prob": a_prob,
            "v_prob": v_prob,
            "a_frame_prob": a_frame_prob,
            "v_frame_prob": v_frame_prob,
            "telemetry": telemetry,
        }


def make_avvp_loss_fn(model: MGNModel, lb_weight: float = 1.0):
    from avmoe_tpu.losses.avvp import avvp_loss

    def loss_fn(variables, batch, rngs):
        mixup_lambda = batch.get("mixup_lambda")
        if mixup_lambda is None and "mixup" in rngs:
            B, T = batch["wave"].shape[0], batch["wave"].shape[1]
            mixup_lambda = jax.random.beta(
                rngs["mixup"], 0.5, 0.5, (B * T,)).astype(jnp.float32)
        rngs = {k: v for k, v in rngs.items() if k != "mixup"}
        out, upd = model.apply(
            variables, batch["wave"], batch["images"], batch["video_st"],
            train=True, mixup_lambda=mixup_lambda,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss, aux = avvp_loss(out, batch["labels"], lb_weight=lb_weight)
        return loss, (aux, upd["batch_stats"])

    return loss_fn
