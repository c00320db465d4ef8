"""AVE: audio-visual event localization model (the framework's flagship).

Dual frozen backbones in lock-step with MoE adapters, temporal attention and
the CMBS localization head (ref: AVMOE/AVE/nets/net_trans_v3.py:489-762).

Inputs (batch-first, channels-last):
  wave   (B, T, L)          raw waveform segments (T=10 x 1s @ 32kHz)
  images (B, T, H, W, 3)    normalized RGB frames (192x192)

Outputs a dict:
  is_event_logits (B, T)    per-segment event-vs-background logits
  event_logits    (B, cls)  clip-level event class logits
  av_score        (B, cls)  CAS top-k audio-visual score
  telemetry       {...}     per-site expert gating probs + lb loss
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.config import AVEConfig
from avmoe_tpu.heads.ave import CMBSHead, TemporalAttention
from avmoe_tpu.moe.injection import LockstepEncoder


class AVEModel(nn.Module):
    cfg: AVEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = LockstepEncoder(
            c.swin, c.htsat, c.moe, c.injection, dtype=self.dtype, name="encoder"
        )
        if c.is_cmbs:
            if c.is_temporal_att:
                self.temporal_attn = TemporalAttention(
                    video_input_dim=c.swin.num_features,
                    audio_input_dim=c.htsat.num_features,
                    d_model=c.d_model,
                    name="temporal_attn",
                )
            else:
                self.v_fc = nn.Dense(c.d_model, name="v_fc")
                self.a_fc = nn.Dense(c.d_model, name="a_fc")
            self.cmbs = CMBSHead(
                num_classes=c.num_classes, d_model=c.d_model,
                inter=c.is_inter_in_cmbs, name="cmbs",
            )
        else:
            self.mlp_class = nn.Dense(512, name="mlp_class")
            self.mlp_class_2 = nn.Dense(c.num_classes + 1, name="mlp_class_2")

    def __call__(
        self,
        wave: jax.Array,
        images: jax.Array,
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> Dict:
        c = self.cfg
        B, T = wave.shape[0], wave.shape[1]
        wave_flat = wave.reshape(B * T, -1)
        img_flat = images.reshape((B * T,) + images.shape[2:])

        f_v, f_a, telemetry = self.encoder(
            wave_flat, img_flat, train=train, mixup_lambda=mixup_lambda
        )
        f_v = f_v.reshape(B, T, -1)
        f_a = f_a.reshape(B, T, -1)

        if c.is_cmbs:
            if c.is_temporal_att:
                visual, audio, av_gate = self.temporal_attn(f_v, f_a, train=train)
            else:
                visual = nn.Dropout(0.1, deterministic=dropout_det(train))(nn.relu(self.v_fc(f_v)))
                audio = nn.Dropout(0.1, deterministic=dropout_det(train))(nn.relu(self.a_fc(f_a)))
            is_event_logits, event_logits, av_score = self.cmbs(visual, audio, train=train)
            return {
                "is_event_logits": is_event_logits,
                "event_logits": event_logits,
                "av_score": av_score,
                "telemetry": telemetry,
            }
        # simple classification path (ref: net_trans_v3.py:750-759)
        out = jnp.concatenate([f_v, f_a], axis=-1).reshape(B * T, -1)
        probs = jax.nn.softmax(self.mlp_class_2(self.mlp_class(out)), axis=-1)
        return {"segment_probs": probs.reshape(B, T, -1), "telemetry": telemetry}


def make_ave_loss_fn(model: AVEModel, lb_weight: float = 0.0,
                     mixup_alpha: float = 0.5):
    """Loss closure for make_train_step: BCE + 2xCE (+optional LB)
    with accuracy as an aux metric.

    Spectrogram mixup lambdas are drawn per frame from Beta(alpha, alpha)
    (ref: main_trans_v3.py:104 uses get_mix_lambda(0.5, B*10) for the
    audioset backbone); pass mixup_alpha=0 to disable."""
    from avmoe_tpu.losses.ave import ave_loss
    from avmoe_tpu.metrics.ave import ave_accuracy

    def loss_fn(variables, batch, rngs):
        mixup_lambda = batch.get("mixup_lambda")
        if mixup_lambda is None and mixup_alpha > 0 and "mixup" in rngs:
            B, T = batch["wave"].shape[0], batch["wave"].shape[1]
            mixup_lambda = jax.random.beta(
                rngs["mixup"], mixup_alpha, mixup_alpha, (B * T,)
            ).astype(jnp.float32)
        model_rngs = {k: v for k, v in rngs.items() if k != "mixup"}
        out, upd = model.apply(
            variables,
            batch["wave"],
            batch["images"],
            train=True,
            mixup_lambda=mixup_lambda,
            rngs=model_rngs,
            mutable=["batch_stats"],
        )
        loss, aux = ave_loss(out, batch["labels"], lb_weight)
        aux["accuracy"] = ave_accuracy(
            out["is_event_logits"], out["event_logits"], batch["labels"]
        )
        return loss, (aux, upd["batch_stats"])

    return loss_fn


def make_ave_eval_fn(model: AVEModel):
    """Eval closure: accuracy + telemetry for the expert-usage tracker."""
    from avmoe_tpu.metrics.ave import ave_accuracy

    def eval_fn(variables, batch):
        out = model.apply(variables, batch["wave"], batch["images"], train=False)
        return {
            "accuracy": ave_accuracy(
                out["is_event_logits"], out["event_logits"], batch["labels"]
            ),
            "telemetry": out["telemetry"],
        }

    return eval_fn
