"""AVS: audio-visual sound-source segmentation (S4 / MS3), TPU-native.

Re-creation of the reference's v2 Pred_endecoder (ref: AVMOE/AVS/avs_scripts/
avs_s4/model/PVT_AVSModel_v2.py:585-955; ms3 variant :772-1139):

  images (B, T, 224, 224, 3) --bicubic-> 192 --> lock-step Swin-V2-L + HTS-AT
  with MoE adapters (noisy router, LB loss), capturing each stage's token map
  BEFORE downsampling -> per-stage Dense to `channel` + bicubic to the
  {56,28,14,7} pyramid -> 4-scale temporal attention -> TPAVI non-local
  audio-visual attention per stage -> FPN fusion -> mask logits (B*T, 224, 224).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.config import AVSConfig
from avmoe_tpu.heads.avs import (
    FeatureFusionBlock,
    MultiScaleTemporalAttention,
    TPAVIModule,
    resize_bicubic,
    resize_bilinear,
)
from avmoe_tpu.moe.injection import LockstepEncoder, pair_stage_blocks


class AVSModel(nn.Module):
    cfg: AVSConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = LockstepEncoder(
            c.swin, c.htsat, c.moe, c.injection, dtype=self.dtype, name="encoder")
        n_stages = len(c.swin.depths)
        self.stage_proj = [
            nn.Dense(c.channel, name=f"stage_proj_{i}") for i in range(n_stages)]
        self.audio_linear = nn.Dense(128, name="audio_linear")
        self.temporal_attn = MultiScaleTemporalAttention(
            d_model=c.channel, num_segments=c.num_segments,
            gamma=c.temporal_gamma, name="temporal_attn")
        self.tpavi = {
            i: TPAVIModule(in_channels=c.channel, name=f"tpavi_b{i + 1}")
            for i in c.tpavi_stages
        }
        self.paths = [FeatureFusionBlock(c.channel, name=f"path_{i}") for i in range(4)]
        self.out_conv1 = nn.Conv(128, (3, 3), padding=1, name="out_conv1")
        self.out_conv2 = nn.Conv(32, (3, 3), padding=1, name="out_conv2")
        self.out_conv3 = nn.Conv(1, (1, 1), name="out_conv3")

    def __call__(
        self,
        images: jax.Array,   # (B, T, H, W, 3) at dataset resolution (224)
        wave: jax.Array,     # (B, T, L)
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> Dict:
        c = self.cfg
        B, T = images.shape[0], images.shape[1]
        imgs = images.reshape((B * T,) + images.shape[2:])
        if imgs.shape[1] != c.swin.img_size:
            imgs = resize_bicubic(imgs, c.swin.img_size, c.swin.img_size)

        _, f_a, telemetry = self.encoder.forward_tokens(
            wave.reshape(B * T, -1), imgs, train=train,
            mixup_lambda=mixup_lambda, collect_stages=True)
        multi_scale = telemetry.pop("stage_tokens")

        audio_feature = self.audio_linear(
            f_a.mean(axis=1).reshape(B, T, -1))  # (B, T, 128)

        maps = []
        res0 = c.swin.patches_resolution[0]
        for i, tokens in enumerate(multi_scale):
            r = res0 // 2**i
            grid = self.stage_proj[i](tokens).reshape(-1, r, r, c.channel)
            maps.append(resize_bicubic(grid, c.pyramid_sizes[i], c.pyramid_sizes[i]))

        maps, audio_flat = self.temporal_attn(maps, audio_feature, train=train)

        a_fea_list: List[Optional[jax.Array]] = [None] * 4
        audio_seq = audio_flat.reshape(B, T, -1)
        for i in c.tpavi_stages:
            h, w = maps[i].shape[1], maps[i].shape[2]
            x5 = maps[i].reshape(B, T, h, w, c.channel)
            feats = jnp.zeros_like(x5)
            count = 0
            if c.tpavi_vv_flag:
                z, _ = self.tpavi[i](x5, None, train=train)
                feats = feats + z
                count += 1
            if c.tpavi_va_flag:
                z, a = self.tpavi[i](x5, audio_seq, train=train)
                feats = feats + z
                count += 1
                a_fea_list[i] = a
            maps[i] = (feats / count).reshape(B * T, h, w, c.channel)

        conv4 = self.paths[3](maps[3])
        conv43 = self.paths[2](conv4, maps[2])
        conv432 = self.paths[1](conv43, maps[1])
        conv4321 = self.paths[0](conv432, maps[0])
        # the reference's ResidualConvUnit relu(inplace=True) mutates each
        # feature_map_list entry to relu(x) as the paths consume them; the
        # returned list (used by the masked-AV losses) carries that mutation
        maps = [nn.relu(m) for m in maps]

        x = self.out_conv1(conv4321)
        x = resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2, align_corners=False)
        x = nn.relu(self.out_conv2(x))
        logits = self.out_conv3(x)[..., 0]  # (B*T, mask, mask)

        return {
            "mask_logits": logits,
            "feature_map_list": maps,
            "a_fea_list": a_fea_list,
            "telemetry": telemetry,
        }


def make_avs_loss_fn(model: AVSModel):
    """IoU-BCE (+ optional masked-AV) + weighted LB loss
    (ref: avs_s4/train_v2.py:247-256)."""
    from avmoe_tpu.losses.avs import iou_semantic_aware_loss

    cfg = model.cfg

    def loss_fn(variables, batch, rngs):
        mixup_lambda = batch.get("mixup_lambda")
        if mixup_lambda is None and "mixup" in rngs:
            B, T = batch["wave"].shape[0], batch["wave"].shape[1]
            mixup_lambda = jax.random.beta(
                rngs["mixup"], 0.5, 0.5, (B * T,)).astype(jnp.float32)
        rngs = {k: v for k, v in rngs.items() if k != "mixup"}
        out, upd = model.apply(
            variables, batch["images"], batch["wave"], train=True,
            mixup_lambda=mixup_lambda,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss, aux = iou_semantic_aware_loss(
            out["mask_logits"], batch["mask"],
            out["a_fea_list"], out["feature_map_list"],
            setting=cfg.setting, num_frames=cfg.num_segments,
            lambda_1=cfg.lambda_1, count_stages=cfg.sa_loss_stages,
            sa_loss_flag=cfg.sa_loss_flag, kind=cfg.sa_loss_kind,
            closer=cfg.closer_loss,
            norm_fea=cfg.sa_norm_fea, threshold=cfg.sa_threshold,
        )
        lb = out["telemetry"]["lb_loss"]
        loss = loss + cfg.lb_loss_weight * lb
        aux["loss_lb"] = lb
        return loss, (aux, upd["batch_stats"])

    return loss_fn
