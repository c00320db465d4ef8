"""Original AVSBench baseline segmentation models (no MoE adapters).

Re-creation of the reference's non-v2 paths (ref: AVMOE/AVS/avs_scripts/
avs_s4/model/PVT_AVSModel.py and ResNet_AVSModel.py:139-260): a true PVT-v2-b5
or ResNet-50 visual encoder + ASPP per-stage projections + TPAVI non-local
audio-visual attention + FPN decode, driven by precomputed VGGish audio
embeddings (B, T, 128)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.backbones.pvt import PVTv2, pvt_v2_b5
from avmoe_tpu.backbones.resnet import B2ResNet
from avmoe_tpu.heads.avs import (
    ASPPClassifier,
    FeatureFusionBlock,
    TPAVIModule,
    resize_bilinear,
)


class AVSBaselineModel(nn.Module):
    """backbone: 'pvt' or 'resnet'."""

    backbone: str = "pvt"
    channel: int = 256
    num_segments: int = 5
    tpavi_stages: tuple = (0, 1, 2, 3)
    tpavi_vv_flag: bool = False
    tpavi_va_flag: bool = True

    def setup(self):
        if self.backbone == "pvt":
            self.encoder_backbone = pvt_v2_b5()
        else:
            self.encoder_backbone = B2ResNet()
        self.convs = [ASPPClassifier(self.channel, name=f"conv{i + 1}")
                      for i in range(4)]
        self.paths = [FeatureFusionBlock(self.channel, name=f"path_{i}")
                      for i in range(4)]
        self.tpavi = {i: TPAVIModule(in_channels=self.channel, name=f"tpavi_b{i + 1}")
                      for i in self.tpavi_stages}
        self.out_conv1 = nn.Conv(128, (3, 3), padding=1, name="out_conv1")
        self.out_conv2 = nn.Conv(32, (3, 3), padding=1, name="out_conv2")
        self.out_conv3 = nn.Conv(1, (1, 1), name="out_conv3")

    def __call__(
        self,
        images: jax.Array,        # (B, T, H, W, 3)
        audio_feature: jax.Array,  # (B, T, 128) VGGish embeddings
        *,
        train: bool = False,
    ) -> Dict:
        B, T = images.shape[0], images.shape[1]
        x = images.reshape((B * T,) + images.shape[2:])
        pyramid = self.encoder_backbone(x, train=train)  # 4 x (B*T, h, w, c)
        maps = [self.convs[i](pyramid[i]) for i in range(4)]

        a_fea_list: List[Optional[jax.Array]] = [None] * 4
        for i in self.tpavi_stages:
            h, w = maps[i].shape[1], maps[i].shape[2]
            x5 = maps[i].reshape(B, T, h, w, self.channel)
            feats = jnp.zeros_like(x5)
            count = 0
            if self.tpavi_vv_flag:
                z, _ = self.tpavi[i](x5, None, train=train)
                feats, count = feats + z, count + 1
            if self.tpavi_va_flag:
                z, a = self.tpavi[i](x5, audio_feature, train=train)
                feats, count = feats + z, count + 1
                a_fea_list[i] = a
            maps[i] = (feats / count).reshape(B * T, h, w, self.channel)

        conv4 = self.paths[3](maps[3])
        conv43 = self.paths[2](conv4, maps[2])
        conv432 = self.paths[1](conv43, maps[1])
        conv4321 = self.paths[0](conv432, maps[0])

        y = self.out_conv1(conv4321)
        y = resize_bilinear(y, y.shape[1] * 2, y.shape[2] * 2, align_corners=False)
        y = nn.relu(self.out_conv2(y))
        logits = self.out_conv3(y)[..., 0]
        return {
            "mask_logits": logits,
            "feature_map_list": maps,
            "a_fea_list": a_fea_list,
        }
