"""Swin-V2 vision encoder (timm swinv2_{base,large}_window12_192 geometry).

The reference consumes timm's SwinTransformerV2 piecewise - patch_embed,
per-block `_attn`/`mlp` sub-calls, stage downsamples, final norm
(ref: net_trans_v3.py:513, 646, 688-732). This module rebuilds the same
architecture natively with post-norm V2 blocks and exposes the same seams.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.backbones.geometry import BlockSpec, stage_boundaries, swin_stage_specs
from avmoe_tpu.config import SwinV2Config
from avmoe_tpu.ops.norm import LayerNorm
from avmoe_tpu.ops.swin import PatchEmbed, PatchMergingV2, SwinBlock


class SwinV2Encoder(nn.Module):
    cfg: SwinV2Config
    dtype: jnp.dtype = jnp.float32

    @property
    def block_specs(self) -> List[BlockSpec]:
        return swin_stage_specs(
            self.cfg.embed_dim,
            self.cfg.depths,
            self.cfg.num_heads,
            self.cfg.patches_resolution,
            self.cfg.window_size,
            self.cfg.drop_path_rate,
            self.cfg.pretrained_window_sizes,
        )

    @property
    def stage_ranges(self) -> List[Tuple[int, int]]:
        return stage_boundaries(self.cfg.depths)

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(
            embed_dim=c.embed_dim,
            patch_size=(c.patch_size, c.patch_size),
            patch_stride=(c.patch_size, c.patch_size),
            use_norm=True,
            dtype=self.dtype,
        )
        block_cls = SwinBlock
        if c.remat:
            from avmoe_tpu.utils.runtime import remat_policy

            # rematerialize both sub-block seams and the full call; `train`
            # (arg index 2, counting self) is static
            block_cls = nn.remat(
                SwinBlock, static_argnums=(2,),
                policy=remat_policy(c.remat_policy),
                methods=["__call__", "attn_residual", "mlp_residual"])
        self.blocks = [
            block_cls(
                dim=s.dim,
                input_resolution=s.resolution,
                num_heads=s.num_heads,
                window_size=s.window_size,
                shift_size=s.shift_size,
                version="v2",
                mlp_ratio=c.mlp_ratio,
                drop_path=s.drop_path,
                pretrained_window=s.pretrained_window,
                dtype=self.dtype,
                name=f"block_{s.stage}_{s.index_in_stage}",
            )
            for s in self.block_specs
        ]
        self.downsamples = [
            PatchMergingV2(
                input_resolution=(
                    c.patches_resolution[0] // 2**i,
                    c.patches_resolution[1] // 2**i,
                ),
                dtype=self.dtype,
                name=f"downsample_{i}",
            )
            for i in range(len(c.depths) - 1)
        ]
        self.norm = LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def embed(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) images -> (B, N0, embed_dim) tokens."""
        return self.patch_embed(images.astype(self.dtype))

    def forward_features(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for stage, (lo, hi) in enumerate(self.stage_ranges):
            for i in range(lo, hi):
                x = self.blocks[i](x, train)
            if stage < len(self.downsamples):
                x = self.downsamples[stage](x)
        return self.norm(x)

    def __call__(self, images: jax.Array, *, train: bool = False) -> jax.Array:
        """(B, H, W, 3) -> (B, num_features) pooled features."""
        x = self.embed(images)
        x = self.forward_features(x, train=train)
        return x.mean(axis=1)
