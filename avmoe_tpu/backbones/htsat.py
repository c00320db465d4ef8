"""HTS-AT: hierarchical token-semantic audio transformer, TPU-native.

Re-creation of the reference's HTS-AT (ref: AVMOE/AVE/nets/htsat.py:370-826;
paper: HTS-AT, Chen et al. 2022) on top of the shared Swin-V1 blocks:

  waveform -> log-mel (GEMM STFT) -> per-mel-bin BatchNorm -> [SpecAugment,
  mixup] -> wav2img frequency fold -> patch embed -> 4 Swin stages -> TSCAM.

The encoder exposes:
  * `embed(wave, ...)`          - tokens after patch embedding (lock-step entry)
  * `block_specs` / submodule block list - for the MoE injection engine
  * `__call__(wave, ...)`       - standalone audio tagging: clipwise +
                                  framewise outputs via the TSCAM conv head
                                  (ref: htsat.py:536-543, 619-705).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from avmoe_tpu.audio import frontend as fe
from avmoe_tpu.backbones.geometry import BlockSpec, stage_boundaries, swin_stage_specs
from avmoe_tpu.config import HTSATConfig
from avmoe_tpu.ops.norm import LayerNorm
from avmoe_tpu.ops.swin import PatchEmbed, PatchMergingV1, SwinBlock


class HTSATEncoder(nn.Module):
    cfg: HTSATConfig
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
        )

    @property
    def stage_ranges(self) -> List[Tuple[int, int]]:
        return stage_boundaries(self.cfg.depths)

    def setup(self):
        c = self.cfg
        self.bn0 = nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5)
        self.patch_embed = PatchEmbed(
            embed_dim=c.embed_dim,
            patch_size=(c.patch_size, c.patch_size),
            patch_stride=c.patch_stride,
            use_norm=c.patch_norm,
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
                version="v1",
                mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias,
                drop=c.drop_rate,
                attn_drop=c.attn_drop_rate,
                drop_path=s.drop_path,
                dtype=self.dtype,
                name=f"block_{s.stage}_{s.index_in_stage}",
            )
            for s in self.block_specs
        ]
        n_stages = len(c.depths)
        self.downsamples = [
            PatchMergingV1(
                input_resolution=(
                    c.patches_resolution[0] // 2**i,
                    c.patches_resolution[1] // 2**i,
                ),
                dtype=self.dtype,
                name=f"downsample_{i}",
            )
            for i in range(n_stages - 1)
        ]
        self.norm = LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if c.ape:
            self.absolute_pos_embed = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, c.patches_resolution[0] * c.patches_resolution[1], c.embed_dim),
            )
        # TSCAM head (ref: htsat.py:536-543): grouped-freq conv over the final map
        # (kernel spans the remaining freq bins; clamped for miniature configs
        # whose final grid is smaller than the freq fold ratio)
        grid_f = c.spec_size // (2 ** (len(c.depths) - 1)) // c.patch_stride[0]
        sf = max(grid_f // min(c.freq_ratio, grid_f), 1)
        self.tscam_conv = nn.Conv(
            c.num_classes, kernel_size=(sf, 3), padding=((0, 0), (1, 1)),
            dtype=self.dtype, name="tscam_conv",
        )
        self.head = nn.Dense(c.num_classes, dtype=self.dtype, name="head")

    # -- front half -------------------------------------------------------

    def spectrogram_image(
        self,
        wave: jax.Array,
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> jax.Array:
        """(B, L) wave -> (B, S, S, 1) folded log-mel image with bn0/specaug/mixup
        (ref order: htsat.py:753-763)."""
        c = self.cfg
        spec = fe.log_mel_spectrogram(wave.astype(jnp.float32), c.frontend)
        # bn0 normalizes per mel bin (ref: htsat.py:453, applied :757-759)
        spec = self.bn0(spec, use_running_average=not train)
        # SpecAugment is train-time stochastic; AVMOE_DETERMINISTIC_TRAIN=1
        # (utils.runtime.dropout_det) disables it for cross-framework
        # training-curve parity tests
        from avmoe_tpu.utils.runtime import dropout_det

        if train and not dropout_det(train):
            spec = fe.spec_augment(self.make_rng("specaug"), spec, c.frontend)
        if train and mixup_lambda is not None:
            spec = fe.mixup(spec, mixup_lambda)
        return fe.reshape_wav2img(spec, c.spec_size, c.freq_ratio).astype(self.dtype)

    def embed(
        self,
        wave: jax.Array,
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> jax.Array:
        """wave -> (B, N0, embed_dim) patch tokens (lock-step entry point)."""
        img = self.spectrogram_image(wave, train=train, mixup_lambda=mixup_lambda)
        x = self.patch_embed(img)
        if self.cfg.ape:
            x = x + self.absolute_pos_embed
        return x

    # -- full standalone model --------------------------------------------

    def forward_features(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        """Run all stages on embedded tokens -> (B, N_last, num_features)."""
        for stage, (lo, hi) in enumerate(self.stage_ranges):
            for i in range(lo, hi):
                x = self.blocks[i](x, train)
            if stage < len(self.downsamples):
                x = self.downsamples[stage](x)
        return x

    def __call__(
        self,
        wave: jax.Array,
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ):
        """Standalone audio tagging forward (ref: htsat.py:619-685).

        Returns dict with 'clipwise_output' (B, num_classes), 'framewise_output'
        (B, T_frames, num_classes), 'latent_output' (B, num_features).
        """
        c = self.cfg
        x = self.embed(wave, train=train, mixup_lambda=mixup_lambda)
        x = self.forward_features(x, train=train)
        x = self.norm(x)
        B, N, C = x.shape
        down = 2 ** (len(c.depths) - 1)
        sf = c.spec_size // down // c.patch_stride[0]
        st = c.spec_size // down // c.patch_stride[1]
        # tokens -> (B, SF, ST, C) grid, then undo the freq fold: rows were
        # r*F' + f, so regroup SF into (freq_ratio, F'/ratio) and splice time.
        grid = x.reshape(B, sf, st, C)
        ratio_eff = min(c.freq_ratio, sf)  # miniature configs: fold what exists
        cfb = sf // ratio_eff  # true freq bins at this scale
        grid = grid.reshape(B, ratio_eff, cfb, st, C)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(B, cfb, ratio_eff * st, C)

        latent = grid.reshape(B, -1, C).mean(axis=1)

        logits_map = self.tscam_conv(grid)  # (B, 1, T, num_classes) after valid-F conv
        logits_map = logits_map.reshape(B, -1, c.num_classes)  # (B, T, cls)
        framewise = jax.nn.sigmoid(logits_map)
        # time-interp framewise output to 8 * patch_stride ticks (ref: htsat.py:663)
        reps = (8 * c.patch_stride[1] * c.freq_ratio * st) // logits_map.shape[1] \
            if logits_map.shape[1] > 0 else 1
        framewise = jnp.repeat(framewise, max(reps, 1), axis=1)
        clipwise_logits = logits_map.mean(axis=1)
        clipwise = jax.nn.sigmoid(clipwise_logits)
        return {
            "clipwise_output": clipwise,
            "clipwise_logits": clipwise_logits,
            "framewise_output": framewise,
            "latent_output": latent,
        }

    # -- long / short audio inference modes ---------------------------------

    def _features_from_spec(self, spec: jax.Array, *, train: bool = False):
        """(B, T, F) log-mel (already bn0-normalized) -> output dict."""
        c = self.cfg
        img = fe.reshape_wav2img(spec, c.spec_size, c.freq_ratio).astype(self.dtype)
        x = self.patch_embed(img)
        if c.ape:
            x = x + self.absolute_pos_embed

        # replicate the tail of __call__ on embedded tokens
        x = self.forward_features(x, train=train)
        x = self.norm(x)
        B, N, C = x.shape
        down = 2 ** (len(c.depths) - 1)
        sf = c.spec_size // down // c.patch_stride[0]
        st = c.spec_size // down // c.patch_stride[1]
        grid = x.reshape(B, sf, st, C)
        ratio_eff = min(c.freq_ratio, sf)
        cfb = sf // ratio_eff
        grid = grid.reshape(B, ratio_eff, cfb, st, C)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(B, cfb, ratio_eff * st, C)
        logits_map = self.tscam_conv(grid).reshape(B, -1, c.num_classes)
        return {
            "clipwise_output": jax.nn.sigmoid(logits_map.mean(axis=1)),
            "framewise_output": jax.nn.sigmoid(logits_map),
        }

    def forward_long_audio(self, wave: jax.Array) -> dict:
        """Crop-and-average inference for audio longer than
        freq_ratio * spec_size frames (ref: htsat.py:797-821): overlapping
        crops of (T-1)//2 frames at (T-1)//4 hops, outputs averaged."""
        c = self.cfg
        spec = fe.log_mel_spectrogram(wave.astype(jnp.float32), c.frontend)
        spec = self.bn0(spec, use_running_average=True)
        T = spec.shape[1]
        max_t = c.freq_ratio * c.spec_size
        if T <= max_t:
            return self._features_from_spec(spec)
        crop = (T - 1) // 2
        overlap = (T - 1) // 4
        positions = list(range(0, T - crop - 1, overlap))
        if self.is_initializing():
            # param-creation pass: run one crop eagerly
            out = self._features_from_spec(spec[:, :crop])
            return out
        # every crop has the same static shape, so the crop forward compiles
        # ONCE and lax.map iterates it - program size (and compile time) no
        # longer scales with the audio length
        def body(pos):
            crop_spec = jax.lax.dynamic_slice_in_dim(spec, pos, crop, axis=1)
            return self._features_from_spec(crop_spec)

        outs = jax.lax.map(body, jnp.asarray(positions, jnp.int32))
        return {k: v.mean(axis=0) for k, v in outs.items()}

    def forward_repeat_mode(self, wave: jax.Array) -> dict:
        """Short-audio inference: tile the spectrogram in time up to the model
        window before folding (ref: htsat.py:765-772 infer_mode)."""
        c = self.cfg
        spec = fe.log_mel_spectrogram(wave.astype(jnp.float32), c.frontend)
        spec = self.bn0(spec, use_running_average=True)
        T = spec.shape[1]
        target_t = c.spec_size * c.freq_ratio
        reps = max(target_t // T, 1)
        spec = jnp.tile(spec, (1, reps, 1))[:, :target_t]
        return self._features_from_spec(spec)
