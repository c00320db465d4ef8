"""Audio-guided spatial-channel attention (CMRAN/CMBS lineage).

Re-creation of New_Audio_Guided_Attention (ref: AVMOE/AVE/nets/
models.py:174-275): visual self-attention over the spatial grid, video-average
spatial gating, audio-guided channel attention, audio-guided spatial pooling;
returns one attended visual vector per segment."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det


class AudioGuidedAttention(nn.Module):
    video_dim: int = 512
    audio_dim: int = 128
    hidden_dim: int = 256
    latent_ratio: int = 4
    beta: float = 0.1

    @nn.compact
    def __call__(self, video: jax.Array, audio: jax.Array, *, train: bool = False):
        """video (B, T, H, W, Cv); audio (B, T, Ca) -> (B, T, Cv)."""
        B, T, H, W, Cv = video.shape
        BT = B * T
        grid = video.reshape(BT, H * W, Cv)
        raw = grid
        a = audio.reshape(BT, -1)

        # spatial self-attention over the grid (post-norm residual)
        d = self.video_dim // self.latent_ratio
        q = nn.Dense(d, name="video_query")(grid)
        k = nn.Dense(d, name="video_key")(grid)
        v = nn.Dense(Cv, name="video_value")(grid)
        att = jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q, k), axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", att, v)
        grid = nn.LayerNorm(epsilon=1e-5, name="norm")(
            grid + nn.Dropout(0.2, deterministic=dropout_det(train))(out))

        # video-average spatial gate
        avg = nn.relu(nn.Dense(self.hidden_dim, name="affine_video_ave")(
            grid.mean(axis=1)))[:, None]
        q3 = nn.relu(nn.Dense(self.hidden_dim, name="affine_video_3")(grid))
        self_maps = jax.nn.softmax(
            jnp.tanh(nn.Dense(1, name="ave_v_att")(q3 * avg)).transpose(0, 2, 1),
            axis=-1)
        self_feat = jnp.einsum("bon,bnc->boc", self_maps, grid)[:, 0].reshape(B, T, Cv)

        # audio-guided channel attention on the RAW grid
        aq1 = nn.relu(nn.Dense(self.video_dim, name="affine_audio_1")(a))[:, None]
        vq1 = nn.relu(nn.Dense(self.video_dim, name="affine_video_1")(grid))
        bottleneck = nn.relu(nn.Dense(self.hidden_dim, name="affine_bottleneck")(
            (aq1 * vq1).mean(axis=1)))
        c_att = jax.nn.sigmoid(
            nn.Dense(self.video_dim, name="affine_v_c_att")(bottleneck))[:, None]
        c_feat = raw * (c_att + 1.0)

        # audio-guided spatial pooling
        cq = nn.relu(nn.Dense(self.hidden_dim, name="affine_video_2")(c_feat))
        aq2 = nn.relu(nn.Dense(self.hidden_dim, name="affine_audio_2")(a))[:, None]
        s_maps = jax.nn.softmax(
            jnp.tanh(nn.Dense(1, name="affine_v_s_att")(cq * aq2)).transpose(0, 2, 1),
            axis=-1)
        pooled = jnp.einsum("bon,bnc->boc", s_maps, c_feat)[:, 0].reshape(B, T, Cv)

        return pooled + self.beta * jax.nn.sigmoid(self_feat) * pooled
