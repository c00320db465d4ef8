"""DG-SCT-style single adapter (the reference's pre-MoE generation).

Re-creation of the legacy VisualAdapter with dual-guided channel + spatial
attention (ref: AVMOE/AVQA/net_grd_avst/net_avst_v2.py:27-212; the v1/v2 AVE
models net_trans.py:380-668 use the same family). Kept for API parity and as
the single-expert baseline the MoE fabric generalizes:

  other modality -> token/channel projection -> (latent-token cross attention)
  -> channel attention (SE-style, audio-guided) -> spatial attention
  -> x * (alpha*c_att + beta*s_att + 1 - alpha) -> bottleneck down/up.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.config import AdapterConfig
from avmoe_tpu.moe.adapter import GroupedDense, _Bottleneck


class DGSCTAdapter(nn.Module):
    """Single cross-modal adapter with channel+spatial dual guidance."""

    dim: int               # this modality's channel dim
    other_dim: int
    num_tokens: int        # this modality's token count
    other_num_tokens: int
    cfg: AdapterConfig
    alpha: float = 0.3
    beta: float = 0.05
    # 'zeros' matches the AVQA v1/v2 adapters (net_avst_v2.py:60);
    # 'uniform' matches the AVE MMIL_Net VisualAdapter's torch.rand
    # (net_trans.py:482)
    tokens_init: str = "zeros"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, other: jax.Array, *, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        B, N, C = x.shape
        # project other modality into this modality's token/channel shape
        token_kernel = self.param("token_proj_kernel", nn.initializers.lecun_normal(),
                                  (self.num_tokens, self.other_num_tokens))
        token_bias = self.param("token_proj_bias", nn.initializers.zeros,
                                (self.num_tokens,))
        ot = jnp.einsum("bmc,nm->bnc", other.astype(self.dtype),
                        token_kernel.astype(self.dtype)) + token_bias[None, :, None]
        ot = nn.Dense(self.dim, dtype=self.dtype, name="fc")(ot)  # (B, N, C)

        # latent-token cross attention (init per tokens_init, see attr note)
        T = self.cfg.num_tokens
        tok_init = (nn.initializers.zeros if self.tokens_init == "zeros"
                    else nn.initializers.uniform(scale=1.0))
        tokens = self.param("latent_tokens", tok_init, (T, C))
        gate_av = self.param("gate_av", nn.initializers.zeros, (1,))
        rep = jnp.broadcast_to(tokens[None], (B, T, C)).astype(self.dtype)
        a1 = jax.nn.softmax(jnp.einsum("btc,bmc->btm", rep, ot), axis=-1)
        rep = rep + jnp.einsum("btm,bmc->btc", a1, ot)
        a2 = jax.nn.softmax(jnp.einsum("bnc,btc->bnt", x, rep), axis=-1)
        x = x + gate_av * jnp.einsum("bnt,btc->bnc", a2, rep)

        # channel attention (audio-guided SE; ref :140-148)
        audio = ot.mean(axis=1)  # (B, C)
        aq1 = nn.relu(nn.Dense(self.dim, name="fc_affine_audio_1")(audio))[:, None]
        vq1 = nn.relu(nn.Dense(self.dim, name="fc_affine_video_1")(x))
        avq = nn.relu(nn.Dense(self.dim // 2, name="fc_affine_bottleneck")(
            (aq1 * vq1).mean(axis=1)))
        c_att = jax.nn.sigmoid(
            nn.Dense(self.dim, name="fc_affine_v_c_att")(avq))[:, None]  # (B,1,C)
        c_feat = x * (c_att + 1.0)

        # spatial attention (ref :151-160)
        cq = nn.relu(nn.Dense(self.dim // 2, name="fc_affine_video_2")(c_feat))
        aq2 = nn.relu(nn.Dense(self.dim // 2, name="fc_affine_audio_2")(audio))[:, None]
        s_logits = nn.Dense(1, name="fc_affine_v_s_att")(cq * aq2)      # (B,N,1)
        s_sig = jax.nn.sigmoid(s_logits)
        s_maps = jax.nn.softmax(jnp.tanh(s_logits).transpose(0, 2, 1), axis=-1)  # (B,1,N)

        x = x * (self.alpha * c_att + self.beta * s_sig + 1.0 - self.alpha)

        if self.cfg.before_layernorm:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_before")(x)
        out = _Bottleneck(self.dim, self.cfg, use_activation=True,
                          dtype=self.dtype, name="bottleneck")(x, train=train)
        if self.cfg.post_layernorm:
            out = nn.LayerNorm(epsilon=1e-5, name="ln_post")(out)
        if self.cfg.use_gate:
            out = self.param("gate", nn.initializers.zeros, (1,)) * out
        return out, s_maps
