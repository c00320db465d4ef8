"""AVS segmentation head stack: ASPP classifier, FPN fusion, TPAVI, and the
four-scale temporal attention.

Channels-LAST re-creation of the reference decoder (ref: AVMOE/AVS/
avs_scripts/avs_s4/model/PVT_AVSModel_v2.py:319-583, TPAVI.py:6-190). All
convs are NHWC (TPU-native); bilinear up/downsampling via jax.image.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.heads.common import BiLSTM, TransformerDecoder, TransformerEncoder


def resize_bilinear(x: jax.Array, h: int, w: int, align_corners: bool = True) -> jax.Array:
    """(B, H, W, C) bilinear resize. align_corners=True matches the reference's
    F.interpolate / nn.Upsample settings; implemented via precomputed 1-D
    interpolation matrices -> two matmuls (exact + MXU-friendly)."""
    B, H, W, C = x.shape
    if H == h and W == w:
        return x
    mh = jnp.asarray(_linear_matrix(H, h, align_corners))
    mw = jnp.asarray(_linear_matrix(W, w, align_corners))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
            src = min(src, in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        t = src - lo
        m[i, lo] += 1.0 - t
        m[i, hi] += t
    return m


def resize_bicubic(x: jax.Array, h: int, w: int,
                   align_corners: bool = False) -> jax.Array:
    """(B, H, W, C) bicubic (torch kernel) resize. The AVS decoder's
    F.interpolate calls leave align_corners at its False default
    (PVT_AVSModel_v2.py:793,903-906)."""
    from avmoe_tpu.audio.frontend import bicubic_resize_matrix

    B, H, W, C = x.shape
    if H == h and W == w:
        return x
    mh = jnp.asarray(bicubic_resize_matrix(H, h, align_corners))
    mw = jnp.asarray(bicubic_resize_matrix(W, w, align_corners))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class ASPPClassifier(nn.Module):
    """Sum of dilated 3x3 convs (ref Classifier_Module :319-332)."""

    features: int
    dilations: Sequence[int] = (3, 6, 12, 18)

    @nn.compact
    def __call__(self, x):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                        padding=((d, d), (d, d)), name=f"conv_{i}")(x)
            out = y if out is None else out + y
        return out


class ResidualConvUnit(nn.Module):
    """conv2(relu(conv1(relu(x)))) + relu(x).

    The residual is relu(x), NOT x: the reference (:350-381) uses
    nn.ReLU(inplace=True), so `out = self.relu(x)` mutates the caller's
    tensor before `out + x` — the skip path sees the relu'd activation
    (and the caller's feature_map_list entry is mutated to relu(x), see
    FeatureFusionBlock/AVSModel)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(x)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Residual fusion + 2x bilinear upsample (ref :350-383)."""

    features: int

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="res1")(skip)
        x = ResidualConvUnit(self.features, name="res2")(x)
        B, H, W, C = x.shape
        return resize_bilinear(x, 2 * H, 2 * W, align_corners=True)


class TPAVIModule(nn.Module):
    """Temporal-pixel audio-visual non-local attention (ref TPAVI.py:6-190,
    'dot' mode, dimension=3). Visual (B, T, H, W, C); audio (B, T, 128).

    audio is broadcast to every pixel; theta(visual) . phi(audio) attention over
    all T*H*W positions; W_z conv+BN initialized to zero so the block starts as
    identity + residual."""

    in_channels: int
    inter_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, audio: Optional[jax.Array] = None, *, train: bool = False):
        B, T, H, W, C = x.shape
        inter = self.inter_channels or max(C // 2, 1)

        if audio is not None:
            a = nn.Dense(C, name="align_channel")(audio)       # (B, T, C)
            audio_bcast = jnp.broadcast_to(a[:, :, None, None, :], (B, T, H, W, C))
        else:
            a = None
            audio_bcast = x

        # g and theta act on the VISUAL stream; phi on the (broadcast) audio
        # (ref TPAVI.py:102-118: g_x = g(x), theta_x = theta(x), phi = phi(audio))
        g_x = nn.Dense(inter, name="g")(x).reshape(B, T * H * W, inter)
        theta = nn.Dense(inter, name="theta")(x).reshape(B, T * H * W, inter)
        phi = nn.Dense(inter, name="phi")(audio_bcast).reshape(B, T * H * W, inter)

        f = jnp.einsum("bnc,bmc->bnm", theta, phi,
                       preferred_element_type=jnp.float32)
        f = f / f.shape[-1]  # 'dot' mode: normalize by N
        y = jnp.einsum("bnm,bmc->bnc", f, g_x).reshape(B, T, H, W, inter)

        wz = nn.Conv(C, (1, 1, 1), name="W_z_conv",
                     kernel_init=nn.initializers.zeros)(y)
        wz = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          scale_init=nn.initializers.zeros, name="W_z_bn")(wz)
        # residual + channel-last LayerNorm; returns the aligned audio
        # (ref TPAVI.py:144-153: z = LN(W_z(y) + x); audio return = audio_temp)
        z = nn.LayerNorm(epsilon=1e-5, name="norm_layer")(wz + x)
        return z, a


class MultiScaleTemporalAttention(nn.Module):
    """Per-scale Bi-LSTM + enc/dec cross-attention with sigmoid gates over the
    four 256-d pyramid levels (ref :448-583). Visual inputs are NHWC maps
    (B*T, H, W, 256); audio (B, T, 128). gamma = 0.05."""

    d_model: int = 256
    audio_dim: int = 128
    num_segments: int = 5
    gamma: float = 0.05

    @nn.compact
    def __call__(self, feature_maps: List[jax.Array], audio: jax.Array,
                 *, train: bool = False):
        T = self.num_segments
        B = audio.shape[0]
        new_maps = []
        video_gates = []
        for i, fmap in enumerate(feature_maps):
            pooled = fmap.mean(axis=(1, 2)).reshape(B, T, -1)   # (B, T, 256)
            v = nn.Dense(self.d_model, name=f"v_fc_{i}")(pooled)
            v = nn.Dropout(0.2, deterministic=dropout_det(train))(nn.relu(v))
            a_rnn = BiLSTM(self.d_model // 2, name=f"audio_rnn_{i}")(audio)
            v_rnn = BiLSTM(self.d_model, name=f"visual_rnn_{i}")(v)

            video_kv = nn.Dense(self.d_model, name=f"video_enc_affine_{i}")(v_rnn)
            video_kv = TransformerEncoder(self.d_model, 4, 2, 1024,
                                          name=f"video_encoder_{i}")(video_kv, train=train)
            audio_kv = nn.Dense(self.d_model, name=f"audio_enc_affine_{i}")(a_rnn)
            audio_kv = TransformerEncoder(self.d_model, 4, 2, 1024,
                                          name=f"audio_encoder_{i}")(audio_kv, train=train)

            audio_gate = nn.sigmoid(nn.Dense(1, name=f"audio_gated_{i}")(audio_kv))
            video_gate = nn.sigmoid(nn.Dense(1, name=f"video_gated_{i}")(video_kv))
            video_gates.append(video_gate)

            gate = audio_gate.reshape(B * T, 1, 1, 1)
            new_maps.append(fmap + gate * fmap * self.gamma)

        video_gate = sum(video_gates) / len(video_gates)        # (B, T, 1)
        audio_flat = audio.reshape(B * T, -1)
        audio_out = audio_flat + video_gate.reshape(B * T, 1) * audio_flat * self.gamma
        return new_maps, audio_out
