"""VGGish audio CNN + PCA postprocessor + waveform->examples front-end.

Re-creation of the reference's torchvggish (ref: AVMOE/AVS/avs_scripts/avs_s4/
torchvggish/vggish.py:9-195, vggish_params.py, mel_features.py:21-192,
vggish_input.py:30-100): the AVS training script builds a frozen VGGish
`audio_extractor` (avs_s4/train_v2.py:57-64) even though the v2 model path
feeds raw waveforms to HTS-AT; provided here for the original AVSBench path
and feature extraction parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from avmoe_tpu.audio.frontend import mel_filterbank_htk

# vggish_params.py constants
SAMPLE_RATE = 16_000
STFT_WINDOW_SECONDS = 0.025
STFT_HOP_SECONDS = 0.010
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7_500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_SECONDS = 0.96
EXAMPLE_HOP_SECONDS = 0.96
EMBEDDING_SIZE = 128
QUANTIZE_MIN_VAL = -2.0
QUANTIZE_MAX_VAL = 2.0


def waveform_to_examples(wave: np.ndarray, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """(L,) waveform -> (N, 96, 64) log-mel examples (ref: vggish_input.py:30).

    numpy host-side (data-prep path); HTK mel, log(mel + 0.01)."""
    win = int(round(STFT_WINDOW_SECONDS * sample_rate))
    hop = int(round(STFT_HOP_SECONDS * sample_rate))
    fft_length = 2 ** int(np.ceil(np.log2(win)))
    n = 1 + (len(wave) - win) // hop if len(wave) >= win else 0
    if n <= 0:
        return np.zeros((0, 96, NUM_MEL_BINS), np.float32)
    idx = np.arange(win)[None, :] + hop * np.arange(n)[:, None]
    frames = wave[idx] * np.hanning(win + 1)[:-1][None, :]  # periodic hann
    spec = np.abs(np.fft.rfft(frames, fft_length, axis=-1))
    mel = spec @ mel_filterbank_htk(sample_rate, fft_length, NUM_MEL_BINS,
                                    MEL_MIN_HZ, MEL_MAX_HZ)
    log_mel = np.log(mel + LOG_OFFSET)
    # frame into 0.96s examples
    frames_per_example = int(round(EXAMPLE_WINDOW_SECONDS / STFT_HOP_SECONDS))
    hop_frames = int(round(EXAMPLE_HOP_SECONDS / STFT_HOP_SECONDS))
    m = 1 + (len(log_mel) - frames_per_example) // hop_frames \
        if len(log_mel) >= frames_per_example else 0
    if m <= 0:
        return np.zeros((0, 96, NUM_MEL_BINS), np.float32)
    eidx = np.arange(frames_per_example)[None, :] + hop_frames * np.arange(m)[:, None]
    return log_mel[eidx].astype(np.float32)


class VGGish(nn.Module):
    """VGG audio CNN: (B, 96, 64, 1) log-mel examples -> (B, 128) embeddings
    (ref: vggish.py:9-60)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def conv(x, feats, name):
            x = nn.Conv(feats, (3, 3), padding=1, name=name)(x)
            return nn.relu(x)

        x = conv(x, 64, "conv1")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = conv(x, 128, "conv2")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = conv(x, 256, "conv3_1")
        x = conv(x, 256, "conv3_2")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = conv(x, 512, "conv4_1")
        x = conv(x, 512, "conv4_2")
        x = nn.max_pool(x, (2, 2), (2, 2))
        # the reference transposes to channels-last BEFORE flattening
        # (vggish.py:25-28, "remain compatible with vggish embeddings"):
        # flatten order is (H, W, C) - exactly our channels-last layout
        B = x.shape[0]
        x = x.reshape(B, -1)  # (B, 6*4*512)
        x = nn.relu(nn.Dense(4096, name="fc1_1")(x))
        x = nn.relu(nn.Dense(4096, name="fc1_2")(x))
        x = nn.relu(nn.Dense(EMBEDDING_SIZE, name="fc2")(x))
        return x


class VGGishPostprocessor:
    """PCA + quantization postprocessor (ref: vggish.py:34-100)."""

    def __init__(self, pca_matrix: np.ndarray, pca_means: np.ndarray):
        self.pca_matrix = np.asarray(pca_matrix, np.float32)      # (128, 128)
        self.pca_means = np.asarray(pca_means, np.float32).reshape(-1, 1)

    def __call__(self, embeddings: np.ndarray) -> np.ndarray:
        x = self.pca_matrix @ (np.asarray(embeddings).T - self.pca_means)
        x = np.clip(x.T, QUANTIZE_MIN_VAL, QUANTIZE_MAX_VAL)
        x = (x - QUANTIZE_MIN_VAL) * (255.0 / (QUANTIZE_MAX_VAL - QUANTIZE_MIN_VAL))
        return x  # float in [0, 255] (the reference keeps float post-scale)
