"""Kaldi-compatible log-mel filterbank features.

Re-creation of torchaudio.compliance.kaldi.fbank as invoked by every
reference dataloader (ref: AVMOE/AVE/dataloader.py:129-147 - htk_compat=True,
hanning window, num_mel_bins=192, dither=0, frame_shift=5.2ms,
use_energy=False): snip-edges framing, per-frame DC removal, preemphasis
0.97, power-of-two FFT, Kaldi mel scale (1127 ln(1 + f/700)), log-energy
floored at eps. Host-side numpy (data-prep path); the on-device path is the
GEMM front-end in avmoe_tpu.audio.frontend.
"""

from __future__ import annotations

import functools
import math

import numpy as np

EPSILON = 1.1920928955078125e-07  # torch.finfo(float32).eps


def _mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=None)
def kaldi_mel_banks(num_bins: int, fft_len: int, sample_rate: float,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """(num_bins, fft_len//2) triangular mel banks, Kaldi style (no norm,
    DC bin dropped, nyquist bin excluded)."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    num_fft_bins = fft_len // 2
    fft_bin_width = sample_rate / fft_len
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    out = np.zeros((num_bins, num_fft_bins), dtype=np.float64)
    bin_mels = _mel(fft_bin_width * np.arange(num_fft_bins))
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        out[b] = np.clip(np.minimum(up, down), 0.0, None)
    return out.astype(np.float32)


def fbank(
    waveform: np.ndarray,
    *,
    sample_frequency: float = 16_000.0,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    num_mel_bins: int = 23,
    window_type: str = "hanning",
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    htk_compat: bool = True,
    use_energy: bool = False,
) -> np.ndarray:
    """(L,) waveform -> (T, num_mel_bins) log mel energies."""
    wave = np.asarray(waveform, dtype=np.float64).reshape(-1)
    win = int(sample_frequency * frame_length_ms / 1000.0)
    hop = int(sample_frequency * frame_shift_ms / 1000.0)
    if len(wave) < win:
        return np.zeros((0, num_mel_bins), np.float32)
    n = 1 + (len(wave) - win) // hop  # snip_edges=True
    idx = np.arange(win)[None, :] + hop * np.arange(n)[:, None]
    frames = wave[idx]
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis:
        shifted = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * shifted
    if window_type == "hanning":
        window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / (win - 1))
    elif window_type == "povey":
        window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / (win - 1))) ** 0.85
    elif window_type == "hamming":
        window = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(win) / (win - 1))
    else:
        raise ValueError(window_type)
    frames = frames * window
    fft_len = 2 ** int(math.ceil(math.log2(win)))
    spec = np.abs(np.fft.rfft(frames, fft_len, axis=1)) ** 2  # power
    banks = kaldi_mel_banks(num_mel_bins, fft_len, sample_frequency,
                            low_freq, high_freq)
    mel = spec[:, : fft_len // 2] @ banks.T
    return np.log(np.maximum(mel, EPSILON)).astype(np.float32)
