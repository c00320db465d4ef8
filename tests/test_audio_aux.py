"""Kaldi fbank + VGGish input pipeline invariants (pure numpy, fast)."""

import numpy as np

from avmoe_tpu.audio.kaldi import fbank, kaldi_mel_banks
from avmoe_tpu.backbones.vggish import waveform_to_examples


def test_kaldi_fbank_shapes():
    wave = np.random.RandomState(0).randn(16_000).astype(np.float32)
    fb = fbank(wave, sample_frequency=16_000, num_mel_bins=192,
               frame_shift_ms=5.2)
    # snip_edges: 1 + (16000 - 400) // 83 frames
    assert fb.shape == (1 + (16_000 - 400) // 83, 192)
    assert np.isfinite(fb).all()


def test_kaldi_fbank_silence_floor():
    fb = fbank(np.zeros(8000), sample_frequency=16_000, num_mel_bins=23)
    assert np.allclose(fb, np.log(1.1920928955078125e-07))


def test_kaldi_mel_banks_partition():
    banks = kaldi_mel_banks(40, 512, 16_000.0)
    assert banks.shape == (40, 256)
    assert (banks >= 0).all()
    # interior bins are covered by at least one filter
    freqs = np.arange(256) * (16_000 / 512)
    inside = (freqs > 100) & (freqs < 7600)
    assert (banks.sum(axis=0)[inside] > 0).all()


def test_kaldi_tone_peak():
    """A 1 kHz tone must put its energy near the 1 kHz filter."""
    t = np.arange(16_000) / 16_000
    wave = np.sin(2 * np.pi * 1000 * t)
    fb = fbank(wave, sample_frequency=16_000, num_mel_bins=40)
    mean = fb.mean(axis=0)
    peak_bin = mean.argmax()
    banks = kaldi_mel_banks(40, 512, 16_000.0)
    freqs = np.arange(256) * (16_000 / 512)
    center = freqs[banks[peak_bin].argmax()]
    assert 800 < center < 1250, center


def test_vggish_examples():
    wave = np.random.RandomState(1).randn(16_000).astype(np.float32)
    ex = waveform_to_examples(wave)
    assert ex.shape == (1, 96, 64)  # one 0.96 s example per second
    assert np.isfinite(ex).all()
    # two seconds -> two examples
    ex2 = waveform_to_examples(np.tile(wave, 2))
    assert ex2.shape[0] == 2
