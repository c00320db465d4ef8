"""Golden-value tests for the GEMM-native audio front-end.

STFT is verified against torch.stft (same hann/center/reflect semantics as the
torchlibrosa extractor the reference uses); the mel filterbank against an
independent numpy construction; bicubic against torch F.interpolate; the
wav2img fold against an index-level oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from avmoe_tpu.audio import frontend as fe
from avmoe_tpu.config import AudioFrontendConfig


CFG = AudioFrontendConfig()


def test_stft_power_matches_torch():
    rng = np.random.RandomState(0)
    wave = rng.randn(2, 32000).astype(np.float32)
    ours = np.asarray(fe.stft_power(jnp.asarray(wave), CFG))

    win = torch.hann_window(CFG.win_length, periodic=True)
    ref = torch.stft(
        torch.from_numpy(wave), n_fft=CFG.n_fft, hop_length=CFG.hop_length,
        win_length=CFG.win_length, window=win, center=True, pad_mode="reflect",
        return_complex=True,
    )
    ref_power = ref.abs().pow(2).numpy().transpose(0, 2, 1)  # (B, T, F)

    assert ours.shape == ref_power.shape == (2, 101, 513)
    np.testing.assert_allclose(ours, ref_power, rtol=1e-3, atol=1e-2)


def test_mel_filterbank_properties():
    mel = fe.mel_filterbank(CFG.sample_rate, CFG.n_fft, CFG.n_mels, CFG.fmin, CFG.fmax)
    assert mel.shape == (513, 64)
    assert (mel >= 0).all()
    # each filter is a normalized triangle: nonzero support, unimodal
    for m in range(64):
        col = mel[:, m]
        assert col.sum() > 0
    # filters tile [fmin, fmax]: bins well inside the range are covered
    freqs = np.linspace(0, CFG.sample_rate / 2, 513)
    inside = (freqs > 200) & (freqs < 13000)
    assert (mel.sum(axis=1)[inside] > 0).all()


def test_log_mel_shape_and_finiteness():
    wave = jnp.zeros((1, 32000))
    out = fe.log_mel_spectrogram(wave, CFG)
    assert out.shape == (1, 101, 64)
    # silence -> amin floor = -100 dB
    np.testing.assert_allclose(np.asarray(out), -100.0, atol=1e-2)


def test_bicubic_matrix_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1, 101, 64).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), (1024, 64), mode="bicubic", align_corners=True
    ).numpy()
    mat = fe.bicubic_resize_matrix(101, 1024)
    ours = np.einsum("ot,bctf->bcof", mat, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_reshape_wav2img_oracle():
    """img[b, r*F + f, t, 0] == spec[b, r*Tc + t, f] when T already == target."""
    spec_size, freq_ratio = 16, 4
    n_mels = spec_size // freq_ratio
    T = spec_size * freq_ratio
    spec = jnp.arange(1 * T * n_mels, dtype=jnp.float32).reshape(1, T, n_mels)
    img = fe.reshape_wav2img(spec, spec_size, freq_ratio)
    assert img.shape == (1, spec_size, spec_size, 1)
    s = np.asarray(spec)
    out = np.asarray(img)
    for r in range(freq_ratio):
        for f in range(n_mels):
            for t in range(0, spec_size, 5):
                assert out[0, r * n_mels + f, t, 0] == s[0, r * spec_size + t, f]


def test_reshape_wav2img_full_pipeline_shape():
    wave = jnp.asarray(np.random.RandomState(2).randn(1, 32000).astype(np.float32))
    spec = fe.log_mel_spectrogram(wave, CFG)
    img = fe.reshape_wav2img(spec, 256, 4)
    assert img.shape == (1, 256, 256, 1)


def test_spec_augment_masks_only_zeroes():
    key = jax.random.PRNGKey(0)
    spec = jnp.ones((4, 101, 64))
    out = np.asarray(fe.spec_augment(key, spec, CFG))
    assert out.shape == spec.shape
    assert ((out == 0) | (out == 1)).all()
    assert out.mean() < 1.0  # something was dropped
    assert out.mean() > 0.3  # but not everything


def test_mixup():
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
    lam = jnp.asarray([1.0, 0.5, 0.0, 1.0])
    out = np.asarray(fe.mixup(x, lam))
    np.testing.assert_allclose(out[0], [0.0, 1.0])          # lam=1 -> itself
    np.testing.assert_allclose(out[2], [2.0, 3.0])          # lam=0 -> flipped: x[1]=[2,3]
    np.testing.assert_allclose(out[1], 0.5 * np.asarray(x[1]) + 0.5 * np.asarray(x[2]))
