from avmoe_tpu.audio.frontend import (
    LogMelFrontend,
    log_mel_spectrogram,
    mel_filterbank,
    mixup,
    reshape_wav2img,
    spec_augment,
    stft_power,
)

__all__ = [
    "LogMelFrontend",
    "log_mel_spectrogram",
    "mel_filterbank",
    "mixup",
    "reshape_wav2img",
    "spec_augment",
    "stft_power",
]
