"""Host-side image/audio transforms for the data layer.

The reference decodes jpg frames, bicubic-resizes to 192x192 and applies
ImageNet normalization in torchvision transforms (ref: AVMOE/AVE/
dataloader.py:61-64, 163-171). Here: PIL decode -> numpy, channels-last.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image(path: str, size: Tuple[int, int]) -> np.ndarray:
    """Decode + bicubic resize + ImageNet normalize -> (H, W, 3) float32."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize(size, Image.BICUBIC)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def normalize_image(arr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8/float in [0,1] -> ImageNet-normalized float32."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def int16_to_float32(x: np.ndarray) -> np.ndarray:
    return (x / 32767.0).astype(np.float32)


def pad_or_trim_wave(wave: np.ndarray, length: int) -> np.ndarray:
    """Right-pad with zeros or trim to exactly `length` samples."""
    if wave.shape[-1] >= length:
        return wave[..., :length]
    pad = [(0, 0)] * (wave.ndim - 1) + [(0, length - wave.shape[-1])]
    return np.pad(wave, pad)
