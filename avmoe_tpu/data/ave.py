"""AVE dataset: frames + raw waveform + one-hot segment labels.

File-format compatible with the reference's AVE_dataset
(ref: AVMOE/AVE/dataloader.py:33-186):
  * `Annotations.txt` - '&'-separated category&video_id&quality&start&end rows
  * `labels.h5` / `train_order.h5` etc. - per-clip (10, 29) one-hot labels and
    split orderings
  * `frames/<vid>/*.jpg` - 10 frames per clip, resized to 192x192
  * `wave/<vid>.npy` (or a pack) - (10, 32000) float32 per clip

`SyntheticAVEDataset` generates structurally identical random data for tests
and benchmarks (no dataset assets ship with either repo - the reference's
labels.h5 is listed in .MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from avmoe_tpu.data.transforms import load_image, pad_or_trim_wave


class AVEDataset:
    """Map-style dataset yielding dicts of numpy arrays."""

    NUM_CLASSES = 28
    NUM_SEGMENTS = 10
    AUDIO_LEN = 32_000
    IMG_SIZE = 192

    def __init__(
        self,
        root: str,
        split: str = "train",
        img_size: int = IMG_SIZE,
    ):
        import h5py

        self.root = root
        self.img_size = img_size
        with h5py.File(os.path.join(root, "labels.h5"), "r") as f:
            self.labels = np.asarray(f["avadataset"])  # (N, 10, 29)
        order_file = os.path.join(root, f"{split}_order.h5")
        with h5py.File(order_file, "r") as f:
            self.order = np.asarray(f["order"]).astype(np.int64)
        # video ids from annotations
        ann = os.path.join(root, "Annotations.txt")
        self.video_ids: List[str] = []
        with open(ann) as f:
            next(f)  # header
            for line in f:
                parts = line.strip().split("&")
                if len(parts) >= 2:
                    self.video_ids.append(parts[1])

    def __len__(self) -> int:
        return len(self.order)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        clip = int(self.order[idx])
        vid = self.video_ids[clip]
        frames = np.stack(
            [
                load_image(
                    os.path.join(self.root, "frames", vid, f"{t + 1:04d}.jpg"),
                    (self.img_size, self.img_size),
                )
                for t in range(self.NUM_SEGMENTS)
            ]
        )  # (10, H, W, 3)
        wave = np.load(os.path.join(self.root, "wave", f"{vid}.npy"))
        wave = pad_or_trim_wave(
            wave.reshape(self.NUM_SEGMENTS, -1).astype(np.float32), self.AUDIO_LEN
        )
        return {
            "wave": wave,
            "images": frames.astype(np.float32),
            "labels": self.labels[clip].astype(np.float32),
        }


class SyntheticAVEDataset:
    """Random AVE-shaped data (same dict schema), deterministic per index.

    With learnable=True, the class is encoded in the signal: event segments
    carry a class-specific tone in the waveform and a class-colored square in
    the frames, so a working train loop must push accuracy above chance."""

    def __init__(
        self,
        length: int = 64,
        num_segments: int = 10,
        audio_len: int = 32_000,
        img_size: int = 192,
        num_classes: int = 28,
        seed: int = 0,
        learnable: bool = False,
        sample_rate: int = 32_000,
    ):
        self.length = length
        self.num_segments = num_segments
        self.audio_len = audio_len
        self.img_size = img_size
        self.num_classes = num_classes
        self.seed = seed
        self.learnable = learnable
        self.sample_rate = sample_rate

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100_003 + idx)
        T, C = self.num_segments, self.num_classes
        labels = np.zeros((T, C + 1), dtype=np.float32)
        cls = rng.randint(0, C)
        is_event = rng.rand(T) < 0.7
        for t in range(T):
            labels[t, cls if is_event[t] else C] = 1.0
        wave = rng.randn(T, self.audio_len).astype(np.float32) * 0.1
        images = rng.rand(T, self.img_size, self.img_size, 3).astype(np.float32)
        if self.learnable:
            freq = 200.0 * (cls + 1)
            tone = 0.5 * np.sin(
                2 * np.pi * freq * np.arange(self.audio_len) / self.sample_rate
            ).astype(np.float32)
            sz = max(self.img_size // 4, 2)
            r = (cls % 7) / 7.0
            g = ((cls // 7) % 4) / 4.0
            for t in range(T):
                if is_event[t]:
                    wave[t] += tone
                    images[t, :sz, :sz] = (r, g, 1.0)
        return {
            "wave": wave,
            "images": images,
            "labels": labels,
        }


# ----------------------------------------------------- LAVisH (MMIL_Net_v2)

# AVE-dataset fbank normalization stats for the 192-bin swin flavor
# (ref: AVMOE/AVE/dataloader_lavish.py:80-85)
LAVISH_NORM_MEAN = -4.984795570373535
LAVISH_NORM_STD = 3.7079780101776123


def wave_to_lavish_spec(
    wave: np.ndarray,
    *,
    sample_rate: int = 16_000,
    size: int = 192,
    frame_shift_ms: float = 5.2,
    norm_mean: float = LAVISH_NORM_MEAN,
    norm_std: float = LAVISH_NORM_STD,
) -> np.ndarray:
    """(T, L) waveform segments -> (T, size, size) normalized kaldi-fbank
    images for the LAVisH baseline (ref: dataloader_lavish.py:166-193:
    num_mel_bins=192, frame_shift=5.2 ms, hanning, (x-mean)/(2*std),
    zero-pad/cut to 192 frames)."""
    from avmoe_tpu.audio.kaldi import fbank

    out = np.zeros((wave.shape[0], size, size), np.float32)
    for t in range(wave.shape[0]):
        fb = fbank(wave[t], sample_frequency=sample_rate,
                   frame_shift_ms=frame_shift_ms, num_mel_bins=size,
                   window_type="hanning", htk_compat=True, use_energy=False)
        fb = (fb - norm_mean) / (norm_std * 2.0)
        n = min(size, fb.shape[0])
        out[t, :n] = fb[:n]
    return out


class LAVisHView:
    """Wraps an AVE-shaped dataset, replacing 'wave' with the LAVisH
    'audio_spec' fbank image (the MMIL_Net_v2 input contract)."""

    def __init__(self, base, *, sample_rate: int = 16_000, size: int = 192):
        self.base = base
        self.sample_rate = sample_rate
        self.size = size

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = dict(self.base[idx])
        wave = item.pop("wave")
        item["audio_spec"] = wave_to_lavish_spec(
            wave, sample_rate=self.sample_rate, size=self.size)
        return item
