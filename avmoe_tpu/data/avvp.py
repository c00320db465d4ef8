"""LLP dataset for AVVP: frames + waveform + r2plus1d features + weak labels.

File-format compatible with the reference's LLP_dataset
(ref: AVMOE/AVVP/dataloader.py:45-208): tab-separated CSV with 'filename' and
'event_labels' ('comma'-joined category names), 10 frames per clip, (10, 32000)
waveform packs, and (10, 512) r2plus1d `video_st` features. Also parses the
AVVP_eval_audio/visual.csv onset/offset annotations into (25, 10) GT grids for
the F1 evaluator."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from avmoe_tpu.data.transforms import load_image, pad_or_trim_wave

CATEGORIES = [
    "Speech", "Car", "Cheering", "Dog", "Cat", "Frying_(food)",
    "Basketball_bounce", "Fire_alarm", "Chainsaw", "Cello", "Banjo",
    "Singing", "Chicken_rooster", "Violin_fiddle", "Vacuum_cleaner",
    "Baby_laughter", "Accordion", "Lawn_mower", "Motorcycle", "Helicopter",
    "Acoustic_guitar", "Telephone_bell_ringing", "Baby_cry_infant_cry",
    "Blender", "Clapping",
]
ID_TO_IDX = {c: i for i, c in enumerate(CATEGORIES)}


def parse_eval_annotations(csv_path: str) -> Dict[str, np.ndarray]:
    """AVVP_eval_{audio,visual}.csv -> {filename: (25, 10) binary grid}."""
    import pandas as pd

    df = pd.read_csv(csv_path, header=0, sep="\t")
    grids: Dict[str, np.ndarray] = {}
    for _, row in df.iterrows():
        fn = row["filename"]
        grid = grids.setdefault(fn, np.zeros((len(CATEGORIES), 10), dtype=np.int64))
        idx = ID_TO_IDX[row["event_labels"]]
        grid[idx, int(row["onset"]): int(row["offset"])] = 1
    return grids


class LLPDataset:
    NUM_SEGMENTS = 10
    AUDIO_LEN = 32_000

    def __init__(self, root: str, label_csv: str, img_size: int = 192):
        import pandas as pd

        self.root = root
        self.img_size = img_size
        self.df = pd.read_csv(label_csv, header=0, sep="\t")

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[idx]
        name = row["filename"][:11]
        labels = np.zeros(len(CATEGORIES), dtype=np.float32)
        for cat in str(row["event_labels"]).split(","):
            if cat in ID_TO_IDX:
                labels[ID_TO_IDX[cat]] = 1.0
        frames = np.stack([
            load_image(os.path.join(self.root, "frames", name, f"{t:04d}.jpg"),
                       (self.img_size, self.img_size))
            for t in range(1, self.NUM_SEGMENTS + 1)
        ])
        wave = np.load(os.path.join(self.root, "wave", f"{name}.npy"))
        wave = pad_or_trim_wave(
            wave.reshape(self.NUM_SEGMENTS, -1).astype(np.float32), self.AUDIO_LEN)
        video_st = np.load(os.path.join(self.root, "r2plus1d_18", f"{name}.npy"))
        return {
            "wave": wave,
            "images": frames.astype(np.float32),
            "video_st": video_st.astype(np.float32),
            "labels": labels,
            "clip_index": np.int64(idx),
        }


class SyntheticAVVPDataset:
    """Random LLP-shaped data incl. (25,10) GT grids for metric tests."""

    def __init__(self, length: int = 16, num_segments: int = 10,
                 audio_len: int = 32_000, img_size: int = 192,
                 st_dim: int = 512, num_classes: int = 25, seed: int = 0):
        self.length = length
        self.num_segments = num_segments
        self.audio_len = audio_len
        self.img_size = img_size
        self.st_dim = st_dim
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 7919 + idx)
        labels = (rng.rand(self.num_classes) < 0.1).astype(np.float32)
        if labels.sum() == 0:
            labels[rng.randint(self.num_classes)] = 1.0
        return {
            "wave": rng.randn(self.num_segments, self.audio_len).astype(np.float32) * 0.1,
            "images": rng.rand(self.num_segments, self.img_size, self.img_size, 3).astype(np.float32),
            "video_st": rng.randn(self.num_segments, self.st_dim).astype(np.float32),
            "labels": labels,
            "clip_index": np.int64(idx),
        }
