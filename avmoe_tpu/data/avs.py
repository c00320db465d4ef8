"""AVSBench datasets (S4 single-source, MS3 multi-source).

File-format compatible with the reference dataloaders
(ref: AVMOE/AVS/avs_scripts/avs_s4/dataloader.py:60-203,
avs_ms3/dataloader.py:63-187): anno CSV with split/video/category columns,
5 frames per clip at 224x224, binary GT masks (S4: 1 train mask / 5 eval
masks; MS3: always 5), and (5, 32000) waveform packs.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from avmoe_tpu.data.transforms import load_image, pad_or_trim_wave


def _load_mask(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("1").resize((size, size), Image.NEAREST)
        return np.asarray(im, dtype=np.float32)


class S4Dataset:
    NUM_SEGMENTS = 5
    AUDIO_LEN = 32_000

    def __init__(self, root: str, split: str = "train", img_size: int = 224,
                 mask_size: int = 224):
        import pandas as pd

        self.root = root
        self.split = split
        self.img_size = img_size
        self.mask_size = mask_size
        df = pd.read_csv(os.path.join(root, "s4_meta_data.csv"), sep=",")
        self.df = df[df["split"] == split].reset_index(drop=True)

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[idx]
        video, category = row["name"], row["category"]
        base = os.path.join(self.root, "visual_frames", self.split, category, video)
        frames = np.stack([
            load_image(os.path.join(base, f"{video}_{t + 1}.png"),
                       (self.img_size, self.img_size))
            for t in range(self.NUM_SEGMENTS)
        ])
        mask_base = os.path.join(self.root, "gt_masks", self.split, category, video)
        n_masks = 1 if self.split == "train" else self.NUM_SEGMENTS
        masks = np.stack([
            _load_mask(os.path.join(mask_base, f"{video}_{t + 1}.png"), self.mask_size)
            for t in range(n_masks)
        ])
        wave = np.load(os.path.join(self.root, "wave", self.split, category,
                                    f"{video}.npy"))
        wave = pad_or_trim_wave(
            wave.reshape(self.NUM_SEGMENTS, -1).astype(np.float32), self.AUDIO_LEN)
        return {
            "images": frames.astype(np.float32),
            "wave": wave,
            "mask": masks[0] if self.split == "train" else masks,
            "category": category,
            "video": video,
        }


class MS3Dataset(S4Dataset):
    """MS3: all five masks in every split (ref: avs_ms3/dataloader.py:68)."""

    def __init__(self, root: str, split: str = "train", img_size: int = 224,
                 mask_size: int = 224):
        import pandas as pd

        self.root = root
        self.split = split
        self.img_size = img_size
        self.mask_size = mask_size
        df = pd.read_csv(os.path.join(root, "ms3_meta_data.csv"), sep=",")
        self.df = df[df["split"] == split].reset_index(drop=True)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[idx]
        video = row["name"]
        base = os.path.join(self.root, "visual_frames", video)
        frames = np.stack([
            load_image(os.path.join(base, f"{video}.mp4_{t + 1}.png"),
                       (self.img_size, self.img_size))
            for t in range(self.NUM_SEGMENTS)
        ])
        masks = np.stack([
            _load_mask(os.path.join(self.root, "gt_masks", video,
                                    f"{video}_{t + 1}.png"), self.mask_size)
            for t in range(self.NUM_SEGMENTS)
        ])
        wave = np.load(os.path.join(self.root, "wave", f"{video}.npy"))
        wave = pad_or_trim_wave(
            wave.reshape(self.NUM_SEGMENTS, -1).astype(np.float32), self.AUDIO_LEN)
        return {
            "images": frames.astype(np.float32),
            "wave": wave,
            "mask": masks,
            "video": video,
        }


class SyntheticAVSDataset:
    """Random AVS-shaped clips: blob masks + matching noise."""

    def __init__(self, length: int = 8, num_segments: int = 5,
                 audio_len: int = 32_000, img_size: int = 224,
                 mask_size: int = 224, setting: str = "s4",
                 split: str = "train", seed: int = 0):
        self.length = length
        self.num_segments = num_segments
        self.audio_len = audio_len
        self.img_size = img_size
        self.mask_size = mask_size
        self.setting = setting
        self.split = split
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 31337 + idx)
        T, S = self.num_segments, self.mask_size
        cy, cx, r = rng.randint(S // 4, 3 * S // 4, 2).tolist() + [S // 5]
        yy, xx = np.mgrid[0:S, 0:S]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(np.float32)
        if self.setting == "s4" and self.split == "train":
            mask = blob
        else:
            mask = np.stack([blob] * T)
        return {
            "images": rng.rand(T, self.img_size, self.img_size, 3).astype(np.float32),
            "wave": rng.randn(T, self.audio_len).astype(np.float32) * 0.1,
            "mask": mask,
        }
