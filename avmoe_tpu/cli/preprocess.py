"""Dataset preprocessing: extract frames + audio from raw videos.

Re-creation of the reference's preprocessing scripts (ref: AVMOE/AVS/
preprocess_scripts/preprocess_s4.py:24-80, preprocess_ms3.py - ffmpeg frame
extraction at 1 fps and 16/32 kHz mono wav extraction, then waveform .npy
packs). Requires the `ffmpeg` binary; exits with a clear message otherwise.

Usage:
  python -m avmoe_tpu.cli.preprocess --video_dir raw/ --out_dir data/ \
      --fps 1 --num_segments 5 --sample_rate 32000
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import subprocess
import sys

import numpy as np


def extract(video: str, out_dir: str, fps: float, sample_rate: int,
            num_segments: int) -> None:
    name = os.path.splitext(os.path.basename(video))[0]
    frame_dir = os.path.join(out_dir, "frames", name)
    os.makedirs(frame_dir, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video,
         "-vf", f"fps={fps}", os.path.join(frame_dir, "%04d.jpg")],
        check=True)
    wav = os.path.join(out_dir, "wave", f"{name}.wav")
    os.makedirs(os.path.dirname(wav), exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video,
         "-ac", "1", "-ar", str(sample_rate), wav],
        check=True)
    # wav -> (num_segments, sample_rate) float32 .npy pack
    import wave as wavelib

    with wavelib.open(wav) as f:
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype=np.int16)
    data = data.astype(np.float32) / 32767.0
    seg = sample_rate  # 1s segments
    need = num_segments * seg
    if len(data) < need:
        data = np.pad(data, (0, need - len(data)))
    idx = np.linspace(0, len(data) - seg, num_segments).astype(int)
    pack = np.stack([data[i: i + seg] for i in idx])
    np.save(os.path.join(out_dir, "wave", f"{name}.npy"), pack)
    os.remove(wav)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--num_segments", type=int, default=5)
    p.add_argument("--sample_rate", type=int, default=32_000)
    args = p.parse_args()

    if shutil.which("ffmpeg") is None:
        sys.exit("ffmpeg binary not found on PATH; install it to preprocess videos")

    videos = sorted(sum([glob.glob(os.path.join(args.video_dir, f"*.{ext}"))
                         for ext in ("mp4", "mkv", "avi", "webm")], []))
    assert videos, f"no videos found under {args.video_dir}"
    for i, v in enumerate(videos):
        extract(v, args.out_dir, args.fps, args.sample_rate, args.num_segments)
        if i % 25 == 0:
            print(f"[{i}/{len(videos)}] {v}")
    print(f"done: {len(videos)} videos -> {args.out_dir}")


if __name__ == "__main__":
    main()
