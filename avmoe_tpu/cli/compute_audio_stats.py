"""Dataset audio-statistics tool: fbank mean/std over a dataset.

Re-creation of the reference's compute_audio_mean.py (ref: AVMOE/AVE/
compute_audio_mean.py:65-243): iterate waveforms, compute kaldi fbank, report
the dataset-level mean/std used to normalize dataloader features
(e.g. AVE's -5.27/4.08, ref dataloader.py:57-58).

Usage: python -m avmoe_tpu.cli.compute_audio_stats --wave_dir data/AVE/wave
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from avmoe_tpu.audio.kaldi import fbank


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave_dir", required=True, help="dir of .npy waveform packs")
    p.add_argument("--sample_rate", type=float, default=16_000.0)
    p.add_argument("--num_mel_bins", type=int, default=192)
    p.add_argument("--frame_shift_ms", type=float, default=5.2)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    files = sorted(glob.glob(os.path.join(args.wave_dir, "*.npy")))
    if args.limit:
        files = files[: args.limit]
    assert files, f"no .npy files under {args.wave_dir}"

    total, total_sq, count = 0.0, 0.0, 0
    for i, f in enumerate(files):
        wave = np.load(f).reshape(-1)
        fb = fbank(wave, sample_frequency=args.sample_rate,
                   num_mel_bins=args.num_mel_bins,
                   frame_shift_ms=args.frame_shift_ms)
        total += fb.sum()
        total_sq += (fb.astype(np.float64) ** 2).sum()
        count += fb.size
        if i % 50 == 0:
            mean = total / max(count, 1)
            std = np.sqrt(max(total_sq / max(count, 1) - mean**2, 0))
            print(f"[{i}/{len(files)}] running mean={mean:.4f} std={std:.4f}")
    mean = total / count
    std = np.sqrt(total_sq / count - mean**2)
    print(f"dataset fbank mean={mean:.6f} std={std:.6f} over {count} values")


if __name__ == "__main__":
    main()
