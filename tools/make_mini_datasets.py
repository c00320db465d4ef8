"""Generate miniature datasets in the EXACT reference on-disk formats.

Writes mini AVE / LLP (AVVP) / MUSIC-AVQA / AVSBench (S4 + MS3) trees so the
four task CLIs can be driven train -> eval -> test from disk, exercising the
real readers (h5 label packs, tab-separated CSVs, templated question JSON,
per-category mask/frame trees) end to end without the real corpora.

Layouts mirror the reference loaders:
  AVE   ref AVMOE/AVE/dataloader.py (Annotations.txt '&' rows, labels.h5
        'avadataset', {split}_order.h5 'order')
  AVVP  ref AVMOE/AVVP/main_avvp.py + dataloader (tsv CSVs, r2plus1d_18)
  AVQA  ref AVMOE/AVQA/net_grd_avst/dataloader_avst.py (templated questions)
  AVS   ref AVMOE/avs_s4|avs_ms3/dataloader.py (per-category frame/mask dirs)

Usage: python tools/make_mini_datasets.py [out_root] [--n N] [--img SIZE]
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rng(seed):
    return np.random.RandomState(seed)


def _save_jpg(path, r, size):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((r.rand(size, size, 3) * 255).astype(np.uint8)).save(path)


def _save_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _save_wave(path, r, segments, seg_len=8000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, (r.randn(segments, seg_len) * 0.05).astype(np.float32))


def make_ave(root: str, n: int = 6, img: int = 64) -> None:
    import h5py

    os.makedirs(root, exist_ok=True)
    cats = ["Church bell", "Dog", "Violin"]
    vids = [f"mini_vid_{i:02d}" for i in range(n)]
    with open(os.path.join(root, "Annotations.txt"), "w") as f:
        f.write("category&video_id&quality&start&end\n")
        for i, v in enumerate(vids):
            f.write(f"{cats[i % len(cats)]}&{v}&good&0&10\n")
    # labels: (n, 10, 29) one-hot; event class for 6 segs, background (28) rest
    labels = np.zeros((n, 10, 29), np.float32)
    for i in range(n):
        labels[i, :6, i % len(cats)] = 1
        labels[i, 6:, 28] = 1
    with h5py.File(os.path.join(root, "labels.h5"), "w") as f:
        f.create_dataset("avadataset", data=labels)
    order = np.arange(n)
    tr, te = order[: max(n - 2, 1)], order[max(n - 2, 1):]
    for split, o in (("train", tr), ("test", te), ("val", te)):
        with h5py.File(os.path.join(root, f"{split}_order.h5"), "w") as f:
            f.create_dataset("order", data=o)
    for i, v in enumerate(vids):
        r = _rng(i)
        for t in range(1, 11):
            _save_jpg(os.path.join(root, "frames", v, f"{t:04d}.jpg"), r, img)
        _save_wave(os.path.join(root, "wave", f"{v}.npy"), r, 10)


def make_avvp(root: str, n: int = 6, img: int = 64) -> None:
    from avmoe_tpu.data.avvp import CATEGORIES

    os.makedirs(root, exist_ok=True)
    names = [f"mini{i:07d}" for i in range(n)]  # 11-char ids
    rows = [(f"{nm}_0_10", CATEGORIES[i % 4]) for i, nm in enumerate(names)]
    for csv, sel in (("train.csv", rows[: max(n - 2, 1)]),
                     ("val.csv", rows[max(n - 2, 1):]),
                     ("test.csv", rows[max(n - 2, 1):])):
        with open(os.path.join(root, csv), "w") as f:
            f.write("filename\tevent_labels\n")
            for fn, lab in sel:
                f.write(f"{fn}\t{lab}\n")
    # segment-level eval annotations (audio + visual)
    for csv in ("AVVP_eval_audio.csv", "AVVP_eval_visual.csv"):
        with open(os.path.join(root, csv), "w") as f:
            f.write("filename\tonset\toffset\tevent_labels\n")
            for i, (fn, lab) in enumerate(rows[max(n - 2, 1):]):
                f.write(f"{fn}\t0\t{5 + i % 5}\t{lab}\n")
    for i, nm in enumerate(names):
        r = _rng(100 + i)
        for t in range(1, 11):
            _save_jpg(os.path.join(root, "frames", nm, f"{t:04d}.jpg"), r, img)
        _save_wave(os.path.join(root, "wave", f"{nm}.npy"), r, 10)
        os.makedirs(os.path.join(root, "r2plus1d_18"), exist_ok=True)
        np.save(os.path.join(root, "r2plus1d_18", f"{nm}.npy"),
                r.randn(10, 512).astype(np.float32))


def make_avqa(root: str, n: int = 4, img: int = 64) -> None:
    os.makedirs(root, exist_ok=True)
    vids = [f"qa_vid_{i:02d}" for i in range(n)]
    qtypes = ["[' Audio', ' Counting']", "[' Visual', ' Localization']"]
    samples = []
    for i, v in enumerate(vids):
        samples.append({
            "video_id": v,
            "question_id": i,
            "type": qtypes[i % 2],
            "question_content": "How many <Object> are in the video?",
            "templ_values": "[' drums']" if i % 2 == 0 else "[' guitars']",
            "anser": ["one", "two"][i % 2],
        })
    cut = max(n - 2, 1)
    for name, sel in (("avqa-train.json", samples[:cut]),
                      ("avqa-val.json", samples[cut:]),
                      ("avqa-test.json", samples[cut:])):
        json.dump(sel, open(os.path.join(root, name), "w"))
    # shipped vocab files (ref asset format: /root/reference/data/AVQA/
    # {ques,ans}_vocab.txt, one token per line) - the CLI auto-detects these,
    # exercising the fixed-vocabulary path the reference checkpoints use
    ques = ["<pad>"]
    for s in samples:
        words = s["question_content"].rstrip().split(" ")
        words[-1] = words[-1][:-1]
        vals = [s["templ_values"][2:-2]]
        p = 0
        for w in words:
            w2 = vals[p] if "<" in w else w
            p += 1 if "<" in w else 0
            if w2 not in ques:
                ques.append(w2)
    with open(os.path.join(root, "ques_vocab.txt"), "w") as f:
        f.write("\n".join(ques) + "\n")
    with open(os.path.join(root, "ans_vocab.txt"), "w") as f:
        f.write("\n".join(["one", "two"]) + "\n")
    for i, v in enumerate(vids):
        r = _rng(200 + i)
        for t in range(1, 17):  # linspace-sampled by the reader
            _save_jpg(os.path.join(root, "frames", v, f"{t:08d}.jpg"), r, img)
        _save_wave(os.path.join(root, "wave", f"{v}.npy"), r, 10)


def make_avs(root: str, setting: str = "s4", n: int = 4, img: int = 64) -> None:
    os.makedirs(root, exist_ok=True)
    cats = ["dog", "cello"]
    vids = [f"avs_{setting}_{i:02d}" for i in range(n)]
    rows = ["name,split,category"] if setting == "s4" else ["name,split"]
    splits = ["train"] * max(n - 2, 1) + ["val", "test"]
    for i, v in enumerate(vids):
        split = splits[min(i, len(splits) - 1)]
        cat = cats[i % 2]
        rows.append(f"{v},{split},{cat}" if setting == "s4" else f"{v},{split}")
        r = _rng(300 + i)
        mask = (r.rand(img, img) > 0.5).astype(np.uint8) * 255
        if setting == "s4":
            for t in range(1, 6):
                _save_jpg(os.path.join(root, "visual_frames", split, cat, v,
                                       f"{v}_{t}.png"), r, img)
            n_masks = 1 if split == "train" else 5
            for t in range(1, n_masks + 1):
                _save_png(os.path.join(root, "gt_masks", split, cat, v,
                                       f"{v}_{t}.png"), mask)
            _save_wave(os.path.join(root, "wave", split, cat, f"{v}.npy"), r, 5)
        else:
            for t in range(1, 6):
                _save_jpg(os.path.join(root, "visual_frames", v,
                                       f"{v}.mp4_{t}.png"), r, img)
                _save_png(os.path.join(root, "gt_masks", v, f"{v}_{t}.png"), mask)
            _save_wave(os.path.join(root, "wave", f"{v}.npy"), r, 5)
    with open(os.path.join(root, f"{setting}_meta_data.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out_root", nargs="?", default="/tmp/mini_datasets")
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--img", type=int, default=64)
    args = p.parse_args()
    make_ave(os.path.join(args.out_root, "AVE"), args.n, args.img)
    make_avvp(os.path.join(args.out_root, "LLP"), args.n, args.img)
    make_avqa(os.path.join(args.out_root, "MUSIC-AVQA"), max(args.n - 2, 2), args.img)
    make_avs(os.path.join(args.out_root, "AVSBench_s4"), "s4", max(args.n - 2, 4), args.img)
    make_avs(os.path.join(args.out_root, "AVSBench_ms3"), "ms3", max(args.n - 2, 4), args.img)
    print(f"mini datasets written under {args.out_root}")


if __name__ == "__main__":
    main()
