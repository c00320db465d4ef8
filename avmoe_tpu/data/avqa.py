"""MUSIC-AVQA dataset: frames + waveform + tokenized questions + answers.

File-format compatible with the reference's AVQA_dataset
(ref: AVMOE/AVQA/net_grd_avst/dataloader_avst.py:35-281):
  * train/val/test JSON with 'question_content' (templated via 'templ_values'),
    'anser', 'video_id', 'type';
  * question/answer vocabularies built on the fly from the TRAIN json
    (vocab build :41-66);
  * 10 frames per clip sampled linspace over the video, 192x192;
  * negative frames drawn from other videos (:195-229).
"""

from __future__ import annotations

import ast
import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from avmoe_tpu.data.transforms import load_image, pad_or_trim_wave


def parse_question(sample: Dict) -> List[str]:
    """Template-substituted word list (ref :48-56)."""
    words = sample["question_content"].rstrip().split(" ")
    words[-1] = words[-1][:-1]  # strip '?'
    values = ast.literal_eval(sample["templ_values"])
    p = 0
    out = []
    for w in words:
        if "<" in w:
            out.append(values[p])
            p += 1
        else:
            out.append(w)
    return out


def build_vocabs(train_json: str) -> Tuple[List[str], List[str]]:
    samples = json.load(open(train_json))
    ques_vocab = ["<pad>"]
    ans_vocab: List[str] = []
    for s in samples:
        for w in parse_question(s):
            if w not in ques_vocab:
                ques_vocab.append(w)
        if s["anser"] not in ans_vocab:
            ans_vocab.append(s["anser"])
    return ques_vocab, ans_vocab


def load_vocab_file(path: str) -> List[str]:
    """One token per line (the reference ships data/AVQA/ques_vocab.txt /
    ans_vocab.txt in this format). Lines are stripped of the newline only;
    leading/inner spaces are significant. Interior lines are kept VERBATIM -
    silently dropping a blank interior line would shift every subsequent
    token index vs the checkpoint's embedding order (ADVICE r3); only a
    trailing final newline is ignored."""
    with open(path) as f:
        tokens = [line.rstrip("\n") for line in f]
    if tokens and tokens[-1] == "":
        tokens.pop()  # file ends with a newline, not an empty entry
    return tokens


def resolve_vocabs(
    train_json: str,
    ques_vocab_file: Optional[str] = None,
    ans_vocab_file: Optional[str] = None,
) -> Tuple[List[str], List[str]]:
    """Shipped vocab files win over the on-the-fly JSON build (the reference
    publishes fixed vocabularies whose index order its checkpoints depend on);
    either file may be given independently, the other side falls back."""
    ques = load_vocab_file(ques_vocab_file) if ques_vocab_file else None
    ans = load_vocab_file(ans_vocab_file) if ans_vocab_file else None
    if ques is None or ans is None:
        built_q, built_a = build_vocabs(train_json)
        ques = ques if ques is not None else built_q
        ans = ans if ans is not None else built_a
    return ques, ans


class AVQADataset:
    NUM_SEGMENTS = 10
    AUDIO_LEN = 32_000
    MAX_QST_LEN = 14

    def __init__(self, root: str, label_json: str, train_json: str,
                 img_size: int = 192, seed: int = 0,
                 ques_vocab_file: Optional[str] = None,
                 ans_vocab_file: Optional[str] = None):
        self.root = root
        self.img_size = img_size
        self.ques_vocab, self.ans_vocab = resolve_vocabs(
            train_json, ques_vocab_file, ans_vocab_file)
        self.word_to_ix = {w: i for i, w in enumerate(self.ques_vocab)}
        self.samples = json.load(open(label_json))
        self.video_list = sorted({s["video_id"] for s in self.samples})
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    def _frames(self, video: str, idx: Optional[int] = None) -> np.ndarray:
        frame_dir = os.path.join(self.root, "frames", video)
        total = len(glob.glob(os.path.join(frame_dir, "*.jpg")))
        picks = np.linspace(1, total, num=self.NUM_SEGMENTS, dtype=int)
        if idx is not None:
            picks = picks[idx: idx + 1]
        return np.stack([
            load_image(os.path.join(frame_dir, f"{p:08d}.jpg"),
                       (self.img_size, self.img_size))
            for p in picks
        ])

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        s = self.samples[i]
        video = s["video_id"]
        frames = self._frames(video)
        # negative frames from other videos (one per segment)
        vid_idx = self.video_list.index(video)
        nega = []
        for _ in range(self.NUM_SEGMENTS):
            while True:
                j = self.rng.randint(len(self.video_list))
                if j != vid_idx:
                    break
            nega.append(self._frames(self.video_list[j],
                                     self.rng.randint(self.NUM_SEGMENTS))[0])
        wave = np.load(os.path.join(self.root, "wave", f"{video}.npy"))
        wave = pad_or_trim_wave(
            wave.reshape(self.NUM_SEGMENTS, -1).astype(np.float32), self.AUDIO_LEN)

        words = parse_question(s)
        words = words[: self.MAX_QST_LEN]
        words += ["<pad>"] * (self.MAX_QST_LEN - len(words))
        question = np.array([self.word_to_ix.get(w, 0) for w in words], np.int32)
        answer = np.int32(self.ans_vocab.index(s["anser"]))
        return {
            "wave": wave,
            "visual_posi": frames.astype(np.float32),
            "visual_nega": np.stack(nega).astype(np.float32),
            "question": question,
            "answer": answer,
            "qtype_str": s.get("type", ""),
        }


class SyntheticAVQADataset:
    QTYPES = [
        "[' Audio', ' Counting']", "[' Audio', ' Comparative']",
        "[' Visual', ' Counting']", "[' Visual', ' Localization']",
        "[' Audio-Visual', ' Existential']", "[' Audio-Visual', ' Counting']",
        "[' Audio-Visual', ' Localization']", "[' Audio-Visual', ' Comparative']",
        "[' Audio-Visual', ' Temporal']",
    ]

    def __init__(self, length: int = 16, num_segments: int = 10,
                 audio_len: int = 32_000, img_size: int = 192,
                 qst_vocab: int = 93, max_qst_len: int = 14,
                 answer_vocab: int = 42, seed: int = 0):
        self.length = length
        self.num_segments = num_segments
        self.audio_len = audio_len
        self.img_size = img_size
        self.qst_vocab = qst_vocab
        self.max_qst_len = max_qst_len
        self.answer_vocab = answer_vocab
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 104729 + idx)
        T = self.num_segments
        return {
            "wave": rng.randn(T, self.audio_len).astype(np.float32) * 0.1,
            "visual_posi": rng.rand(T, self.img_size, self.img_size, 3).astype(np.float32),
            "visual_nega": rng.rand(T, self.img_size, self.img_size, 3).astype(np.float32),
            "question": rng.randint(0, self.qst_vocab, self.max_qst_len).astype(np.int32),
            "answer": np.int32(rng.randint(self.answer_vocab)),
            "qtype_str": self.QTYPES[idx % len(self.QTYPES)],
        }
