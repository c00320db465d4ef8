"""Real-format dataset reader tests against generated fixture files."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _write_frames(d, names, n, size=32, pattern="{:04d}.jpg"):
    os.makedirs(d, exist_ok=True)
    for i in range(1, n + 1):
        Image.fromarray(
            (np.random.RandomState(i).rand(size, size, 3) * 255).astype(np.uint8)
        ).save(os.path.join(d, pattern.format(i)))


def test_ave_dataset_fixture(tmp_path):
    import h5py

    from avmoe_tpu.data.ave import AVEDataset

    root = str(tmp_path)
    # Annotations.txt: header + '&'-separated rows (ref AVE format)
    with open(os.path.join(root, "Annotations.txt"), "w") as f:
        f.write("category&video_id&quality&start&end\n")
        f.write("Church bell&vid_a&good&0&10\n")
        f.write("Dog&vid_b&good&0&10\n")
    with h5py.File(os.path.join(root, "labels.h5"), "w") as f:
        f.create_dataset("avadataset", data=np.eye(29)[np.zeros((2, 10), int)])
    with h5py.File(os.path.join(root, "train_order.h5"), "w") as f:
        f.create_dataset("order", data=np.array([1, 0]))
    for vid in ("vid_a", "vid_b"):
        _write_frames(os.path.join(root, "frames", vid), [], 10)
        os.makedirs(os.path.join(root, "wave"), exist_ok=True)
        np.save(os.path.join(root, "wave", f"{vid}.npy"),
                np.random.RandomState(0).randn(10, 1000).astype(np.float32))

    ds = AVEDataset(root, "train", img_size=32)
    assert len(ds) == 2
    item = ds[0]  # order[0] = 1 -> vid_b
    assert item["wave"].shape == (10, 32_000)  # padded
    assert item["images"].shape == (10, 32, 32, 3)
    assert item["labels"].shape == (10, 29)


def test_llp_dataset_fixture(tmp_path):
    from avmoe_tpu.data.avvp import LLPDataset, parse_eval_annotations

    root = str(tmp_path)
    csv = os.path.join(root, "train.csv")
    with open(csv, "w") as f:
        f.write("filename\tevent_labels\n")
        f.write("aaaaaaaaaaa_0_10\tSpeech,Dog\n")
    name = "aaaaaaaaaaa"
    _write_frames(os.path.join(root, "frames", name), [], 10)
    os.makedirs(os.path.join(root, "wave"), exist_ok=True)
    np.save(os.path.join(root, "wave", f"{name}.npy"),
            np.zeros((10, 320), np.float32))
    os.makedirs(os.path.join(root, "r2plus1d_18"), exist_ok=True)
    np.save(os.path.join(root, "r2plus1d_18", f"{name}.npy"),
            np.zeros((10, 512), np.float32))

    ds = LLPDataset(root, csv, img_size=32)
    item = ds[0]
    assert item["labels"].sum() == 2  # Speech + Dog
    assert item["video_st"].shape == (10, 512)

    # eval annotation grids
    eval_csv = os.path.join(root, "eval.csv")
    with open(eval_csv, "w") as f:
        f.write("filename\tevent_labels\tonset\toffset\n")
        f.write("aaaaaaaaaaa_0_10\tSpeech\t2\t5\n")
    grids = parse_eval_annotations(eval_csv)
    g = grids["aaaaaaaaaaa_0_10"]
    assert g.shape == (25, 10)
    assert g[0, 2:5].all() and g[0, :2].sum() == 0  # Speech = class 0


def test_avqa_dataset_fixture(tmp_path):
    from avmoe_tpu.data.avqa import AVQADataset, build_vocabs, parse_question

    root = str(tmp_path)
    samples = [
        {"video_id": "v1", "question_content": "what is the <Object> doing?",
         "templ_values": "[' dog']", "anser": "barking", "type": "[' Audio', ' Counting']",
         "question_id": 1},
        {"video_id": "v2", "question_content": "how many <Object> are there?",
         "templ_values": "[' cats']", "anser": "two", "type": "[' Visual', ' Counting']",
         "question_id": 2},
    ]
    jpath = os.path.join(root, "train.json")
    json.dump(samples, open(jpath, "w"))

    words = parse_question(samples[0])
    assert words == ["what", "is", "the", " dog", "doing"]
    ques_vocab, ans_vocab = build_vocabs(jpath)
    assert "<pad>" == ques_vocab[0]
    assert set(ans_vocab) == {"barking", "two"}

    for vid in ("v1", "v2"):
        _write_frames(os.path.join(root, "frames", vid), [], 10,
                      pattern="{:08d}.jpg")
        os.makedirs(os.path.join(root, "wave"), exist_ok=True)
        np.save(os.path.join(root, "wave", f"{vid}.npy"),
                np.zeros((10, 100), np.float32))
    ds = AVQADataset(root, jpath, jpath, img_size=32)
    item = ds[0]
    assert item["question"].shape == (14,)
    assert item["visual_posi"].shape == (10, 32, 32, 3)
    assert item["visual_nega"].shape == (10, 32, 32, 3)
    assert item["answer"] in (0, 1)


def test_s4_dataset_fixture(tmp_path):
    from avmoe_tpu.data.avs import S4Dataset

    root = str(tmp_path)
    with open(os.path.join(root, "s4_meta_data.csv"), "w") as f:
        f.write("name,category,split\n")
        f.write("vidx,dog,train\n")
    base = os.path.join(root, "visual_frames", "train", "dog", "vidx")
    os.makedirs(base, exist_ok=True)
    for t in range(1, 6):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            os.path.join(base, f"vidx_{t}.png"))
    mbase = os.path.join(root, "gt_masks", "train", "dog", "vidx")
    os.makedirs(mbase, exist_ok=True)
    Image.fromarray((np.eye(16) * 255).astype(np.uint8)).convert("1").save(
        os.path.join(mbase, "vidx_1.png"))
    wdir = os.path.join(root, "wave", "train", "dog")
    os.makedirs(wdir, exist_ok=True)
    np.save(os.path.join(wdir, "vidx.npy"), np.zeros((5, 100), np.float32))

    ds = S4Dataset(root, "train", img_size=16, mask_size=16)
    item = ds[0]
    assert item["images"].shape == (5, 16, 16, 3)
    assert item["mask"].shape == (16, 16)  # train: first frame only
    assert item["wave"].shape == (5, 32_000)
