"""Synthetic dataset factory.

Writes a miniature GQA-OOD / VQA-CP v2 dataset to disk in the EXACT on-disk
format the reference consumes (data/README.md: question jsons, answer vocab
jsons, per-image obj36 H5 groups, info json, adjacency H5) - so the real H5
readers, filtering, box normalization, tokenization, and evaluators are all
exercised without the multi-GB real corpora. Also used by tests and bench.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from xggm_tpu.utils.io import save_json

WORDS = ["what", "is", "the", "color", "of", "shape", "near", "left", "right",
         "dog", "cat", "car", "tree", "sky", "red", "blue", "small", "large",
         "on", "a"]
ANSWERS = ["yes", "no", "red", "blue", "green", "dog", "cat", "car", "left",
           "right", "one", "two", "three", "small", "large", "table"]


def write_vocab(path: str) -> List[str]:
    """Minimal BERT-style WordPiece vocab covering the synthetic questions."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS + [
        "##s", "##er", "?", ".", ","]
    # answer words appended AFTER the original table so existing token ids
    # stay stable; tools/blind_parity.py plants answers in question text
    tokens += [a for a in ANSWERS if a not in tokens]
    with open(path, "w") as f:
        f.write("\n".join(tokens) + "\n")
    return tokens


def make_synthetic_gqa(root: str, split: str = "train", n_images: int = 32,
                       n_questions: int = 96, feat_dim: int = 2048,
                       seed: int = 0) -> None:
    import h5py

    rng = np.random.RandomState(seed)
    gqa = os.path.join(root, "gqa_ood")
    feat = os.path.join(root, "gqa_imgfeat")
    os.makedirs(gqa, exist_ok=True)
    os.makedirs(feat, exist_ok=True)

    save_json(ANSWERS, os.path.join(gqa, "trainval_label2ans.json"))
    save_json({a: i for i, a in enumerate(ANSWERS)},
              os.path.join(gqa, "trainval_ans2label.json"))

    img_ids = [f"synth_{split}_{i}" for i in range(n_images)]
    info = []
    with h5py.File(os.path.join(feat, f"{split}_obj36.h5"), "w") as obj, \
            h5py.File(os.path.join(feat, f"{split}_obj36_adj_v2.h5"), "w") as adjf:
        for img_id in img_ids:
            w, h = int(rng.randint(200, 800)), int(rng.randint(200, 800))
            boxes = np.empty((36, 4), np.float32)
            x1 = rng.uniform(0, w * 0.8, 36)
            y1 = rng.uniform(0, h * 0.8, 36)
            boxes[:, 0] = x1
            boxes[:, 1] = y1
            boxes[:, 2] = x1 + rng.uniform(1, w - x1)
            boxes[:, 3] = y1 + rng.uniform(1, h - y1)
            grp = obj.create_group(img_id)
            grp.create_dataset("features",
                               data=rng.randn(36, feat_dim).astype(np.float32))
            grp.create_dataset("boxes", data=boxes)
            a = rng.rand(36, 36).astype(np.float32)
            a = (a + a.T) / 2
            a /= a.max()
            adjf.create_dataset(img_id, data=a)
            info.append({"img_id": img_id, "img_h": h, "img_w": w,
                         "num_boxes": 36})
    save_json(info, os.path.join(feat, f"{split}_obj36_info.json"))

    questions = []
    for qi in range(n_questions):
        sent = " ".join(rng.choice(WORDS, size=rng.randint(3, 10))) + " ?"
        ans = ANSWERS[rng.randint(len(ANSWERS))]
        questions.append({
            "question_id": f"q{split}{qi:05d}",
            "img_id": img_ids[qi % n_images],
            "sent": sent,
            "label": {ans: 1.0},
        })
    save_json(questions, os.path.join(gqa, f"{split}.json"))


def make_synthetic_vqacp(root: str, split: str = "train", n_images: int = 32,
                         n_questions: int = 96, feat_dim: int = 2048,
                         seed: int = 0) -> None:
    import h5py

    rng = np.random.RandomState(seed)
    vqa = os.path.join(root, "vqacpv2")
    feat = os.path.join(root, "mscoco_imgfeat")
    os.makedirs(vqa, exist_ok=True)
    os.makedirs(feat, exist_ok=True)

    save_json(ANSWERS, os.path.join(vqa, "trainval_label2ans.json"))
    save_json({a: i for i, a in enumerate(ANSWERS)},
              os.path.join(vqa, "trainval_ans2label.json"))

    img_ids = [f"coco_{split}_{i}" for i in range(n_images)]
    info = []
    with h5py.File(os.path.join(feat, f"{split}_obj36.h5"), "w") as obj, \
            h5py.File(os.path.join(feat, f"{split}_obj36_adj_v2.h5"), "w") as adjf:
        for img_id in img_ids:
            w, h = int(rng.randint(200, 800)), int(rng.randint(200, 800))
            boxes = np.empty((36, 4), np.float32)
            x1 = rng.uniform(0, w * 0.8, 36)
            y1 = rng.uniform(0, h * 0.8, 36)
            boxes[:, 0], boxes[:, 1] = x1, y1
            boxes[:, 2] = x1 + rng.uniform(1, w - x1)
            boxes[:, 3] = y1 + rng.uniform(1, h - y1)
            grp = obj.create_group(img_id)
            grp.create_dataset("features",
                               data=rng.randn(36, feat_dim).astype(np.float32))
            grp.create_dataset("boxes", data=boxes)
            a = rng.rand(36, 36).astype(np.float32)
            a = (a + a.T) / 2
            a /= a.max()
            adjf.create_dataset(img_id, data=a)
            info.append({"img_id": img_id, "img_h": h, "img_w": w,
                         "num_boxes": 36})
    save_json(info, os.path.join(feat, f"{split}_obj36_info.json"))

    annotations = []
    for qi in range(n_questions):
        sent = " ".join(rng.choice(WORDS, size=rng.randint(3, 10))) + " ?"
        aid = int(rng.randint(len(ANSWERS)))
        annotations.append({
            "question_id": int(qi),
            "image_id": img_ids[qi % n_images],
            "question": sent,
            "label": [aid],
            "score": [1.0],
        })
    save_json(annotations, os.path.join(vqa, f"{split}_annotations.json"))
