"""Synthetic LXMERT pretraining corpus in the reference's on-disk format
(data/lxmert/{source}.json + all_ans.json + per-source obj36 feature H5)."""
from __future__ import annotations

import os
from typing import List

import numpy as np

from xggm_tpu.data.synthetic import WORDS, ANSWERS, write_vocab
from xggm_tpu.utils.io import save_json


def make_synthetic_pretrain(root: str, source: str = "mscoco_train",
                            n_images: int = 16, sents_per_img: int = 3,
                            feat_dim: int = 2048, seed: int = 0) -> None:
    import h5py

    rng = np.random.RandomState(seed)
    lx = os.path.join(root, "lxmert")
    featdir = os.path.join(root, "lxmert_imgfeat")
    os.makedirs(lx, exist_ok=True)
    os.makedirs(featdir, exist_ok=True)

    save_json([{"ans": a, "dsets": ["vqa", "gqa"]} for a in ANSWERS],
              os.path.join(lx, "all_ans.json"))
    write_vocab(os.path.join(root, "vocab.txt"))

    img_ids = [f"pt_{source}_{i}" for i in range(n_images)]
    data = []
    info = []
    with h5py.File(os.path.join(featdir, f"{source}_obj36.h5"), "w") as f:
        for img_id in img_ids:
            w, h = int(rng.randint(200, 600)), int(rng.randint(200, 600))
            x1 = rng.uniform(0, w * 0.8, 36)
            y1 = rng.uniform(0, h * 0.8, 36)
            boxes = np.stack([x1, y1, x1 + rng.uniform(1, w - x1),
                              y1 + rng.uniform(1, h - y1)], axis=1
                             ).astype(np.float32)
            g = f.create_group(img_id)
            g.create_dataset("features",
                             data=rng.randn(36, feat_dim).astype(np.float32))
            g.create_dataset("boxes", data=boxes)
            g.create_dataset("objects_id",
                             data=rng.randint(0, 1600, 36).astype(np.int64))
            g.create_dataset("objects_conf",
                             data=rng.rand(36).astype(np.float32))
            g.create_dataset("attrs_id",
                             data=rng.randint(0, 400, 36).astype(np.int64))
            g.create_dataset("attrs_conf",
                             data=rng.rand(36).astype(np.float32))
            info.append({"img_id": img_id, "img_h": h, "img_w": w,
                         "num_boxes": 36})

            sents: List[str] = [
                " ".join(rng.choice(WORDS, size=rng.randint(3, 9)))
                for _ in range(sents_per_img)]
            qa_sents = [
                " ".join(rng.choice(WORDS, size=rng.randint(3, 9))) + " ?"
                for _ in range(sents_per_img)]
            labels = [{ANSWERS[rng.randint(len(ANSWERS))]: 1.0}
                      for _ in range(sents_per_img)]
            data.append({
                "img_id": img_id,
                "sentf": {"mscoco": sents, "vqa": qa_sents},
                "labelf": {"vqa": labels},
            })
    save_json(info, os.path.join(featdir, f"{source}_obj36_info.json"))
    save_json(data, os.path.join(lx, f"{source}.json"))
