"""Task datasets: GQA-OOD and VQA-CP v2.

Behavioral spec from reference src/gqa/gqa_ood_data.py:21-186 and
src/vqa/vqacpv2_data.py:26-166. The on-disk contract is identical to the
reference (data/README.md):

  {root}/gqa_ood/{split}.json                     question records
  {root}/gqa_ood/trainval_ans2label.json          answer vocab
  {root}/gqa_imgfeat/{split}_obj36.h5             per-image groups with
                                                  'features' [36,2048],
                                                  'boxes' [36,4]
  {root}/gqa_imgfeat/{split}_obj36_info.json      img_h/img_w/num_boxes
  {root}/gqa_imgfeat/{split}_obj36_adj_v2.h5      [36,36] BERT-cosine adj
  (vqacpv2 mirrors with {split}_annotations.json and mscoco_imgfeat/)

TPU-first redesign vs the reference:
  * Tokenization happens ONCE at dataset construction (the reference
    re-tokenizes every batch inside model.forward, entry.py:110-119).
  * __getitem__-per-example h5py reads + torch DataLoader workers are
    replaced by vectorized `get_batch(indices)` assembly over a feature
    store, feeding the double-buffered device feeder (feeder.py).
  * All outputs are fixed-shape numpy arrays -> zero recompilation.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from xggm_tpu.config import DataConfig, MAX_SEQ_LENGTH, NUM_OBJECTS
from xggm_tpu.data.tokenizer import BertTokenizer, encode_batch
from xggm_tpu.utils.io import load_json

TINY_IMG_NUM = 512   # reference gqa_ood_data.py:15
FAST_IMG_NUM = 5000  # reference gqa_ood_data.py:16


class H5FeatureStore:
    """Random-access obj36 features/boxes (+ optional adjacency) by img_id
    (reference gqa_ood_data.py:69-79)."""

    def __init__(self, obj_h5_path: str, info_json_path: str,
                 adj_h5_path: Optional[str] = None):
        import h5py

        self.obj_h5 = h5py.File(obj_h5_path, "r")
        info = load_json(info_json_path)
        self.info = {d["img_id"]: d for d in info}
        self.adj_h5 = h5py.File(adj_h5_path, "r") if adj_h5_path else None

    def has(self, img_id: str) -> bool:
        return img_id in self.info

    def img_ids(self) -> List[str]:
        return list(self.info.keys())

    def get(self, img_id: str):
        """Returns (feats [36,2048] f32, boxes01 [36,4] f32, adj [36,36] f32).

        Boxes normalized to [0,1] by image size with the reference's bounds
        assertions (gqa_ood_data.py:120-127)."""
        grp = self.obj_h5[str(img_id)]
        feats = np.asarray(grp["features"], dtype=np.float32)
        boxes = np.asarray(grp["boxes"], dtype=np.float32).copy()
        meta = self.info[img_id]
        assert len(boxes) == len(feats) == meta["num_boxes"]
        boxes[:, (0, 2)] /= meta["img_w"]
        boxes[:, (1, 3)] /= meta["img_h"]
        np.testing.assert_array_less(boxes, 1 + 1e-5)
        np.testing.assert_array_less(-boxes, 0 + 1e-5)
        if self.adj_h5 is not None:
            adj = np.asarray(self.adj_h5[str(img_id)], dtype=np.float32)
        else:
            adj = np.zeros((feats.shape[0], feats.shape[0]), np.float32)
        return feats, boxes, adj


@dataclass
class QuestionRecord:
    question_id: object  # str for GQA, int for VQA (reference §3.2 note 5)
    img_id: str
    sent: str
    target: Optional[np.ndarray]  # [num_answers] soft scores, None at test
    label_dict: Optional[dict]    # raw label info for evaluators


class VQABaseDataset:
    """Shared question-side logic for both tasks."""

    def __init__(self, splits: str, data_cfg: DataConfig):
        self.name = splits
        self.splits = splits.split(",")
        self.cfg = data_cfg
        self.data: List[dict] = []
        self.ans2label: Dict[str, int] = {}
        self.label2ans: List[str] = []

    @property
    def num_answers(self) -> int:
        return len(self.ans2label)

    def __len__(self) -> int:
        return len(self.data)

    def _check_vocab(self):
        assert len(self.ans2label) == len(self.label2ans)
        for ans, label in self.ans2label.items():
            assert self.label2ans[label] == ans


class GQADataset(VQABaseDataset):
    """GQA-OOD questions (reference GQADataset, gqa_ood_data.py:21-52)."""

    def __init__(self, splits: str, data_cfg: DataConfig):
        super().__init__(splits, data_cfg)
        root = os.path.join(data_cfg.data_root, "gqa_ood")
        for split in self.splits:
            self.data.extend(load_json(os.path.join(root, f"{split}.json")))
        self.id2datum = {d["question_id"]: d for d in self.data}
        self.ans2label = load_json(os.path.join(root, "trainval_ans2label.json"))
        self.label2ans = load_json(os.path.join(root, "trainval_label2ans.json"))
        self._check_vocab()

    def feature_store(self) -> H5FeatureStore:
        root = os.path.join(self.cfg.data_root, "gqa_imgfeat")
        s = self.splits[0]
        return H5FeatureStore(
            os.path.join(root, f"{s}_obj36.h5"),
            os.path.join(root, f"{s}_obj36_info.json"),
            os.path.join(root, f"{s}_obj36_adj_v2.h5"),
        )

    def records(self, store: H5FeatureStore) -> List[QuestionRecord]:
        """Filter to answerable+featured data (reference
        gqa_ood_data.py:92-96: keeps a copy per in-vocab answer)."""
        out = []
        for datum in self.data:
            if "label" in datum:
                for ans, _score in datum["label"].items():
                    if ans in self.ans2label and store.has(datum["img_id"]):
                        target = np.zeros(self.num_answers, np.float32)
                        for a, s in datum["label"].items():
                            if a in self.ans2label:
                                target[self.ans2label[a]] = s
                        out.append(QuestionRecord(
                            datum["question_id"], datum["img_id"],
                            datum["sent"], target, datum["label"]))
            elif store.has(datum["img_id"]):
                out.append(QuestionRecord(
                    datum["question_id"], datum["img_id"], datum["sent"],
                    None, None))
        return out


class VQACPDataset(VQABaseDataset):
    """VQA-CP v2 questions (reference VQADataset, vqacpv2_data.py:26-52)."""

    def __init__(self, splits: str, data_cfg: DataConfig):
        super().__init__(splits, data_cfg)
        root = os.path.join(data_cfg.data_root, "vqacpv2")
        self.data = load_json(os.path.join(root, f"{self.name}_annotations.json"))
        self.id2datum = {d["question_id"]: d for d in self.data}
        self.ans2label = load_json(os.path.join(root, "trainval_ans2label.json"))
        self.label2ans = load_json(os.path.join(root, "trainval_label2ans.json"))
        self._check_vocab()

    def feature_store(self) -> H5FeatureStore:
        root = os.path.join(self.cfg.data_root, "mscoco_imgfeat")
        s = self.splits[0]
        # adjacency only exists for train/dev_test (vqacpv2_data.py:77-80)
        adj = os.path.join(root, f"{s}_obj36_adj_v2.h5")
        return H5FeatureStore(
            os.path.join(root, f"{s}_obj36.h5"),
            os.path.join(root, f"{s}_obj36_info.json"),
            adj if os.path.exists(adj) else None,
        )

    def records(self, store: H5FeatureStore) -> List[QuestionRecord]:
        """Keep data with features (reference vqacpv2_data.py:82-88); labels
        are parallel id/score lists (:122-123)."""
        out = []
        for datum in self.data:
            img_id = datum["image_id"]
            if not store.has(img_id):
                continue
            target = None
            label_dict = None
            if "label" in datum:
                target = np.zeros(self.num_answers, np.float32)
                for aid, score in zip(datum["label"], datum["score"]):
                    target[aid] = score
                label_dict = dict(zip(datum["label"], datum["score"]))
            out.append(QuestionRecord(
                datum["question_id"], img_id, datum["question"], target,
                label_dict))
        return out


class GraphBatchDataset:
    """Joined, pre-tokenized, fixed-shape batch assembler - the
    TorchDataset+DataLoader replacement."""

    def __init__(self, dataset: VQABaseDataset, tokenizer: BertTokenizer,
                 max_seq_length: int = MAX_SEQ_LENGTH, store=None):
        self.raw = dataset
        # `store` may be any feature store (e.g. the native
        # XPackFeatureStore, xggm_tpu/data/xpack.py); defaults to H5.
        self.store = store if store is not None else dataset.feature_store()
        self.records = dataset.records(self.store)

        # --tiny subset mode: truncate to the first TINY_IMG_NUM question
        # records *after* the in-vocab/feature filtering, exactly as the
        # reference does (gqa_ood_data.py:98-99, vqacpv2_data.py:87-88).
        # --fast computes a topk in the reference but never applies it to
        # task datasets (only the pretrain path subsets by image) - keep
        # that behavior so subset sizes match.
        if dataset.cfg.tiny:
            self.records = self.records[:TINY_IMG_NUM]

        # Tokenize once, up front.
        ids, mask, seg = encode_batch(
            tokenizer, (r.sent for r in self.records), max_seq_length)
        self.input_ids, self.input_mask, self.segment_ids = ids, mask, seg

        self.num_answers = dataset.num_answers
        self.has_targets = all(r.target is not None for r in self.records)

    def __len__(self) -> int:
        return len(self.records)

    def question_ids(self, indices: Sequence[int]) -> List[object]:
        return [self.records[i].question_id for i in indices]

    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        n = len(indices)
        if hasattr(self.store, "get_batch"):
            # native xpack path: one parallel gather for the whole batch
            rec = self.store.get_batch(
                [self.records[i].img_id for i in indices])
            feats, boxes, adj = rec["feats"], rec["boxes"], rec["adj"]
        else:
            feats = np.empty((n, NUM_OBJECTS, self.store_feat_dim), np.float32)
            boxes = np.empty((n, NUM_OBJECTS, 4), np.float32)
            adj = np.empty((n, NUM_OBJECTS, NUM_OBJECTS), np.float32)
            for k, i in enumerate(indices):
                f, b, a = self.store.get(self.records[i].img_id)
                feats[k], boxes[k], adj[k] = f, b, a
        batch = {
            "input_ids": self.input_ids[indices],
            "input_mask": self.input_mask[indices],
            "segment_ids": self.segment_ids[indices],
            "feats": feats,
            "boxes": boxes,
            "adj": adj,
        }
        if self.has_targets:
            tgt = np.stack([self.records[i].target for i in indices])
            batch["target"] = tgt.astype(np.float32)
        return batch

    @property
    def store_feat_dim(self) -> int:
        if not hasattr(self, "_feat_dim"):
            f, _, _ = self.store.get(self.records[0].img_id)
            self._feat_dim = f.shape[-1]
        return self._feat_dim


class GQAEvaluator:
    """Soft-score accuracy + challenge dump (reference GQAEvaluator,
    gqa_ood_data.py:150-186)."""

    def __init__(self, dataset: GQADataset):
        self.dataset = dataset

    def evaluate(self, quesid2ans: Dict[object, str]) -> float:
        score = 0.0
        for quesid, ans in quesid2ans.items():
            datum = self.dataset.id2datum[quesid]
            if ans in datum["label"]:
                score += datum["label"][ans]
        return score / len(quesid2ans)

    @staticmethod
    def dump_result(quesid2ans: Dict[object, str], path: str) -> None:
        import json

        result = [{"questionId": q, "prediction": a}
                  for q, a in quesid2ans.items()]
        with open(path, "w") as f:
            json.dump(result, f, indent=4, sort_keys=True)


class VQAEvaluator:
    """Soft-score accuracy + submission dump (reference VQAEvaluator,
    vqacpv2_data.py:130-166)."""

    def __init__(self, dataset: VQACPDataset):
        self.dataset = dataset

    def evaluate(self, quesid2ans: Dict[object, str]) -> float:
        score = 0.0
        for quesid, ans in quesid2ans.items():
            datum = self.dataset.id2datum[quesid]
            label = dict(zip(datum["label"], datum["score"]))
            aid = self.dataset.ans2label[ans]
            if aid in label:
                score += label[aid]
        return score / len(quesid2ans)

    @staticmethod
    def dump_result(quesid2ans: Dict[object, str], path: str) -> None:
        import json

        result = [{"question_id": q, "answer": a}
                  for q, a in quesid2ans.items()]
        with open(path, "w") as f:
            json.dump(result, f, indent=4, sort_keys=True)


def oracle_score(dataset: GraphBatchDataset) -> float:
    """Upper-bound accuracy from gold labels (reference gqa_ood.py:410-419)."""
    total = 0.0
    for r in dataset.records:
        if r.target is not None and r.target.size:
            total += float(np.max(r.target))
    return total / max(len(dataset), 1)
