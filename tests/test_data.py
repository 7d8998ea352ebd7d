"""Data layer: synthetic corpora in reference on-disk format -> datasets,
feeder, evaluators, tokenizer."""
import os

import numpy as np
import pytest

from xggm_tpu.config import DataConfig
from xggm_tpu.data.datasets import (
    GQADataset, VQACPDataset, GraphBatchDataset, GQAEvaluator, VQAEvaluator,
    oracle_score,
)
from xggm_tpu.data.feeder import Feeder
from xggm_tpu.data.synthetic import (
    make_synthetic_gqa, make_synthetic_vqacp, write_vocab, ANSWERS,
)
from xggm_tpu.data.tokenizer import BertTokenizer, make_test_vocab


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    make_synthetic_gqa(root, "train", n_images=8, n_questions=24, feat_dim=64)
    make_synthetic_vqacp(root, "train", n_images=8, n_questions=24, feat_dim=64)
    vocab_path = os.path.join(root, "vocab.txt")
    write_vocab(vocab_path)
    return root


@pytest.fixture(scope="module")
def tokenizer(data_root):
    return BertTokenizer.from_file(os.path.join(data_root, "vocab.txt"))


def test_tokenizer_roundtrip(tokenizer):
    toks = tokenizer.tokenize("What is the COLOR of the dog?")
    assert toks[-1] == "?"
    assert "color" in toks
    ids, mask, seg = tokenizer.encode("what is the color", 20)
    assert len(ids) == 20 and ids[0] == tokenizer.vocab["[CLS]"]
    assert sum(mask) == 6  # CLS + 4 words + SEP
    assert all(s == 0 for s in seg)


def test_tokenizer_wordpiece_semantics():
    tok = BertTokenizer(make_test_vocab())
    # greedy longest-match with ## continuation (classic BERT example)
    assert tok.tokenize("unwanted running") == \
        ["un", "##want", "##ed", "run", "##ning"]
    # word not coverable by pieces -> [UNK]
    assert tok.tokenize("zzzz") == ["[UNK]"]
    assert tok.tokenize("what's")[0] == "what"
    # punctuation splitting + lowercase + accent strip
    assert tok.tokenize("Café,dog")[-1] == "dog"


def test_gqa_dataset_and_feeder(data_root, tokenizer):
    cfg = DataConfig(data_root=data_root)
    dset = GQADataset("train", cfg)
    assert dset.num_answers == len(ANSWERS)
    gbd = GraphBatchDataset(dset, tokenizer)
    assert len(gbd) == 24  # one label each, all in vocab
    batch = gbd.get_batch([0, 1, 2])
    assert batch["feats"].shape == (3, 36, 64)
    assert batch["boxes"].shape == (3, 36, 4)
    assert batch["boxes"].max() <= 1 + 1e-5 and batch["boxes"].min() >= -1e-5
    assert batch["adj"].shape == (3, 36, 36)
    np.testing.assert_allclose(batch["adj"], batch["adj"].transpose(0, 2, 1))
    assert batch["target"].shape == (3, len(ANSWERS))

    feeder = Feeder(gbd, batch_size=10, shuffle=True, drop_last=False)
    batches = list(feeder)
    assert len(batches) == 3
    qids, b, mask = batches[-1]
    # padded final batch: 24 = 10+10+4
    assert len(qids) == 4 and mask.sum() == 4
    assert b["feats"].shape[0] == 10

    feeder_drop = Feeder(gbd, batch_size=10, shuffle=True, drop_last=True)
    assert len(list(feeder_drop)) == 2


def test_gqa_evaluator(data_root, tokenizer):
    cfg = DataConfig(data_root=data_root)
    dset = GQADataset("train", cfg)
    ev = GQAEvaluator(dset)
    # predicting the gold answer for every question scores 1.0
    gold = {d["question_id"]: next(iter(d["label"])) for d in dset.data}
    assert ev.evaluate(gold) == pytest.approx(1.0)
    wrong = {q: ("no" if a != "no" else "yes") for q, a in gold.items()}
    assert ev.evaluate(wrong) == pytest.approx(0.0)


def test_vqacp_dataset_and_evaluator(data_root, tokenizer):
    cfg = DataConfig(data_root=data_root)
    dset = VQACPDataset("train", cfg)
    gbd = GraphBatchDataset(dset, tokenizer)
    assert len(gbd) == 24
    batch = gbd.get_batch(list(range(5)))
    assert batch["target"].shape == (5, len(ANSWERS))
    ev = VQAEvaluator(dset)
    gold = {d["question_id"]: ANSWERS[d["label"][0]] for d in dset.data}
    assert ev.evaluate(gold) == pytest.approx(1.0)
    assert oracle_score(gbd) == pytest.approx(1.0)


def test_tiny_mode(data_root, tokenizer, monkeypatch):
    cfg = DataConfig(data_root=data_root, tiny=True)
    dset = GQADataset("train", cfg)
    gbd = GraphBatchDataset(dset, tokenizer)
    assert len(gbd) == 24  # tiny caps at 512, dataset smaller

    # with a cap below the dataset size, tiny truncates the post-filter
    # question records (reference gqa_ood_data.py:98-99)
    import xggm_tpu.data.datasets as D
    monkeypatch.setattr(D, "TINY_IMG_NUM", 7)
    gbd = GraphBatchDataset(dset, tokenizer)
    assert len(gbd) == 7

    # --fast computes a topk in the reference but never applies it to task
    # datasets (gqa_ood_data.py:62-63 vs :98): full size expected
    cfg = DataConfig(data_root=data_root, fast=True)
    gbd = GraphBatchDataset(GQADataset("train", cfg), tokenizer)
    assert len(gbd) == 24


def test_tokenizer_never_split():
    vocab = make_test_vocab()
    tok = BertTokenizer(vocab)
    # special tokens survive basic tokenization verbatim: no lowercasing,
    # no punctuation splitting (reference src/lxrt/tokenization.py:174-224)
    assert tok.tokenize("what [SEP] dog") == ["what", "[SEP]", "dog"]
    assert tok.tokenize("[MASK]") == ["[MASK]"]
    # a non-special bracketed word still splits on punctuation:
    # '[', ']' aren't vocab entries so they come back as [UNK] pieces
    assert tok.tokenize("[dog]") == ["[UNK]", "dog", "[UNK]"]
    ids = tok.convert_tokens_to_ids(tok.tokenize("what [SEP]"))
    assert ids[-1] == vocab["[SEP]"]


def test_feeder_edge_cases(data_root, tokenizer):
    cfg = DataConfig(data_root=data_root)
    dset = GQADataset("train", cfg)
    gbd = GraphBatchDataset(dset, tokenizer)

    # batch larger than the dataset: one padded batch
    feeder = Feeder(gbd, batch_size=64, shuffle=False, drop_last=False)
    batches = list(feeder)
    assert len(batches) == 1
    qids, b, mask = batches[0]
    assert len(qids) == 24 and mask.sum() == 24
    assert b["feats"].shape[0] == 64

    # drop_last with bs > len: zero batches
    assert len(list(Feeder(gbd, batch_size=64, shuffle=False,
                           drop_last=True))) == 0

    # shuffling differs across epochs but is seeded-deterministic
    f1 = Feeder(gbd, batch_size=8, shuffle=True, seed=1)
    e1 = [qids for qids, _, _ in f1]
    e2 = [qids for qids, _, _ in f1]  # second epoch, same feeder
    assert e1 != e2
    f2 = Feeder(gbd, batch_size=8, shuffle=True, seed=1)
    assert e1 == [qids for qids, _, _ in f2]


def test_feeder_surfaces_producer_errors(data_root, tokenizer):
    """A failure on the producer thread must raise in the consumer, not
    silently truncate the epoch (regression: the thread swallowed it)."""
    import pytest

    cfg = DataConfig(data_root=data_root)
    dset = GQADataset("train", cfg)
    gbd = GraphBatchDataset(dset, tokenizer)

    real = gbd.get_batch
    calls = {"n": 0}

    def flaky(indices):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("corrupt feature record")
        return real(indices)

    gbd.get_batch = flaky
    feeder = Feeder(gbd, batch_size=8, shuffle=False)
    with pytest.raises(RuntimeError, match="producer thread failed"):
        for _ in feeder:
            pass


def test_prefetcher_pull_api(data_root, tokenizer):
    """Reference DataPrefetcher semantics (src/tools/data_loader.py:13-31):
    eager one-batch lookahead, .next() pulls, None once exhausted."""
    from xggm_tpu.data.feeder import Prefetcher

    cfg = DataConfig(data_root=data_root)
    gbd = GraphBatchDataset(GQADataset("train", cfg), tokenizer)
    feeder = Feeder(gbd, batch_size=8, shuffle=False, drop_last=True)
    pf = Prefetcher(feeder)
    seen = []
    while True:
        item = pf.next()
        if item is None:
            break
        seen.append(item[0])
    assert len(seen) == len(feeder) == 3
    assert pf.next() is None  # stays exhausted
    # same batches, same order as plain iteration
    assert seen == [qids for qids, _, _ in
                    Feeder(gbd, batch_size=8, shuffle=False, drop_last=True)]


def test_multi_epochs_feeder(data_root, tokenizer):
    """Reference MultiEpochsDataLoader semantics (src/tools/data_loader.py:
    34-56): one persistent producer streams across epochs; each __iter__
    yields exactly one epoch, and per-epoch ordering matches the plain
    Feeder's (seed + epoch shuffle stream)."""
    from xggm_tpu.data.feeder import MultiEpochsFeeder

    cfg = DataConfig(data_root=data_root)
    gbd = GraphBatchDataset(GQADataset("train", cfg), tokenizer)
    mef = MultiEpochsFeeder(gbd, batch_size=8, shuffle=True, seed=3)
    e1 = [qids for qids, _, _ in mef]
    thread_after_e1 = mef._thread
    e2 = [qids for qids, _, _ in mef]
    assert len(e1) == len(e2) == len(mef) == 3
    assert e1 != e2  # shuffle advances across epochs
    assert mef._thread is thread_after_e1  # no per-epoch thread respawn
    ref = Feeder(gbd, batch_size=8, shuffle=True, seed=3)
    assert e1 == [qids for qids, _, _ in ref]
    assert e2 == [qids for qids, _, _ in ref]
