"""Tokenizer cross-check against the reference BertTokenizer imported live
(reference src/lxrt/tokenization.py:72-388): identical token streams, ids,
and padded/CLS/SEP-framed features over adversarial text."""
import os
import sys
import types

import numpy as np
import pytest

REF = os.environ.get("XGGM_REFERENCE_PATH", "/root/reference")

requires_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted")


def _stub(name, **attrs):
    if name not in sys.modules:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m


@pytest.fixture(scope="module")
def ref_tokenization():
    _stub("boto3")
    _stub("botocore")
    _stub("botocore.exceptions", ClientError=Exception)
    _stub("requests")
    if os.path.join(REF, "src") not in sys.path:
        sys.path.insert(0, os.path.join(REF, "src"))
    import lxrt.tokenization as T

    return T


VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "a", "dog", "cat", "is", "on", "in", "what", "color", "of",
    "run", "##ning", "##ner", "un", "##aff", "##able", "##s", "##ing",
    "cafe", "##teria", "naive", "over", "##react", "##ed",
    "!", "?", ",", ".", "'", '"', "-", "(", ")", "[", "]", "$", "%", "&",
    "1", "2", "3", "##1", "##2", "##3", "10", "##0",
    "中", "国", "学", "##生",
    "e", "##x", "##a", "##m", "##p", "##l", "##e",
    "photo", "##graph", "##er", "play", "##ground",
]

SENTENCES = [
    "What color is the dog?",
    "the cat is running on the playground",
    "unaffable",                       # multi-piece word
    "café",                            # accent strip -> cafe
    "naïve overreacted",
    "中国学生 runs",                    # CJK chars split individually
    "hello-world (example) [bracket]",  # punct splits; unknown words
    "  leading and trailing   spaces  ",
    "",                                # empty
    "   ",                             # whitespace only
    "!!!???...,,,",                    # punctuation runs
    "$10 & 23%",
    "a" * 120,                         # >100-char word -> [UNK]
    "x" + "y" * 99,                    # exactly 100 chars
    "[MASK] the [SEP] dog",            # never-split specials survive basic
    "DOG Cat THE",                     # lowercasing
    "don't stop",                      # apostrophe split
    "­soft­hyphen",          # control-ish chars
    "tab\tand\nnewline separators",
    "éclair",                    # combining accent
]


def _rand_sentences(rng, n=300):
    words = ["the", "dog", "cat", "running", "unaffable", "café", "naïve",
             "photographer", "playground", "中国", "example", "don't",
             "over-reacted", "$10", "23%", "zzzzz", "...", "!?", "a" * 101,
             "[MASK]", "(in)", "THE"]
    outs = []
    for _ in range(n):
        k = rng.randint(1, 9)
        outs.append(" ".join(words[i] for i in
                             rng.randint(0, len(words), k)))
    return outs


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


@requires_reference
def test_tokenizer_stream_parity(ref_tokenization, vocab_file):
    """Token streams and id sequences must match the reference exactly over
    hand-picked adversarial text plus 300 random word-salad sentences."""
    from xggm_tpu.data.tokenizer import BertTokenizer

    ref = ref_tokenization.BertTokenizer(vocab_file)
    ours = BertTokenizer.from_file(vocab_file)

    rng = np.random.RandomState(5)
    for sent in SENTENCES + _rand_sentences(rng):
        rt = ref.tokenize(sent)
        ot = ours.tokenize(sent)
        assert ot == rt, f"tokens diverge on {sent!r}: {ot} vs {rt}"
        assert ours.convert_tokens_to_ids(ot) == \
            ref.convert_tokens_to_ids(rt), f"ids diverge on {sent!r}"


@requires_reference
def test_encode_matches_convert_sents_to_features(ref_tokenization,
                                                 vocab_file):
    """Our pipeline-side encode() must reproduce the reference's
    convert_sents_to_features framing (reference src/lxrt/entry.py:37-72):
    strip -> tokenize -> truncate to max-2 -> [CLS]/[SEP] -> pad 0."""
    from xggm_tpu.data.tokenizer import BertTokenizer

    ref = ref_tokenization.BertTokenizer(vocab_file)
    ours = BertTokenizer.from_file(vocab_file)
    max_len = 20

    def ref_features(sent):
        toks = ref.tokenize(sent.strip())[: max_len - 2]
        toks = ["[CLS]"] + toks + ["[SEP]"]
        ids = ref.convert_tokens_to_ids(toks)
        mask = [1] * len(ids)
        pad = [0] * (max_len - len(ids))
        return ids + pad, mask + pad, [0] * max_len

    rng = np.random.RandomState(11)
    for sent in SENTENCES + _rand_sentences(rng, 100):
        ids, mask, seg = ours.encode(sent, max_len)
        rids, rmask, rseg = ref_features(sent)
        assert list(ids) == rids, sent
        assert list(mask) == rmask, sent
        assert list(seg) == rseg, sent
