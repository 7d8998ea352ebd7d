"""BERT-cosine adjacency precompute, TPU-native.

Behavioral spec from reference data/preprocess/gqa/compute_adjacency_train.py:
for each image, embed each box's object-class name and attribute name with a
BERT pooled output; adj[i,j] = cos(class_i, attr_j) for j >= i (including
the diagonal), then adj += adj.T (so the diagonal ends up DOUBLED - a
reference quirk preserved), then adj /= adj.max().

Redesigned for TPU: the reference runs one BERT forward per box per image
(~72 forwards/image, millions total). Here the object/attribute VOCABULARIES
are embedded once (1600 + 400 batched forwards) and per-image adjacencies are
pure vectorized numpy gathers over the cached embeddings - identical output,
orders of magnitude less compute.

    python tools/compute_adjacency.py --obj_h5 .../train_obj36.h5 \
        --objects_vocab objects_vocab.txt --attrs_vocab attributes_vocab.txt \
        --vocab vocab.txt --bert_ckpt bert_base.pth \
        --out .../train_obj36_adj_v2.h5
"""
from __future__ import annotations

import argparse
from typing import List

import numpy as np


def embed_vocab(names: List[str], tokenizer, params, model,
                max_len: int = 16, batch_size: int = 256) -> np.ndarray:
    """Pooled BERT embedding per vocabulary name -> [len(names), hidden]."""
    import jax

    from xggm_tpu.data.tokenizer import encode_batch

    outs = []
    fwd = jax.jit(lambda p, i, m, s: model.apply(p, i, m, s,
                                                 deterministic=True)[1])
    for s in range(0, len(names), batch_size):
        chunk = names[s: s + batch_size]
        pad = batch_size - len(chunk)
        ids, mask, seg = encode_batch(tokenizer, chunk + [""] * pad, max_len)
        pooled = np.asarray(fwd(params, ids, mask, seg))
        outs.append(pooled[: len(chunk)])
    return np.concatenate(outs, axis=0)


def adjacency_from_ids(obj_ids: np.ndarray, attr_ids: np.ndarray,
                       obj_emb: np.ndarray, attr_emb: np.ndarray
                       ) -> np.ndarray:
    """36x36 class-vs-attribute cosine adjacency (reference
    compute_cosin_sim_v2, :37-44 + normalization :88)."""
    c = obj_emb[obj_ids]        # [36, H]
    a = attr_emb[attr_ids]      # [36, H]
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-6)
    an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-6)
    cos = cn @ an.T             # [36, 36]
    upper = np.triu(cos)        # j >= i, diagonal included
    adj = upper + upper.T       # diagonal doubled (reference quirk)
    return (adj / adj.max()).astype(np.float32)


def compute_adjacency(obj_h5_path: str, out_path: str,
                      obj_emb: np.ndarray, attr_emb: np.ndarray) -> int:
    import h5py

    n = 0
    with h5py.File(obj_h5_path, "r") as obj, \
            h5py.File(out_path, "w") as out:
        for img_id in obj.keys():
            g = obj[img_id]
            adj = adjacency_from_ids(
                np.asarray(g["objects_id"], np.int64),
                np.asarray(g["attrs_id"], np.int64),
                obj_emb, attr_emb)
            out.create_dataset(img_id, data=adj, dtype=np.float32)
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--obj_h5", required=True)
    p.add_argument("--objects_vocab", required=True)
    p.add_argument("--attrs_vocab", required=True)
    p.add_argument("--vocab", required=True, help="WordPiece vocab.txt")
    p.add_argument("--bert_ckpt", default=None,
                   help="bert-base-uncased torch .pth/.bin (random init "
                        "BERT if omitted - for smoke runs only)")
    p.add_argument("--out", required=True)
    p.add_argument("--layers", type=int, default=12)
    args = p.parse_args(argv)

    import jax

    from xggm_tpu.config import BertConfig
    from xggm_tpu.data.tokenizer import BertTokenizer
    from xggm_tpu.models.lxmert import BertTextModel
    from xggm_tpu.utils.cache import enable_compilation_cache
    from xggm_tpu.utils.io import load_txt_lines

    enable_compilation_cache()
    tokenizer = BertTokenizer.from_file(args.vocab)
    cfg = BertConfig(vocab_size=len(tokenizer.vocab))
    model = BertTextModel(cfg, num_layers=args.layers)
    ids = np.zeros((2, 16), np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)
    if args.bert_ckpt:
        from xggm_tpu.checkpoint.torch_bridge import (
            load_torch_state_dict, convert_bert_text, merge_into)
        sd = load_torch_state_dict(args.bert_ckpt)
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        flat = convert_bert_text(sd, args.layers, prefix)
        params, unmatched = merge_into(params, flat)
        print(f"loaded BERT: {len(flat)} tensors, {len(unmatched)} untouched")

    obj_names = load_txt_lines(args.objects_vocab)
    attr_names = load_txt_lines(args.attrs_vocab)
    print(f"embedding {len(obj_names)} object + {len(attr_names)} attribute "
          f"names...")
    obj_emb = embed_vocab(obj_names, tokenizer, params, model)
    attr_emb = embed_vocab(attr_names, tokenizer, params, model)

    n = compute_adjacency(args.obj_h5, args.out, obj_emb, attr_emb)
    print(f"wrote {n} adjacency matrices to {args.out}")


if __name__ == "__main__":
    main()
