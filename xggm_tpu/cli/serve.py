"""Serve an exported artifact over HTTP.

    xggm-serve --artifact art/ --data_root data --task gqa --split val \
               --port 8000

The artifact (xggm-export) brings the compiled graph + weights + answer
vocab; this process adds the tokenizer and the obj36 feature store and
answers {"queries": [{"img_id", "sent"}]} POSTs on /predict.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--task", default="gqa", choices=["gqa", "vqa"])
    p.add_argument("--data_root", default="data")
    p.add_argument("--split", default="val",
                   help="feature split: {data_root}/{task}_imgfeat/"
                        "{split}_obj36.h5")
    p.add_argument("--vocab", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8000, type=int)
    p.add_argument("--device", default=None, choices=["cpu", "tpu"])
    p.add_argument("--synthetic", action="store_const", default=False,
                   const=True, help="generate a synthetic corpus first")
    args = p.parse_args(argv)

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.synthetic:
        from xggm_tpu.data.synthetic import (
            make_synthetic_gqa, make_synthetic_vqacp, write_vocab)
        make = make_synthetic_gqa if args.task == "gqa" else make_synthetic_vqacp
        make(args.data_root, args.split)
        write_vocab(os.path.join(args.data_root, "vocab.txt"))

    from xggm_tpu.data.datasets import H5FeatureStore
    from xggm_tpu.data.tokenizer import BertTokenizer
    from xggm_tpu.serving import ServingModel
    from xggm_tpu.serving.server import InferenceEngine, make_server

    sub = "gqa_imgfeat" if args.task == "gqa" else "mscoco_imgfeat"
    root = os.path.join(args.data_root, sub)
    store = H5FeatureStore(
        os.path.join(root, f"{args.split}_obj36.h5"),
        os.path.join(root, f"{args.split}_obj36_info.json"))
    tokenizer = BertTokenizer.from_file(
        args.vocab or os.path.join(args.data_root, "vocab.txt"))
    model = ServingModel.load(args.artifact)

    engine = InferenceEngine(model, tokenizer, store)
    server = make_server(engine, args.host, args.port)
    print(f"serving {args.artifact} on http://{args.host}:{args.port} "
          f"(bs={model.batch_size}, {model.meta['num_answers']} answers)",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
