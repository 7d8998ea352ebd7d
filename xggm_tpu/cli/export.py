"""Export a trained checkpoint as a self-contained serving artifact.

    xggm-export --task gqa --valid val --load snap/BEST --artifact art/
    xggm-serve  --artifact art/ --data_root data --split val

Loads through the same checkpoint ladder as the task CLIs (--load orbax/.pth,
--load_lxmert, --load_lxmert_qa), then writes a jax.export artifact
(serving/artifact.py) that serves without model code.
"""
from __future__ import annotations

import os

from xggm_tpu.cli.common import (build_parser, to_config, seed_everything,
                                 configure_prng)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--task", default="gqa", choices=["gqa", "vqa"])
    parser.add_argument("--artifact", required=True,
                        help="output artifact directory")
    parser.add_argument("--serve_bs", default=16, type=int,
                        help="exported static batch size; 0 = symbolic "
                             "batch dimension (compiles per shape at call)")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated jax.export lowering platforms")
    parser.add_argument("--fp32_weights", action="store_const", default=False,
                        const=True,
                        help="export fp32 masters instead of the bf16 "
                             "shadow layout trainer.predict reads")
    parser.add_argument("--quantize", default=None, choices=["int8"],
                        help="post-training quantization of Dense kernels "
                             "(per-channel int8 weights + dynamic int8 "
                             "activations; v5e MXU int8 GEMMs run 2x bf16)")
    args = parser.parse_args(argv)
    seed_everything(args.seed)
    configure_prng(args)
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.synthetic:
        from xggm_tpu.data.synthetic import (
            make_synthetic_gqa, make_synthetic_vqacp, write_vocab)
        make = make_synthetic_gqa if args.task == "gqa" else make_synthetic_vqacp
        make(args.data_root, args.valid or args.test or "val")
        write_vocab(os.path.join(args.data_root, "vocab.txt"))

    # answer vocab comes from one split; don't build a training set
    args.train = ""
    args.valid = args.valid or args.test or "val"
    cfg = to_config(args, task=args.task)

    from xggm_tpu.training.trainer import XGGMTrainer
    trainer = XGGMTrainer(cfg, task=args.task)

    for attr in ("load", "load_lxmert", "load_lxmert_qa"):
        if getattr(args, attr) == "":
            setattr(args, attr, None)
    if args.load is not None:
        trainer.load(args.load)
    elif args.load_lxmert is not None:
        trainer.load_lxmert(args.load_lxmert)
    elif args.load_lxmert_qa is not None:
        all_ans = args.all_ans or os.path.join(args.data_root, "lxmert",
                                               "all_ans.json")
        trainer.load_lxmert_qa(args.load_lxmert_qa, all_ans)

    from xggm_tpu.serving import export_model
    path = export_model(
        trainer.model, trainer.params, args.artifact,
        batch_size=None if args.serve_bs == 0 else args.serve_bs,
        label2ans=trainer.label2ans,
        platforms=tuple(p.strip() for p in args.platforms.split(",")),
        bf16_weights=not args.fp32_weights,
        quantize=args.quantize,
        notes={"task": args.task, "load": args.load,
               "load_lxmert": args.load_lxmert,
               "load_lxmert_qa": args.load_lxmert_qa})
    size = sum(os.path.getsize(os.path.join(path, f)) for f in os.listdir(path))
    print(f"exported artifact: {path} ({size / 1e6:.1f} MB, "
          f"bs={args.serve_bs or 'symbolic'}, platforms={args.platforms})")


if __name__ == "__main__":
    main()
