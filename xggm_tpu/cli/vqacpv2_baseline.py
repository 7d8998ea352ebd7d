"""VQA-CP v2 plain-BCE baseline (reference src/vqa/vqacpv2_baseline.py:67-339):
same model, no GGM phase - one forward + one optimizer step per batch, a
single param group at base lr, t_total = steps (not 2x)."""
from __future__ import annotations

import os

from xggm_tpu.cli.common import (
    build_parser, to_config, seed_everything, configure_prng,
    make_mesh_if_requested,
    dump_args,
)


def main(argv=None):
    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    configure_prng(args)
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    cfg = to_config(args, task="vqa")
    # baseline: single group (downstream mult 1), t_total = 1x steps
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, downstream_lr_mult=1.0, t_total_mult=1.0))
    mesh = make_mesh_if_requested(args)

    if args.synthetic:
        from xggm_tpu.cli.common import generate_synthetic_once
        from xggm_tpu.data.synthetic import make_synthetic_vqacp, write_vocab

        def _gen():
            for i, split in enumerate(sorted({args.train, args.valid,
                                              args.test} - {None, ""})):
                make_synthetic_vqacp(args.data_root, split, seed=i)
            write_vocab(os.path.join(args.data_root, "vocab.txt"))
        generate_synthetic_once(_gen, args.data_root)

    from xggm_tpu.data.datasets import VQACPDataset, GraphBatchDataset
    from xggm_tpu.training.trainer import XGGMTrainer

    trainer = XGGMTrainer(cfg, task="vqa", mesh=mesh)
    dump_args(args, args.output)

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

    if args.test is not None:
        ds_raw = VQACPDataset(args.test, cfg.data)
        dataset = GraphBatchDataset(ds_raw, trainer.tokenizer)
        dump = os.path.join(args.output, f"{args.tmode}_predict.json")
        quesid2ans = trainer.predict(dataset, dump_path=dump)
        if dataset.has_targets:
            from xggm_tpu.data.datasets import VQAEvaluator
            acc = VQAEvaluator(ds_raw).evaluate(quesid2ans)
            print(f"{args.test} ({args.tmode}) accuracy: {acc * 100.:.2f}")
    else:
        best = trainer.train_baseline()
        print(f"Best valid: {best * 100.:.2f}")


if __name__ == "__main__":
    main()
