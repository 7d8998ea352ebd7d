"""GQA-OOD entry point (reference src/gqa/gqa_ood.py:434-480 __main__ +
script/gqa_ood.sh). Same flags; train or test arm by --test."""
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

    cfg = to_config(args, task="gqa")
    mesh = make_mesh_if_requested(args)

    if args.synthetic:
        from xggm_tpu.cli.common import generate_synthetic_once
        from xggm_tpu.data.synthetic import make_synthetic_gqa, write_vocab

        def _gen():
            splits = {args.train, args.valid, args.test} - {None, ""}
            for i, split in enumerate(sorted(splits)):
                make_synthetic_gqa(args.data_root, split, seed=i)
            write_vocab(os.path.join(args.data_root, "vocab.txt"))
        generate_synthetic_once(_gen, args.data_root)

    from xggm_tpu.data.datasets import GQADataset, GraphBatchDataset
    from xggm_tpu.training.trainer import XGGMTrainer

    if args.test is not None:
        # test arm forces tiny/fast off (reference gqa_ood.py:450)
        import dataclasses
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, tiny=False, fast=False))

    trainer = XGGMTrainer(cfg, task="gqa", mesh=mesh,
                          use_xpack=args.xpack,
                          profile_steps=args.profile)
    dump_args(args, args.output)

    # empty-string load flags mean "train from scratch"
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
        ds_raw = GQADataset(args.test, cfg.data)
        dataset = GraphBatchDataset(ds_raw, trainer.tokenizer)
        dump = os.path.join(args.output, f"{args.test}_predict.json")
        quesid2ans = trainer.predict(dataset, dump_path=dump)
        if dataset.has_targets:
            from xggm_tpu.data.datasets import GQAEvaluator
            acc = GQAEvaluator(ds_raw).evaluate(quesid2ans)
            print(f"{args.test} accuracy: {acc * 100.:.2f}")
    else:
        print(f"Oracle score: {trainer.oracle_score() * 100.:.2f}")
        start_epoch = trainer.resume() if args.resume else 0
        from xggm_tpu.utils.preempt import Preempted, PREEMPTED_EXIT_CODE
        try:
            best = trainer.train(start_epoch)
        except Preempted as e:
            # eviction notice handled: state is on disk; rerun with --resume
            print(e)
            raise SystemExit(PREEMPTED_EXIT_CODE)
        print(f"Best valid: {best * 100.:.2f}")


if __name__ == "__main__":
    main()
