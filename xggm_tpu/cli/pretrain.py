"""LXMERT pretraining entry point (reference src/pretrain/lxmert_pretrain.py
__main__ + its module-level tuple construction)."""
from __future__ import annotations

import os

from xggm_tpu.cli.common import (build_parser, to_config, seed_everything,
                                  configure_prng, make_mesh_if_requested)


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    seed_everything(args.seed)
    configure_prng(args)
    from xggm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    mesh = make_mesh_if_requested(args)

    if args.synthetic:
        from xggm_tpu.cli.common import generate_synthetic_once
        from xggm_tpu.data.synthetic_pretrain import make_synthetic_pretrain
        generate_synthetic_once(
            lambda: make_synthetic_pretrain(args.data_root), args.data_root)

    cfg = to_config(args, task="gqa")
    from xggm_tpu.data.pretrain_data import (
        LxmertPretrainDataset, PretrainFeaturizer)
    from xggm_tpu.data.tokenizer import BertTokenizer
    from xggm_tpu.training.pretrainer import LxmertPretrainer

    vocab = args.vocab or os.path.join(args.data_root, "vocab.txt")
    tok = BertTokenizer.from_file(vocab)
    qa_sets = None
    if args.qa_sets:
        qa_sets = [s.strip().lower() for s in args.qa_sets.split(",")]

    topk = 512 if args.tiny else (5000 if args.fast else None)

    def build(split):
        ds = LxmertPretrainDataset(split, args.data_root, qa_sets, topk)
        # feature sources: H5 per source when present, else TSV
        for source in ds.sources:
            h5 = os.path.join(args.data_root, "lxmert_imgfeat",
                              f"{source}_obj36.h5")
            info = os.path.join(args.data_root, "lxmert_imgfeat",
                                f"{source}_obj36_info.json")
            tsv = os.path.join(args.data_root, "lxmert_imgfeat",
                               f"{source}_obj36.tsv")
            if os.path.exists(h5):
                ds.load_features_h5(h5, info, topk)
            elif os.path.exists(tsv):
                ds.load_features_tsv(tsv, topk)
            else:
                raise FileNotFoundError(f"no features for source {source}")
        return PretrainFeaturizer(
            ds, tok, max_seq_length=20,
            word_mask_rate=args.word_mask_rate,
            obj_mask_rate=args.obj_mask_rate,
            task_matched=args.task_matched, seed=args.seed)

    train_feat = build(args.train)
    valid_feat = build(args.valid) if args.valid else None

    trainer = LxmertPretrainer(
        cfg, train_feat, valid_feat,
        task_mask_lm=args.task_mask_lm, task_matched=args.task_matched,
        task_obj_predict=args.task_obj_predict, task_qa=args.task_qa,
        visual_losses=tuple(args.visual_losses.split(",")),
        mesh=mesh)
    if args.load is not None:
        restored = trainer.ckpt.load(os.path.basename(args.load),
                                     like={"params": trainer.state.params,
                                           "opt_state": trainer.state.opt_state})
        trainer.state = trainer._make_state(restored["params"],
                                            restored["opt_state"])
    start_epoch = trainer.resume() if args.resume else 0
    from xggm_tpu.utils.preempt import Preempted, PREEMPTED_EXIT_CODE
    try:
        best = trainer.train(start_epoch)
    except Preempted as e:
        # eviction notice handled: state is on disk; rerun with --resume
        print(e)
        raise SystemExit(PREEMPTED_EXIT_CODE)
    print(f"Best eval loss: {best:.4f}")


if __name__ == "__main__":
    main()
