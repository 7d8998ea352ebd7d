#!/usr/bin/env bash
# Turnkey reproduction of the reference results (docs/REPRODUCE.md).
#
#   scripts/reproduce.sh                 # real data staged under data/
#   scripts/reproduce.sh --synthetic     # end-to-end smoke on synthetic
#                                        # fixtures (no corpora needed)
#
# Real-data mode runs BASELINE.json configs 3-5: GQA-OOD train+test+official
# eval, VQA-CP v2 train + OOD/ID test + official eval, and (commented) the
# LXMERT pretraining path. Compare the printed accuracies against the
# reference checkpoints per docs/REPRODUCE.md §4 (0.3-pt gate).
set -euo pipefail
cd "$(dirname "$0")/.."

SYN=""
EPOCHS=4
BS_GQA=96; BS_VQA=92; BS_TEST=512
if [ "${1:-}" = "--synthetic" ]; then
  SYN="--synthetic --tiny"
  EPOCHS=1
  BS_GQA=16; BS_VQA=16; BS_TEST=32
  echo "== synthetic smoke mode =="
fi

LOAD_QA="snap/pretrained/model"
if [ -n "$SYN" ] || [ ! -f snap/pretrained/model_LXRT.pth ]; then
  LOAD_QA=""   # from-scratch (synthetic) or snapshot not staged
fi

# ---- optional: native packed feature cache (13.6x faster ingest) ----
if [ -z "$SYN" ]; then
  for split in train val_tail; do
    pack=data/gqa_imgfeat/${split}_obj36.xpack
    if [ ! -f "$pack" ] && [ -f data/gqa_imgfeat/${split}_obj36.h5 ]; then
      python tools/make_xpack.py \
        --obj  data/gqa_imgfeat/${split}_obj36.h5 \
        --info data/gqa_imgfeat/${split}_obj36_info.json \
        --adj  data/gqa_imgfeat/${split}_obj36_adj_v2.h5 \
        --out  "$pack"
    fi
  done
fi

# ---- GQA-OOD (reference script/gqa_ood.sh) ----
out=snap/reproduce/gqa_ood
xggm-gqa-ood $SYN \
  --train train --valid "$([ -n "$SYN" ] && echo val || echo val_tail)" \
  --gnn GCN --num_layer 2 --sigma 1.0 --delta 5 \
  --bs "$BS_GQA" --optim bert --lr 5e-6 --epochs "$EPOCHS" \
  --llayers 9 --xlayers 5 --rlayers 5 \
  ${LOAD_QA:+--loadLXMERTQA "$LOAD_QA"} \
  --output "$out" --prng rbg --pallas_attention \
  $([ -z "$SYN" ] && echo --xpack)

test_split=$([ -n "$SYN" ] && echo val || echo testdev_all)
xggm-gqa-ood $SYN \
  --test "$test_split" --bs "$BS_TEST" \
  --llayers 9 --xlayers 5 --rlayers 5 --gnn GCN --num_layer 2 \
  --load "$out/BEST" --output "$out"
if [ -z "$SYN" ]; then
  xggm-eval gqa --predictions "$out/${test_split}_predict.json" \
    --ques_dir data/gqa_ood/org --save_dir "$out"
fi

# ---- VQA-CP v2 (reference script/vqacpv2.sh; delta=0, clean-first) ----
out=snap/reproduce/vqacpv2
xggm-vqacpv2 $SYN \
  --train train --valid "$([ -n "$SYN" ] && echo val || echo dev_test)" \
  --gnn GCN --num_layer 2 --sigma 1.0 --delta 0 \
  --bs "$BS_VQA" --optim bert --lr 1e-6 --epochs "$EPOCHS" \
  --llayers 9 --xlayers 5 --rlayers 5 \
  ${LOAD_QA:+--loadLXMERTQA "$LOAD_QA"} \
  --output "$out" --prng rbg --pallas_attention \
  $([ -z "$SYN" ] && echo --xpack)

vqa_test=$([ -n "$SYN" ] && echo val || echo test)
xggm-vqacpv2 $SYN --test "$vqa_test" --tmode OOD --bs "$BS_TEST" \
  --llayers 9 --xlayers 5 --rlayers 5 --gnn GCN --num_layer 2 \
  --load "$out/BEST" --output "$out"
if [ -z "$SYN" ]; then
  xggm-vqacpv2 --test val --tmode ID --bs "$BS_TEST" \
    --llayers 9 --xlayers 5 --rlayers 5 --gnn GCN --num_layer 2 \
    --load "$out/BEST" --output "$out"
  xggm-eval vqa --predictions "$out/OOD_predict.json" \
    --annotations data/vqa/vqacp_v2_test_annotations.json \
    --questions   data/vqa/vqacp_v2_test_questions.json
  xggm-eval vqa --predictions "$out/ID_predict.json" \
    --annotations data/vqa/vqacp_v2_val_annotations.json \
    --questions   data/vqa/vqacp_v2_val_questions.json
fi

echo "reproduce.sh: done (outputs under snap/reproduce/)"
