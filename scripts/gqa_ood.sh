#!/usr/bin/env bash
# GQA-OOD train + test (reference script/gqa_ood.sh equivalents).
# usage: scripts/gqa_ood.sh <name> [train|test]
set -euo pipefail
name=${1:-xggm_gcn}
mode=${2:-train}
out=snap/gqa_ood/$name

if [ "$mode" = "train" ]; then
  xggm-gqa-ood \
    --train train --valid val_tail \
    --gnn GCN --num_layer 2 --sigma 1.0 --delta 5 \
    --bs 96 --optim bert --lr 5e-6 --epochs 4 \
    --llayers 9 --xlayers 5 --rlayers 5 \
    --loadLXMERTQA snap/pretrained/model \
    --output "$out" --tqdm
else
  xggm-gqa-ood \
    --test testdev_all --bs 512 \
    --llayers 9 --xlayers 5 --rlayers 5 \
    --gnn GCN --num_layer 2 \
    --load "$out/BEST" --output "$out" --loadLXMERTQA ""
  xggm-eval gqa --predictions "$out/testdev_all_predict.json" \
    --ques_dir data/gqa_ood/org --save_dir "$out"
fi
