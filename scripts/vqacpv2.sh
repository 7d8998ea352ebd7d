#!/usr/bin/env bash
# VQA-CP v2 train + OOD/ID test (reference script/vqacpv2.sh equivalents).
set -euo pipefail
name=${1:-xggm_gcn}
mode=${2:-train}
out=snap/vqacpv2/$name

if [ "$mode" = "train" ]; then
  xggm-vqacpv2 \
    --train train --valid dev_test \
    --gnn GCN --num_layer 2 --sigma 1.0 --delta 0 \
    --bs 92 --optim bert --lr 1e-6 --epochs 4 \
    --llayers 9 --xlayers 5 --rlayers 5 \
    --loadLXMERTQA snap/pretrained/model \
    --output "$out" --tqdm
else
  xggm-vqacpv2 --test test --tmode OOD --bs 512 \
    --llayers 9 --xlayers 5 --rlayers 5 --gnn GCN --num_layer 2 \
    --load "$out/BEST" --output "$out" --loadLXMERTQA ""
  xggm-vqacpv2 --test val --tmode ID --bs 512 \
    --llayers 9 --xlayers 5 --rlayers 5 --gnn GCN --num_layer 2 \
    --load "$out/BEST" --output "$out" --loadLXMERTQA ""
  xggm-eval vqa --predictions "$out/OOD_predict.json" \
    --annotations data/vqa/test_annotations.json
fi
