#!/usr/bin/env bash
# LXMERT multi-task pretraining (reference run equivalents).
set -euo pipefail
out=snap/pretrain/${1:-lxmert}
xggm-pretrain \
  --train mscoco_train,mscoco_nominival,vgnococo --valid mscoco_minival \
  --llayers 9 --xlayers 5 --rlayers 5 \
  --bs 256 --optim bert --lr 1e-4 --epochs 12 \
  --taskMaskLM --taskObjPredict --taskMatched --taskQA \
  --visualLosses obj,attr,feat --qaSets vqa,gqa,visual7w \
  --fromScratch --output "$out"
