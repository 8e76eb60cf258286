#!/usr/bin/env bash
# Reproduction matrix — the reference's run.sh configs through our CLI.
#
# Every command is the exact DIFFormer-s/-a row of the reference's run
# scripts (see BASELINE.md for the file:line of each); the per-dataset
# PRESETS (difformer_tpu/utils/config.py) already pin the -s
# hyperparameters, so most rows are one flag away from the preset.
#
# Data: this environment is zero-egress — place raw files under data/ in
# the reference layout first (docs/datasets.md). Each loader raises the
# expected path if missing. Accuracy targets below are the ICLR'23 paper
# numbers recorded in BASELINE.md (re-verify against arXiv:2301.09474).
#
# Usage: bash scripts/reproduce.sh [section]     (default: small)
set -e
cd "$(dirname "$0")/.."
CLI="python -m difformer_tpu.cli"
section="${1:-small}"

case "$section" in
small)
  # Cora ≈85.9 (s) / ≈84.1 (a); Citeseer ≈73.5; Pubmed ≈81.8  [paper]
  $CLI --dataset cora                                  # DIFFormer-s preset
  $CLI --dataset cora --kernel sigmoid --weight_decay 0.1 --dropout 0.0
  $CLI --dataset citeseer
  $CLI --dataset citeseer --kernel sigmoid --hidden_channels 32
  $CLI --dataset pubmed
  $CLI --dataset pubmed --kernel sigmoid --weight_decay 0.1 --dropout 0.5 \
       --num_layers 4 --use_minibatch
  ;;
large)
  # ogbn-proteins ≈79.5 ROC-AUC; pokec ≈69.2 acc  [paper]
  $CLI --dataset ogbn-proteins
  $CLI --dataset pokec
  # checkpoint-only eval (reference run_test_large.sh): reference .pkl
  # state_dicts load directly
  # $CLI --dataset ogbn-proteins --eval_only --ckpt_path model/ogbn-proteins-difformer.pkl
  ;;
hetero)
  # chameleon / squirrel / film (run.sh:47-77; config-only targets)
  $CLI --dataset film
  $CLI --dataset film --kernel sigmoid --weight_decay 0.05 --num_layers 1
  $CLI --dataset squirrel
  $CLI --dataset squirrel --kernel sigmoid --lr 0.05 --weight_decay 5e-4
  $CLI --dataset chameleon
  $CLI --dataset chameleon --kernel sigmoid --weight_decay 1e-3 \
       --dropout 0.3 --num_layers 3 --graph_weight 0.8
  ;;
settrack)
  # image/text (run.sh label_num sweeps; -a = --kernel sigmoid on top;
  # cifar10-a uses lr 5e-4)
  for n in 10 50 100; do
    $CLI --dataset stl10 --label_num_per_class "$n"
    $CLI --dataset cifar10 --label_num_per_class "$n"
  done
  for n in 100 200 400; do $CLI --dataset 20news --label_num_per_class "$n"; done
  ;;
temporal)
  # spatial-temporal run.sh: w/ and w/o graph, both kernels
  $CLI --dataset chickenpox
  $CLI --dataset chickenpox --use_graph 0
  $CLI --dataset chickenpox --kernel sigmoid --lr 0.005
  $CLI --dataset covid
  $CLI --dataset covid --kernel sigmoid --weight_decay 0.005 --dropout 0.5
  $CLI --dataset wikimath
  $CLI --dataset wikimath --kernel sigmoid
  ;;
particle)
  # physical particle run.sh (ROC-AUC; wall-clock logged per run)
  $CLI --dataset actstrack
  $CLI --dataset actstrack --kernel sigmoid
  $CLI --dataset tau3mu
  $CLI --dataset tau3mu --lr 0.005
  $CLI --dataset synmol
  $CLI --dataset synmol --kernel sigmoid --dropout 0.4 --alpha 0.5
  ;;
*)
  echo "unknown section $section (small|large|hetero|settrack|temporal|particle)"
  exit 1
  ;;
esac
