#!/usr/bin/env bash
# Reproduction matrix — supersedes the reference's run.sh files with the
# unified CLI + per-dataset presets (difformer_tpu/utils/config.py PRESETS,
# distilled from node classification/run.sh:4-77, image and text/run.sh,
# spatial-temporal/run.sh, physical particle/run.sh; see BASELINE.md).
#
# Real datasets require their files under data/ (zero-egress: no downloads).
set -e

CLI="python -m difformer_tpu.cli"

# --- node classification (presets carry the reference hyperparameters) ----
$CLI --dataset cora                       # DIFFormer-s, 8 layers, 5 runs
$CLI --dataset citeseer
$CLI --dataset pubmed
$CLI --dataset cora --kernel sigmoid      # DIFFormer-a
$CLI --dataset chameleon                  # graph_weight 0.8, 10 runs
$CLI --dataset squirrel
$CLI --dataset film

# --- large graphs (mini-batch path) ---------------------------------------
$CLI --dataset ogbn-proteins              # BCE, rocauc, batch 10000
$CLI --dataset pokec                      # batch 100000

# --- image/text set classification (kNN graph from features) --------------
$CLI --dataset stl10
$CLI --dataset cifar10
$CLI --dataset 20news

# --- spatial-temporal -----------------------------------------------------
$CLI --dataset chickenpox
$CLI --dataset covid
$CLI --dataset wikimath                   # incremental optimization mode

# --- particle (graph-level) -----------------------------------------------
$CLI --dataset actstrack
$CLI --dataset tau3mu
$CLI --dataset synmol

# --- hyperparameter search (run_hyper_search.sh equivalent) ---------------
python -m difformer_tpu.sweep --dataset cora \
    --grid weight_decay=5e-3,1e-2 --grid dropout=0.2,0.5 \
    --grid hidden_channels=64,128 --grid num_layers=2,4,8

# --- checkpoint eval (run_test_large.sh equivalent) -----------------------
$CLI --dataset ogbn-proteins --eval_only true --ckpt_path models/ogbn-proteins-difformer
