#!/usr/bin/env bash
# fetch_data.sh — upstream-artifact map for every loader family.
#
# This image is ZERO-EGRESS: this script is documentation-plus-automation
# for the moment the environment has network access. Run it on a connected
# machine (or future image) and the three skipped accuracy-parity tests
# (tests/test_real_data.py) plus the proteins/pokec large-graph runs
# execute with no further work. Layout produced = docs/datasets.md =
# exactly what difformer_tpu.data.loaders expects.
#
# Integrity: every artifact is hashed into data/CHECKSUMS.sha256 on first
# fetch and verified against it on re-runs (upstreams publish no uniform
# digests; pin-on-first-fetch is the reproducible alternative). To
# re-verify later: (cd "$DATA_DIR" && sha256sum -c CHECKSUMS.sha256).
#
# Usage: scripts/fetch_data.sh [DATA_DIR] [family ...]
#   families: planetoid amazon coauthor geomgcn filtered heterophilous
#             mat twitch ogb imagetext temporal particle
# Google Drive ids (pokec/snap-patents/yelp-chi + fixed splits) come from
# the reference (`node classification/data_utils.py:342-351`) and need
# `gdown` (pip install gdown) — Drive blocks plain curl.

set -euo pipefail
DATA_DIR="${1:-data}"; shift || true
FAMILIES=("${@:-planetoid amazon coauthor geomgcn filtered heterophilous mat twitch ogb imagetext temporal particle}")
[ $# -eq 0 ] && FAMILIES=(planetoid amazon coauthor geomgcn filtered heterophilous mat twitch ogb imagetext temporal particle)
mkdir -p "$DATA_DIR"
SUMS="$DATA_DIR/CHECKSUMS.sha256"
touch "$SUMS"

note() { printf '\n== %s\n' "$*"; }

# pin_or_verify REL — verify against the pinned sha256 (abort on mismatch)
# or pin it on first sight. Shared by fetch() and gdrive() so the logic
# cannot drift between them.
pin_or_verify() {
  local rel="$1"
  if grep -qF "  $rel" "$SUMS"; then
    (cd "$DATA_DIR" && grep -F "  $rel" CHECKSUMS.sha256 | sha256sum -c -)
  else
    (cd "$DATA_DIR" && sha256sum "$rel" >> CHECKSUMS.sha256)
  fi
}

# fetch URL TARGET  — download, then record/verify sha256
fetch() {
  local url="$1" target="$DATA_DIR/$2"
  mkdir -p "$(dirname "$target")"
  if [ ! -f "$target" ]; then
    echo "GET $url -> $target"
    curl -L --fail --retry 3 -o "$target" "$url"
  fi
  pin_or_verify "${target#"$DATA_DIR"/}"
}

# gdrive FILE_ID TARGET — Google Drive artifacts (reference data_utils.py)
gdrive() {
  local id="$1" target="$DATA_DIR/$2"
  mkdir -p "$(dirname "$target")"
  [ -f "$target" ] || gdown --id "$id" -O "$target"
  pin_or_verify "${target#"$DATA_DIR"/}"
}

for fam in ${FAMILIES[@]}; do case "$fam" in

planetoid)  # loaders.load_planetoid — raw ind.* files (Yang et al.)
  note planetoid
  for d in cora citeseer pubmed; do
    for s in x y tx ty allx ally graph test.index; do
      fetch "https://github.com/kimiyoung/planetoid/raw/master/data/ind.$d.$s" \
            "$d/ind.$d.$s"
    done
  done ;;

amazon)     # loaders.load_amazon_coauthor — gnn-benchmark npz
  note amazon
  for f in amazon_electronics_photo.npz amazon_electronics_computers.npz; do
    fetch "https://github.com/shchur/gnn-benchmark/raw/master/data/npz/$f" "$f"
  done ;;

coauthor)
  note coauthor
  for f in ms_academic_cs.npz ms_academic_phy.npz; do
    fetch "https://github.com/shchur/gnn-benchmark/raw/master/data/npz/$f" "$f"
  done ;;

geomgcn)    # loaders.load_geom_gcn — cornell/texas/wisconsin/film + splits
  note geom-gcn
  GG=https://raw.githubusercontent.com/graphdml-uiuc-jlu/geom-gcn/master
  for d in cornell texas wisconsin film; do
    fetch "$GG/new_data/$d/out1_graph_edges.txt" \
          "geom-gcn/$d/out1_graph_edges.txt"
    fetch "$GG/new_data/$d/out1_node_feature_label.txt" \
          "geom-gcn/$d/out1_node_feature_label.txt"
    for i in 0 1 2 3 4 5 6 7 8 9; do
      fetch "$GG/splits/${d}_split_0.6_0.2_${i}.npz" \
            "geom-gcn/splits/${d}_split_0.6_0.2_${i}.npz"
    done
  done ;;

filtered)   # loaders.load_filtered_chameleon_squirrel (Platonov et al.)
  note filtered-chameleon-squirrel
  HG=https://raw.githubusercontent.com/yandex-research/heterophilous-graphs/main/data
  for f in chameleon_filtered.npz squirrel_filtered.npz; do
    fetch "$HG/$f" "heterophilous_graph/$f"
  done ;;

heterophilous)  # loaders.load_heterophilous (roman-empire etc.)
  note heterophilous
  HG=https://raw.githubusercontent.com/yandex-research/heterophilous-graphs/main/data
  for f in roman_empire amazon_ratings minesweeper tolokers questions; do
    fetch "$HG/$f.npz" "heterophilous/$f.npz"
  done ;;

mat)        # loaders.load_{pokec,fb100,yelpchi,snap_patents,deezer}
  note mat-files "(Google Drive ids from reference data_utils.py:342-351)"
  gdrive 1dNs5E7BrWJbgcHeQ_zuy5Ozp2tRCWG0y pokec/pokec.mat
  gdrive 1ZhpAiyTNc0cE_hhgyiqxnkKREHK7MK-_ pokec/pokec_splits.npy
  gdrive 1ldh23TSY1PwXia6dU0MYcpyEgX-w3Hia snap_patents.mat
  gdrive 12xbBRqd8mtG_XkNLH8dRRNZJvVM4Pw-N snap_patents_splits.npy
  gdrive 1fAXtTVQS4CfEk4asqrFw9EPmlUPGbGtJ YelpChi.mat
  # Penn94 + deezer ship with the LINKX data release
  fetch "https://github.com/CUAI/Non-Homophily-Large-Scale/raw/master/data/facebook100/Penn94.mat" \
        facebook100/Penn94.mat
  fetch "https://github.com/CUAI/Non-Homophily-Large-Scale/raw/master/data/deezer-europe.mat" \
        deezer-europe.mat ;;

twitch)     # loaders.load_twitch — MUSAE raw csv/json
  note twitch
  MU=https://raw.githubusercontent.com/benedekrozemberczki/datasets/master/twitch
  for cc in DE ENGB ES FR PTBR RU TW; do
    fetch "$MU/$cc/musae_${cc}_edges.csv"    "twitch/$cc/musae_${cc}_edges.csv"
    fetch "$MU/$cc/musae_${cc}_target.csv"   "twitch/$cc/musae_${cc}_target.csv"
    fetch "$MU/$cc/musae_${cc}_features.json" "twitch/$cc/musae_${cc}_features.json"
  done ;;

ogb)        # loaders.load_ogb_raw — official OGB zips, extracted; parsed
  note ogb  # directly from csv.gz (no ogb package needed)
  for d in arxiv proteins products; do
    fetch "https://snap.stanford.edu/ogb/data/nodeproppred/$d.zip" "ogbn_$d.zip"
    (cd "$DATA_DIR" && unzip -n "ogbn_$d.zip" && \
     { [ -d "ogbn_$d" ] || mv "$d" "ogbn_$d"; } 2>/dev/null || true)
  done ;;

imagetext)  # loaders.load_image_text + 20news
  note image-text "(pretrained-embedding pkls from the reference's data release"
  echo "   — Google Drive folder linked in the reference Readme.md; ids not"
  echo "   file-granular, download mini_imagenet.pkl / stl10_embeddings.pkl /"
  echo "   cifar10_embeddings.pkl into $DATA_DIR manually, then re-run to pin"
  echo "   checksums. 20news: python -c 'from sklearn.datasets import"
  echo "   fetch_20newsgroups; fetch_20newsgroups()' populates ~/scikit_learn_data."
  for f in mini_imagenet.pkl stl10_embeddings.pkl cifar10_embeddings.pkl; do
    if [ -f "$DATA_DIR/$f" ] && ! grep -qF "  $f" "$SUMS"; then
      (cd "$DATA_DIR" && sha256sum "$f" >> CHECKSUMS.sha256)
    fi
  done ;;

temporal)   # data.temporal_loaders — torch_geometric_temporal raw jsons
  note temporal
  TG=https://raw.githubusercontent.com/benedekrozemberczki/pytorch_geometric_temporal/master/dataset
  fetch "$TG/chickenpox.json"             chickenpox.json
  fetch "$TG/wikivital_mathematics.json"  wikivital_mathematics.json
  fetch "$TG/england_covid.json"          england_covid.json ;;

particle)   # data.particle + data.plbind — LRI Zenodo record 7265547
  note particle "(zenodo.org/record/7265547; actstrack default field 2T)"
  ZN=https://zenodo.org/record/7265547/files
  fetch "$ZN/actstrack_raw_2T.zip"  actstrack_raw_2T.zip
  fetch "$ZN/tau3mu_raw.zip"        tau3mu_raw.zip
  fetch "$ZN/synmol_raw.zip"        synmol_raw.zip
  fetch "$ZN/plbind_raw.zip"        plbind_raw.zip
  for z in actstrack_raw_2T tau3mu_raw synmol_raw plbind_raw; do
    (cd "$DATA_DIR" && unzip -n "$z.zip") || true
  done ;;

*) echo "unknown family: $fam" >&2; exit 2 ;;
esac; done

note done
echo "checksums pinned in $SUMS; verify anytime with:"
echo "  (cd $DATA_DIR && sha256sum -c CHECKSUMS.sha256)"
