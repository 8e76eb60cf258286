"""Real-dataset accuracy parity — auto-armed the moment data appears.

This image is zero-egress, so the benchmark datasets cannot be downloaded
here; each test skips unless the raw files are already on disk under
``data/`` in the reference layout (docs/datasets.md names the expected path
per dataset — it is exactly what the loaders raise when missing).

When data IS present these run the reference's exact configuration
(``node classification/run.sh`` rows, via the per-dataset PRESETS) and
assert the mean test accuracy over runs clears a floor set 2 points under
the ICLR'23 paper number recorded in BASELINE.md — loose enough for seed
noise, tight enough to catch any systematic parity gap.

Full matrix incl. large-graph rows: ``scripts/reproduce.sh``.
"""

import os

import pytest

from difformer_tpu.cli import main

DATA_DIR = os.environ.get("DIFFORMER_DATA_DIR", "data")

# (dataset, extra CLI flags, accuracy floor = paper - 2.0, paper value)
CASES = [
    ("cora", [], 0.839, "85.9 DIFFormer-s run.sh:4-6"),
    ("citeseer", [], 0.715, "73.5 DIFFormer-s run.sh:15-17"),
    ("pubmed", [], 0.798, "81.8 DIFFormer-s run.sh:26-28"),
]


def _has(name):
    return os.path.exists(os.path.join(DATA_DIR, name.lower()))


@pytest.mark.parametrize("dataset,flags,floor,ref", CASES,
                         ids=[c[0] for c in CASES])
def test_planetoid_accuracy_parity(dataset, flags, floor, ref):
    if not _has(dataset):
        pytest.skip(f"raw {dataset} not on disk under {DATA_DIR}/ "
                    "(zero-egress image); see docs/datasets.md")
    res = main(["--dataset", dataset, "--data_dir", DATA_DIR,
                "--runs", "3", "--display_step", "100", *flags])
    mean_test = sum(r["test"] for r in res) / len(res)
    assert mean_test >= floor, (
        f"{dataset}: mean test acc {mean_test:.4f} < floor {floor} "
        f"(paper ≈{ref})")
