"""Measure the temporal-engine dispatch win: one-scan-per-epoch vs
per-snapshot dispatch (VERDICT r1 item 2). Chickenpox-shaped workload:
tiny graph (20 nodes), many snapshots — dispatch-bound through a
high-latency device link.

Usage: python scripts/bench_temporal.py [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from difformer_tpu.data.synthetic import random_temporal_sequence
from difformer_tpu.nn import DIFFormer
from difformer_tpu.train.temporal import TemporalTrainer

T = int(sys.argv[1]) if len(sys.argv) > 1 else 200
N, F = 20, 4

print(f"backend={jax.default_backend()} T={T} N={N}", flush=True)
snaps = random_temporal_sequence(N, T, F, seed=0)
model = DIFFormer(hidden_channels=4, out_channels=1, num_layers=2,
                  dropout=0.0, kernel="simple")

for use_scan in (True, False):
    tr = TemporalTrainer(model, lr=1e-2, weight_decay=0.0,
                         mode="cumulative", use_scan=use_scan)
    data = tr._prep(snaps)
    params = tr.init_params(snaps[0])
    opt_state = tr.tx.init(params)
    rng = jax.random.PRNGKey(0)
    # warmup/compile
    rng, sk = jax.random.split(rng)
    p, o, c = tr.epoch_train(params, opt_state, data, sk)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        rng, sk = jax.random.split(rng)
        p, o, c = tr.epoch_train(p, o, data, sk)
    dt = (time.perf_counter() - t0) / reps
    print(f"use_scan={use_scan}: {dt * 1e3:.1f} ms/epoch "
          f"({dt / T * 1e3:.2f} ms/snapshot), loss={c:.4f}", flush=True)
