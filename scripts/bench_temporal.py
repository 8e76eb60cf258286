"""Temporal-snapshot training throughput on one chip (spatial-temporal track).

The reference's temporal loop (``spatial-temporal/main.py:87-121``) runs one
forward per snapshot in a Python loop — per-snapshot device dispatches — and
backpropagates the summed MSE once per epoch (cumulative mode). The
TPU-native engine (``train/temporal.py``) pads all snapshots to one static
shape and compiles the WHOLE epoch (T snapshots + the optimizer update) into
one ``lax.scan`` dispatch.

This bench measures both on a wikimath-shaped synthetic workload (the
largest spatial-temporal dataset: ~1.1k nodes, ~700 snapshots;
``spatial-temporal/run.sh:23-42``), same honesty machinery as the node-track
rows:

  * fast  = the scanned engine (``use_scan=True``), one dispatch per epoch;
  * naive = the reference structure (``use_scan=False``): per-snapshot
    ``value_and_grad`` dispatch + host-side gradient accumulation — the
    exact operation/dispatch pattern of ``main.py:94-121``;
  * both timed as INTERLEAVED passes (min over reps) — first timed passes
    of a fresh executable on the tunneled chip run slow (BENCH_NOTES r5).

Roofline: null by design — this workload is dispatch/latency-bound (20
node-graphs of ~1k nodes are microseconds of compute per snapshot); the
row's meaning is the dispatch-amortization factor, reported as
``vs_baseline``.

Usage:
    python scripts/bench_temporal.py [T=200] [n=1024] [epochs=3]

Also importable by bench.py (``run_config`` returns a BENCH row dict).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_snapshots(T, n, f=8, k=8, seed=0):
    """Wikimath-shaped synthetic: fixed graph, AR(1) node signals, target =
    next-step signal (the vision-count regression shape)."""
    from difformer_tpu.data.graph import TemporalSnapshot

    rng = np.random.default_rng(seed)
    # fixed random k-regular-ish graph with weights (wikimath supplies
    # edge_attr weights; main.py:105 feeds them to gcn_conv)
    senders = np.repeat(np.arange(n), k)
    receivers = rng.integers(0, n, n * k)
    ei = np.stack([senders, receivers]).astype(np.int64)
    ew = rng.uniform(0.1, 1.0, n * k).astype(np.float32)
    snaps = []
    sig = rng.normal(size=(n, f)).astype(np.float32)
    for _ in range(T):
        sig = 0.9 * sig + 0.1 * rng.normal(size=(n, f)).astype(np.float32)
        target = sig.sum(axis=1) * 0.25 + rng.normal(size=n).astype(
            np.float32) * 0.05
        snaps.append(TemporalSnapshot(sig.copy(), ei, ew,
                                      target.astype(np.float32)))
    return snaps


def run_config(jax, *, T=200, n=1024, epochs=3, seed=0, run_naive=True):
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.train.temporal import TemporalTrainer

    HID, LAYERS = 64, 2          # run.sh:23-42 wikimath recipe shape
    snaps = build_snapshots(T, n, seed=seed)
    model = DIFFormer(hidden_channels=HID, out_channels=1,
                      num_layers=LAYERS, kernel="simple", dropout=0.0)

    def prep(use_scan, tag):
        tr = TemporalTrainer(model, lr=1e-2, weight_decay=0.0,
                             mode="cumulative", use_scan=use_scan)
        data = tr._prep(snaps)
        params = tr.init_params(snaps[0])
        opt_state = tr.tx.init(params)
        rng = jax.random.PRNGKey(7)
        state = [params, opt_state, rng]

        def one_epoch():
            rng, sk = jax.random.split(state[2])
            p, o, c = tr.epoch_train(state[0], state[1], data, sk)
            state[0], state[1], state[2] = p, o, rng
            return c

        t0 = time.perf_counter()
        one_epoch()                         # compile + warm
        print(f"# [temporal T={T} n={n}] {tag}: compile+1 epoch "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
              flush=True)

        def timed_pass():
            t0 = time.perf_counter()
            one_epoch()
            return time.perf_counter() - t0

        return timed_pass

    fast_pass = prep(True, "scanned")
    naive_pass = prep(False, "per-snapshot (reference structure)") \
        if run_naive else None

    t_fast = float("inf")
    t_naive = float("inf") if naive_pass else None
    for _ in range(epochs):
        t_fast = min(t_fast, fast_pass())
        if naive_pass:
            t_naive = min(t_naive, naive_pass())
    print(f"# [temporal T={T} n={n}] scanned: {t_fast * 1e3:.1f} ms/epoch"
          + (f", per-snapshot: {t_naive * 1e3:.1f} ms/epoch"
             if t_naive else "")
          + f" (min of {epochs} interleaved)", file=sys.stderr, flush=True)

    return {
        "graph": f"temporal-T{T}-n{n}", "heads": 1,
        "impl": "epoch-scan-cumulative",
        "dense_coverage": None,
        "snapshots_per_s": round(T / t_fast, 1),
        "epoch_ms": round(t_fast * 1e3, 2),
        "step_ms": None, "remat": False,
        "vs_baseline": (round(t_naive / t_fast, 3) if t_naive else None),
        "naive_epoch_ms": (round(t_naive * 1e3, 2) if t_naive else None),
        "naive_measured_now": t_naive is not None,
        "naive_note": ("reference structure measured same-invocation: one "
                       "value_and_grad dispatch per snapshot + host "
                       "gradient accumulation (spatial-temporal/"
                       "main.py:94-121). Caveat: per-dispatch latency "
                       "through the tunneled chip (~10-25 ms) is several "
                       "times a local host's, which inflates the ratio; "
                       "the structural advantage (1 dispatch/epoch vs T) "
                       "holds on local hardware but the measured multiple "
                       "would be smaller there" if t_naive else
                       "naive comparator disabled"),
        "roofline": None,   # dispatch/latency-bound by design (docstring)
    }


def main():
    import jax
    import json

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    print(json.dumps(run_config(jax, T=T, n=n, epochs=epochs)), flush=True)


if __name__ == "__main__":
    main()
