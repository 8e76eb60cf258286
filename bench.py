"""Headline benchmark: DIFFormer-s training-step throughput at
ogbn-proteins scale on one chip.

Metric (BASELINE.json north star): **edges/s/chip** for SpMM + linear global
attention. One measured unit = a full jitted train step (forward + backward +
Adam) of a 3-layer DIFFormer-s (h=64, the reference's proteins config,
``node classification/run.sh:37-39``) on a synthetic graph with
ogbn-proteins-like shape; edges/s = E × num_layers / step_time.

``vs_baseline`` = speedup over a naive step implementing the reference's
structure directly (unsorted scatter + per-head Python-loop SpMM — what a
line-by-line port would do), measured in the same run on the same chip.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def build_graph(n, e, f, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    order = np.argsort(receivers, kind="stable")
    return x, senders[order], receivers[order], senders, receivers


def main():
    import jax
    import jax.numpy as jnp

    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.train.optim import torch_adam
    import optax

    # ogbn-proteins-like scale, sized to fit one chip's HBM with fwd+bwd.
    N = int(os.environ.get("BENCH_N", 131072))
    E = int(os.environ.get("BENCH_E", 4 * 1024 * 1024))
    F = 64
    C = 112
    LAYERS = 3
    STEPS = int(os.environ.get("BENCH_STEPS", 10))

    print(f"# bench: N={N} E={E} backend={jax.default_backend()}",
          file=sys.stderr, flush=True)
    x, s_sorted, r_sorted, s_unsorted, r_unsorted = build_graph(N, E, F)
    print("# graph built", file=sys.stderr, flush=True)
    y = np.random.default_rng(1).integers(0, 2, size=(N, C)).astype(np.float32)

    model = DIFFormer(hidden_channels=64, out_channels=C, num_layers=LAYERS,
                      num_heads=1, kernel="simple", dropout=0.0)
    xs = jnp.asarray(x)
    labels = jnp.asarray(y)
    tx = torch_adam(1e-2, 0.0)

    def make_step(senders, receivers, indices_are_sorted):
        s = jnp.asarray(senders)
        r = jnp.asarray(receivers)

        def loss(params):
            out = model.apply(
                {"params": params}, xs, s, r, train=False,
                indices_are_sorted=indices_are_sorted,
            )
            return optax.sigmoid_binary_cross_entropy(out, labels).mean()

        @jax.jit
        def step(params, opt_state):
            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, l

        return step

    variables = model.init(
        jax.random.PRNGKey(0), xs, jnp.asarray(s_sorted[:128]),
        jnp.asarray(r_sorted[:128]), train=False,
    )

    def timeit(step, params, tag):
        opt_state = tx.init(params)
        t0 = time.perf_counter()
        params, opt_state, l = step(params, opt_state)  # compile
        # force a real device->host sync (tunnel block_until_ready can lie)
        float(l)
        print(f"# {tag}: compiled+first step {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            params, opt_state, l = step(params, opt_state)
        float(l)
        return (time.perf_counter() - t0) / STEPS

    t_fast = timeit(make_step(s_sorted, r_sorted, True), variables["params"], "sorted")
    edges_per_s = E * LAYERS / t_fast

    vs_baseline = 1.0
    if os.environ.get("BENCH_SKIP_BASELINE") != "1":
        t_naive = timeit(
            make_step(s_unsorted, r_unsorted, False), variables["params"],
            "naive",
        )
        vs_baseline = t_naive / t_fast

    print(json.dumps({
        "metric": "edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "n_nodes": N, "n_edges": E, "layers": LAYERS,
            "hidden": 64, "step_ms": round(t_fast * 1e3, 2),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
