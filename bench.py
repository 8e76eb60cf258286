"""Headline benchmark: DIFFormer-s training-step throughput at
ogbn-proteins scale on one chip.

Metric (BASELINE.json north star): **edges/s/chip** for SpMM + linear global
attention. One measured unit = a full jitted train step (forward + backward +
Adam) of a 3-layer DIFFormer-s (h=64, the reference's proteins config,
``node classification/run.sh:37-39``) on a synthetic graph with
ogbn-proteins-like shape; edges/s = E × num_layers / step_time.

Default graph is a stochastic block model (BENCH_GRAPH=clustered —
community structure like real protein/social graphs; ogbn-proteins itself
is 8 species clusters) with the block-sparse MXU SpMM (BENCH_IMPL=bsr,
ops/bsr.py). BENCH_GRAPH=uniform BENCH_IMPL=ell reproduces the
locality-free worst case (i.i.d. endpoints), which sits at the measured
per-row gather roofline (BENCH_NOTES.md). ``vs_baseline`` always compares
against the naive reference-structure step on the SAME graph.

All STEPS steps run inside one jitted ``lax.scan`` so per-dispatch tunnel
latency is amortized; timing = (second call wall time) / STEPS.

``vs_baseline`` = speedup over a naive step implementing the reference's
structure directly (unsorted scatter, the layout a line-by-line port would
use). Set ``BENCH_RUN_NAIVE=1`` to re-measure it in the same run (adds a
second ~5 min compile); otherwise the constant below — measured on this
chip with that flag — is used.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# naive (unsorted-scatter, reference-structure) edges/s measured on this
# TPU v5 lite chip per graph kind, via BENCH_RUN_NAIVE=1 on the same graph:
#   uniform   (2026-08-17): sorted-COO 413.7 ms at E=4.19M, L=3 (30.4M
#             edges/s); unsorted naive 1.091x slower => 27.9M edges/s
#   clustered (2026-08-18): naive step 471.5 ms => 26.7M edges/s
NAIVE_EDGES_PER_S = {"uniform": 27.9e6, "clustered": 26.7e6}


def build_graph(n, e, f, seed=0, kind="uniform", comm=1024, intra=0.8):
    """kind='uniform': i.i.d. endpoints — the locality worst case.
    kind='clustered': stochastic block model (communities of ``comm`` nodes
    holding ``intra`` of the edges) — the shape of real protein/social
    graphs (ogbn-proteins' 8 species clusters), and the case the
    block-sparse SpMM path (ops/bsr.py) is built for."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    if kind == "clustered":
        e_in = int(e * intra)
        c = rng.integers(0, n // comm, e_in)
        senders = np.concatenate(
            [c * comm + rng.integers(0, comm, e_in),
             rng.integers(0, n, e - e_in)]).astype(np.int32)
        receivers = np.concatenate(
            [(c * comm + rng.integers(0, comm, e_in)),
             rng.integers(0, n, e - e_in)]).astype(np.int32)
    else:
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = rng.integers(0, n, e).astype(np.int32)
    order = np.argsort(receivers, kind="stable")
    return x, senders[order], receivers[order], senders, receivers


def main():
    import jax

    # persistent compilation cache: the ELL program takes ~13 min to compile
    # through the axon remote-compile tunnel; cached recompiles are seconds.
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.train.optim import torch_adam

    N = int(os.environ.get("BENCH_N", 131072))
    E = int(os.environ.get("BENCH_E", 4 * 1024 * 1024))
    F = 64
    C = 112
    LAYERS = 3
    STEPS = int(os.environ.get("BENCH_STEPS", 8))
    IMPL = os.environ.get("BENCH_IMPL", "bsr")      # bsr | ell | coo
    DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # bfloat16 | ''(f32)
    GRAPH = os.environ.get("BENCH_GRAPH", "clustered")  # clustered | uniform

    print(f"# bench: N={N} E={E} steps={STEPS} graph={GRAPH} impl={IMPL} "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    x, s_sorted, r_sorted, s_uns, r_uns = build_graph(N, E, F, kind=GRAPH)
    y = np.random.default_rng(1).integers(0, 2, size=(N, C)).astype(np.float32)

    use_graph = os.environ.get("BENCH_USE_GRAPH", "1") == "1"
    HEADS = int(os.environ.get("BENCH_HEADS", 1))  # reference loops heads in
    # Python per SpMM (difformer.py:76-78); here all heads ride one op
    model = DIFFormer(hidden_channels=64, out_channels=C, num_layers=LAYERS,
                      num_heads=HEADS, kernel="simple", dropout=0.0,
                      use_graph=use_graph,   # =0: attention+MLP-only split
                      compute_dtype=DTYPE or None)
    xs = jnp.asarray(x)
    labels = jnp.asarray(y)
    tx = torch_adam(1e-2, 0.0)

    ell = None
    if IMPL == "ell":
        import time as _t

        t0 = _t.perf_counter()
        from difformer_tpu.ops.ell import build_ell_gcn

        ell = build_ell_gcn(s_sorted, r_sorted, N)
        print(f"# ELL built in {_t.perf_counter() - t0:.1f}s "
              f"buckets={ell[0].bucket_sizes}", file=sys.stderr, flush=True)
    elif IMPL == "bsr":
        import time as _t

        t0 = _t.perf_counter()
        from difformer_tpu.ops.bsr import build_bsr_gcn

        import jax.numpy as _jnp

        kw = {}
        if os.environ.get("BENCH_BLOCK_BF16", "1") == "1":
            kw["block_dtype"] = _jnp.bfloat16  # same step time, half HBM
        if os.environ.get("BENCH_RES_TIGHT") == "0":
            kw["residual_kwargs"] = {}  # loose bucketing (pre-tuning)
        ell = build_bsr_gcn(s_sorted, r_sorted, N,
                            tile=int(os.environ.get("BENCH_TILE", 256)),
                            verbose=True, **kw)
        print(f"# BSR built in {_t.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    def make_multi_step(senders, receivers, sorted_, use_ell=True):
        s = jnp.asarray(senders)
        r = jnp.asarray(receivers)

        # all large arrays are jit ARGUMENTS (closed-over device arrays
        # would be embedded as constants and wreck compile time)
        def loss(params, xs, s, r, labels, ell_arg):
            out = model.apply(
                {"params": params}, xs, s, r, train=False,
                indices_are_sorted=sorted_, ell=ell_arg,
            )
            return optax.sigmoid_binary_cross_entropy(out, labels).mean()

        @jax.jit
        def multi(params, opt_state, xs, s, r, labels, ell_arg):
            def body(carry, _):
                params, opt_state = carry
                l, g = jax.value_and_grad(loss)(
                    params, xs, s, r, labels, ell_arg
                )
                updates, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), l

            (params, opt_state), ls = jax.lax.scan(
                body, (params, opt_state), None, length=STEPS
            )
            return params, opt_state, ls[-1]

        return lambda p, o: multi(p, o, xs, s, r, labels,
                                  ell if use_ell else None)

    variables = model.init(
        jax.random.PRNGKey(0), xs, jnp.asarray(s_sorted[:128]),
        jnp.asarray(r_sorted[:128]), train=False,
    )

    def timeit(multi, tag, reps=3):
        params = variables["params"]
        opt_state = tx.init(params)
        t0 = time.perf_counter()
        p1, o1, l = multi(params, opt_state)
        float(l)
        print(f"# {tag}: compile+{STEPS} steps {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        # min over a few calls: per-call dispatch latency through the
        # remote-TPU tunnel is noisy (tens of ms, occasional spikes)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            p1, o1, l = multi(p1, o1)
            float(l)
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f"# {tag}: {best * 1e3:.1f} ms/step (min of {reps})",
              file=sys.stderr, flush=True)
        return best

    t_fast = timeit(make_multi_step(s_sorted, r_sorted, True), IMPL)
    edges_per_s = E * LAYERS / t_fast

    if os.environ.get("BENCH_RUN_NAIVE") == "1":
        t_naive = timeit(
            make_multi_step(s_uns, r_uns, False, use_ell=False), "naive")
        vs_baseline = t_naive / t_fast
    elif GRAPH in NAIVE_EDGES_PER_S and HEADS == 1:
        # the cached naive constants were measured at H=1 only
        vs_baseline = edges_per_s / NAIVE_EDGES_PER_S[GRAPH]
    else:
        vs_baseline = 1.0

    print(json.dumps({
        "metric": "edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "n_nodes": N, "n_edges": E, "layers": LAYERS, "hidden": 64,
            "heads": HEADS,
            "impl": IMPL, "dtype": DTYPE or "float32", "graph": GRAPH,
            "step_ms": round(t_fast * 1e3, 2),
            "backend": jax.default_backend(),
        },
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
