"""Headline benchmark: DIFFormer-s training-step throughput at
ogbn-proteins scale on one chip.

Metric (BASELINE.json north star): **edges/s/chip** for SpMM + linear global
attention. One measured unit = a full jitted train step (forward + backward +
Adam) of a 3-layer DIFFormer-s (h=64, the reference's proteins config,
``node classification/run.sh:37-39``) on a synthetic graph with
ogbn-proteins-like shape; edges/s = E × num_layers / step_time.

Default is a SWEEP over the three graph shapes × head counts
({clustered, powerlaw, uniform} × {H=1, H=8}), with the SpMM implementation
auto-chosen per graph by the tile-density probe (``ops/bsr.choose_spmm``)
and the dense-coverage score logged per row. The headline value/vs_baseline
is the **powerlaw H=1** row — the north-star-shaped workload (heavy-tailed
hub degrees like ogbn-proteins), not the kernel's best case:

  * clustered — stochastic block model (community structure; BSR's home turf)
  * powerlaw  — heavy-tailed degree distribution (Pareto α=2, hubs ≈ 6k°
    at E=4.2M — the proteins-like shape; no clean communities)
  * uniform   — i.i.d. endpoints (locality-free worst case)

plus DIFFormer-a rows (the O(N²) sigmoid kernel on its Pallas flash
fwd+bwd path) at the reference's sigmoid operating scale (N=4096 —
chameleon 2.3k, squirrel 5.2k) AND at N=32768, where the reference's dense
path cannot run at all. Each runs in a time-bounded subprocess
(BENCH_SIGMOID_TIMEOUT, default 900 s): compiles are seconds on a healthy
tunnel since the round-3 Pallas backward, but the axon relay can wedge for
minutes after any killed TPU process (BENCH_NOTES r3), and a wedged
compile must not starve the sweep's final JSON line. Gates:
BENCH_SIGMOID=0 / BENCH_SIGMOID_NS.

``vs_baseline`` = speedup over a naive step implementing the reference's
structure directly (unsorted scatter, per-edge gather — the layout a
line-by-line port would use) on the SAME graph at the SAME head count.
The naive baseline is **re-measured in the same invocation by default**
(``BENCH_RUN_NAIVE=0`` opts out and falls back to the dated constants
below) — this chip shows up to 1.6x day-to-day drift on gather-bound
programs (BENCH_NOTES.md), so cross-day ratios are untrustworthy. Rows
report ``naive_measured_now`` accordingly.

Each row also carries a **roofline account** (``roofline``): the additive
cost-model floor for its configuration — random row-gather time for the
per-edge (ELL/residual) work at the measured 3.7 ns + bytes/30 GB/s gather
floor, HBM stream time for the dense BSR blocks at peak bandwidth, and MXU
time for block + model matmuls — plus ``pct_of_roofline`` = floor/measured.
Activation streaming between fused ops is NOT modeled (XLA fusion makes the
true activation traffic unknowable from outside), so pct_of_roofline is an
upper bound on closeness-to-light; rows near 1.0 are gather-bound by
construction.

Setting any of BENCH_GRAPH / BENCH_IMPL / BENCH_HEADS switches to
single-config mode (one row, old behavior) for ad-hoc probes.

All STEPS steps run inside one jitted ``lax.scan`` so per-dispatch tunnel
latency is amortized; timing = best (wall time / STEPS) over a few calls.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# naive (unsorted-scatter, reference-structure) edges/s measured on this
# TPU v5 lite chip per (graph, heads), via BENCH_RUN_NAIVE=1 on the same
# graph/heads (N=131072, E=4.19M, L=3, bf16). 2026-08-20 sweep: the naive
# program's step time is graph-shape independent (identical 471.5 ms on all
# three H=1 graphs; 2341.0/2341.5 ms on clustered/powerlaw H=8):
#   H=1: 471.5 ms  => 26.7M edges/s          (all graphs)
#   H=8: 2341 ms   => 5.37M edges/s          (clustered/powerlaw measured;
#        uniform H=8 naive is the same program shape => same constant)
NAIVE_EDGES_PER_S = {
    ("uniform", 1): 26.7e6,
    ("clustered", 1): 26.7e6,
    ("powerlaw", 1): 26.7e6,
    ("clustered", 8): 5.37e6,
    ("powerlaw", 8): 5.37e6,
    ("uniform", 8): 5.37e6,
}

N_DEF = 131072
E_DEF = 4 * 1024 * 1024

# --- roofline cost-model constants (this chip / v5e) -----------------------
GATHER_BASE_NS = 3.7     # per random row fetch (frozen 2026-08-18 microbench,
GATHER_GBPS = 30e9       # BENCH_NOTES "Gather cost model": t_row = 3.7 ns +
#   bytes/30 GB/s). These frozen values are kept ONLY as the drift report —
#   the chip shows up to 1.6x day-to-day variance on gather-bound programs,
#   so every invocation re-measures the floor (calibrate_gather below,
#   VERDICT r3 item 2) and pct_of_roofline is computed against the SAME-RUN
#   constants in CALIB.
HBM_GBPS = 819e9         # v5e peak HBM stream (dense-block floor)
MXU_FLOPS = 197e12       # v5e bf16 peak
SIGMOID_VPU_PAIRS = 90e9  # VPU sigmoid evals/s inside the flash kernel —
#   derived from the measured 84.7 Gpairs/s VPU-bound forward (BENCH_NOTES
#   "VPU-bound analysis": matmuls alone would run ~10x faster, so the
#   per-pair cost is ≈ one sigmoid evaluation). Not self-calibrated (the
#   sigmoid rows' variance is bf16-MXU-path ~2%, not the gather drift).

# same-run gather calibration (filled by calibrate_gather; frozen fallback)
CALIB = {"base_ns": GATHER_BASE_NS, "gbps": GATHER_GBPS,
         "measured_now": False, "detail": None}


def calibrate_gather(jax, *, n=131072, k=32, steps=8, reps=3):
    """Re-measure the random row-gather floor in THIS invocation.

    Gathers [n, k] random rows of x[n, d] + weighted-reduce, with the
    output FED BACK as the next iteration's gather source inside a
    ``lax.scan`` — the data dependency stops XLA hoisting the gather and
    amortizes the ~25 ms per-call dispatch/fetch latency of the axon
    tunnel that contaminated the round-3 single-call microbench (measured:
    the same 4.2M-row gather reads 33 ms as a single call and 12 ms as a
    scan iteration). Two widths (d=8 → 16 B and d=256 → 512 B bf16) solve
    t_row = base + bytes/bw; d=64 (the production H=1 row) validates the
    fit. K is fixed at 32 (ELL-bucket scale), so the per-OUTPUT-row
    reduction cost (~25 ns) is folded into base pro rata. Updates CALIB in
    place; on any failure the frozen constants stay and rows report
    calibration_measured_now: false. ~30-60 s including compiles.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))

    def measure(d):
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.uniform(size=(n, k)).astype(np.float32),
                        jnp.bfloat16)

        @jax.jit
        def f(c):
            def body(c, _):
                g = jnp.take(c, idx, axis=0)
                return jnp.einsum("rk,rkd->rd", w, g), None

            o, _ = jax.lax.scan(body, c, None, length=steps)
            return o

        out = f(x)
        float(jnp.sum(out.astype(jnp.float32)))   # sync (block_until_ready
        best = float("inf")                       # is unreliable on axon)
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / steps)
        return best / (n * k)             # seconds per gathered row

    try:
        t_narrow, t_wide, t_prod = measure(8), measure(256), measure(64)
        bytes_n, bytes_w = 8 * 2, 256 * 2
        slope = (t_wide - t_narrow) / (bytes_w - bytes_n)   # s per byte
        base = t_narrow - slope * bytes_n
        if slope <= 0 or base <= 0:
            raise ValueError(
                f"non-physical fit: base={base:.3e}s slope={slope:.3e}s/B")
        predicted_prod = base + slope * 64 * 2
        CALIB.update(
            base_ns=base * 1e9, gbps=1.0 / slope, measured_now=True,
            detail={
                "base_ns": round(base * 1e9, 2),
                "gbps": round(1.0 / slope / 1e9, 1),
                "frozen_base_ns": GATHER_BASE_NS,
                "frozen_gbps": round(GATHER_GBPS / 1e9, 1),
                # drift of the production-width (128 B) row cost vs frozen
                "drift_128B": round(
                    (base + slope * 128)
                    / (GATHER_BASE_NS * 1e-9 + 128 / GATHER_GBPS), 3),
                "fit_check_128B": round(predicted_prod / t_prod, 3),
            })
        print(f"# gather calibration: base={CALIB['base_ns']:.2f} ns "
              f"bw={CALIB['gbps'] / 1e9:.1f} GB/s "
              f"drift_128B={CALIB['detail']['drift_128B']}x "
              f"fit_check={CALIB['detail']['fit_check_128B']}",
              file=sys.stderr, flush=True)
    except Exception as err:
        print(f"# gather calibration failed ({err}); using frozen constants",
              file=sys.stderr, flush=True)


def _real_edges(ell_graph):
    """Non-padding edge slots of an EllGraph (weight==0 marks padding).
    Counts on-device (scalar reduction) — ``np.asarray`` here would fetch
    hundreds of MB of weight tables to host at proteins density."""
    return int(sum(int((w != 0).sum()) for w in ell_graph.weight))


def roofline_account(ell, *, impl, e, layers, heads, d, dtype_bytes, n,
                     in_feat, hidden, out_ch, step_ms, row_width=None,
                     fused_mean=True):
    """Additive cost-model floor for one bench row (VERDICT r2 item 3).

    Terms (all per train step, seconds):
      * gather — per-edge rows fetched at the measured random-gather floor:
        fwd streams the fwd direction's real edges, bwd the rev direction's,
        once per layer; each fetch moves a [heads*d] feature row.
      * dense_stream — BSR dense blocks cross HBM once per matmul
        application (fwd blocks in the forward, rev blocks in the backward),
        at peak stream bandwidth.
      * mxu — block matmul FLOPs plus the model's projection/attention/MLP
        matmuls (fwd + 2x for backward) at peak bf16 rate.
      * act_stream — the materialized [N, heads·d] projection activations
        each cost ≥5 HBM passes per layer at peak stream bandwidth
        (write+read in the forward, cotangent write+read in the backward,
        one primal re-read for the bilinear grads). Under the round-5
        fused/factored model (fuse_head_mean: value factored through the
        key aggregates, branch outputs emitted head-averaged) only q and k
        exist → 10 passes; ``fused_mean=False`` (reference head-mean
        order) materializes q/k/v plus two [N, heads·d] branch outputs →
        15 + 8 passes. Plus a lump of 8 [N, hidden] passes for
        LN/residual/dropout/layer IO. This is the term the round-4 account
        omitted (VERDICT r4 weak 1: 'the roofline itself under-accounts').

    Interpretation: the gather constants are calibrated on UNIFORM-RANDOM
    indices — re-measured in the same invocation via calibrate_gather (the
    frozen 2026-08-18 numbers are only the drift report). pct_of_roofline
    ≈ 100 ⇒ the
    row is gather-bound at that calibration (uniform H=1 validates at ~97%).
    pct > 100 ⇒ the row's gathers BEAT the uniform-random rate — hub-sorted
    residuals and wide (H=8) rows have locality/pipelining the calibration
    graph lacks — i.e. the model is a conservative ceiling there, and the
    row is still memory-bound, not tunable. A ``calibration`` note is
    attached in that case.
    """
    from difformer_tpu.ops.bsr import BsrBuckets, BsrDirection
    from difformer_tpu.ops.ell import EllGraph

    # row_width: features gathered per edge — heads*d in reference order,
    # in_feat+1 under spmm_first (the ones-column bias correction)
    width = row_width if row_width is not None else heads * d

    res_edges = []     # per direction: rows gathered per layer-pass
    dense_bytes = 0
    dense_flops_per_apply = 0
    dirs = ell if isinstance(ell, tuple) else ()
    for dct in dirs:
        if isinstance(dct, EllGraph):
            res_edges.append(_real_edges(dct))
        elif isinstance(dct, BsrDirection):
            res_edges.append(
                _real_edges(dct.residual) if dct.residual is not None else 0)
            dense_bytes += (int(np.prod(dct.blocks.shape))
                            * np.dtype(dct.blocks.dtype).itemsize)
            dense_flops_per_apply += (
                2 * dct.n_blocks * dct.tile * dct.tile * width)
        elif isinstance(dct, BsrBuckets):
            res_edges.append(
                _real_edges(dct.residual) if dct.residual is not None else 0)
            for b in dct.blocks:
                dense_bytes += (int(np.prod(b.shape))
                                * np.dtype(b.dtype).itemsize)
                slots = int(np.prod(b.shape[:2]))
                dense_flops_per_apply += (
                    2 * slots * dct.tile * dct.tile * width)
    if not res_edges:          # naive / no prebuilt operator: all edges
        res_edges = [e, e]

    row_bytes = width * dtype_bytes
    t_row = CALIB["base_ns"] * 1e-9 + row_bytes / CALIB["gbps"]
    t_gather = layers * sum(res_edges) * t_row

    # fwd blocks stream once in the forward, rev blocks once in the backward
    t_dense = layers * dense_bytes / HBM_GBPS

    # model matmuls: input MLP, per layer 3 projections h->heads*d plus ~2
    # attention contractions of the same rank, output MLP; backward ~2x fwd
    model_flops = 2 * n * (in_feat * hidden + out_ch * hidden)
    model_flops += layers * 2 * n * heads * d * hidden * 5
    # dense_flops_per_apply already counts BOTH directions; each direction
    # is applied once per layer (fwd in the forward, rev in the backward)
    t_mxu = (3 * model_flops + layers * dense_flops_per_apply) / MXU_FLOPS

    # activation streaming (round 5; see docstring)
    big_bytes = n * heads * d * dtype_bytes
    small_bytes = n * hidden * dtype_bytes
    big_passes = 5 * 2 if fused_mean else 5 * 3 + 4 * 2
    t_act = layers * (big_passes * big_bytes + 8 * small_bytes) / HBM_GBPS

    floor_ms = (t_gather + t_dense + t_mxu + t_act) * 1e3
    out = {
        "gather_ms": round(t_gather * 1e3, 2),
        "gathered_rows_per_layer": sum(res_edges),
        "dense_stream_ms": round(t_dense * 1e3, 2),
        "dense_block_mb": round(dense_bytes / 1e6, 1),
        "mxu_ms": round(t_mxu * 1e3, 2),
        "act_stream_ms": round(t_act * 1e3, 2),
        "roofline_ms": round(floor_ms, 2),
        "pct_of_roofline": (round(100.0 * floor_ms / step_ms, 1)
                            if step_ms else None),
    }
    if step_ms and floor_ms > step_ms:
        out["calibration"] = (
            "measured beats the uniform-random gather calibration — "
            "locality/pipelining gain, row is memory-bound (see docstring)")
    return out


def build_graph(n, e, f, seed=0, kind="uniform", comm=1024, intra=0.8):
    """kind='uniform': i.i.d. endpoints — the locality worst case.
    kind='clustered': stochastic block model (communities of ``comm`` nodes
    holding ``intra`` of the edges) — the shape of community-structured
    social graphs, and the case the block-sparse SpMM path (ops/bsr.py) is
    built for.
    kind='powerlaw': heavy-tailed endpoint distribution (Pareto α=2 node
    weights on both sides) — hub nodes reach ~6k° at the default E; the
    ogbn-proteins-like shape with no clean communities."""
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
    elif kind == "powerlaw":
        w = rng.pareto(2.0, n) + 1.0
        p = w / w.sum()
        senders = rng.choice(n, size=e, p=p).astype(np.int32)
        receivers = rng.choice(n, size=e, p=p).astype(np.int32)
    else:
        senders = rng.integers(0, n, e).astype(np.int32)
        receivers = rng.integers(0, n, e).astype(np.int32)
    order = np.argsort(receivers, kind="stable")
    return x, senders[order], receivers[order], senders, receivers


def _setup_jax():
    import jax

    if os.environ.get("BENCH_CPU") == "1":
        # smoke-test mode (the image's sitecustomize force-registers the
        # axon TPU plugin; the env var JAX_PLATFORMS is ignored)
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: big programs take minutes to compile
    # through the axon remote-compile tunnel; cached recompiles are seconds.
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    return jax


def trainer_probe(jax, *, model, ell, x, s_sorted, r_sorted, e, layers,
                  heads, graph, bench_eps, epochs=None, epoch_block=10,
                  dtype="bfloat16"):
    """Product-path throughput: ``FullBatchTrainer.fit`` — the engine
    ``cli.run_node_task`` drives — on the SAME graph/operator/model as the
    bench row, with per-epoch eval and best-val tracking (the loop the
    reference times, ``node classification/main.py:104-158``). Two
    measurements (VERDICT r3 item 1):

      * ``eval_every_epoch`` — eval_step=1, the reference's loop shape;
      * ``eval_final_only``  — same machinery, eval only at the last epoch,
        isolating the per-epoch eval-forward cost from trainer overhead.

    Reported vs the bench step rate: ``vs_bench_step`` for each. The
    eval-forward is irreducible product work (the reference does it too);
    ``eval_final_only`` is the apples-to-apples trainer-overhead number.
    """
    import jax.numpy as jnp  # noqa: F401

    from difformer_tpu.data.graph import GraphData
    from difformer_tpu.data.splits import rand_train_test_idx
    from difformer_tpu.train import FullBatchTrainer

    epochs = epochs or int(os.environ.get("BENCH_TRAINER_EPOCHS", 50))
    n = x.shape[0]
    # single-label targets (C=112 one-hot under the bce path) keep the
    # train-step program shape of the bench row while staying inside the
    # scanned path's device-acc eligibility
    y = np.random.default_rng(2).integers(0, 112, size=n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    graph_data = GraphData.from_numpy(x, np.stack([s_sorted, r_sorted]))
    trainer = FullBatchTrainer(
        model, graph_data, y, lr=1e-2, weight_decay=0.0, loss="bce",
        metric="acc", model_kwargs={"ell": ell} if ell is not None else None)

    def timed_fit(eval_step, tag):
        # warm run with the SAME epoch count (the scanned fit compiles
        # length-keyed blocks incl. prologue/remainder lengths; a shorter
        # warm run would leave the timed run paying a compile)
        trainer.fit(split, epochs=epochs, runs=1, eval_step=eval_step,
                    epoch_block=epoch_block)
        t0 = time.perf_counter()
        trainer.fit(split, epochs=epochs, runs=1, eval_step=eval_step,
                    epoch_block=epoch_block)
        dt = (time.perf_counter() - t0) / epochs
        print(f"# [{graph} H={heads}] trainer/{tag}: {dt * 1e3:.1f} ms/epoch",
              file=sys.stderr, flush=True)
        return dt

    t_eval1 = timed_fit(1, "eval-every-epoch")
    t_evalN = timed_fit(10 ** 9, "eval-final-only")
    eps1 = e * layers / t_eval1
    epsN = e * layers / t_evalN
    return {
        "epochs": epochs, "epoch_block": epoch_block,
        "eval_every_epoch": {
            "epoch_ms": round(t_eval1 * 1e3, 2),
            "edges_per_s": round(eps1, 1),
            "vs_bench_step": round(eps1 / bench_eps, 3),
        },
        "eval_final_only": {
            "epoch_ms": round(t_evalN * 1e3, 2),
            "edges_per_s": round(epsN, 1),
            "vs_bench_step": round(epsN / bench_eps, 3),
        },
        "eval_forward_ms": round((t_eval1 - t_evalN) * 1e3, 2),
    }


def run_config(jax, *, graph, heads, impl="auto", label=None, n=N_DEF,
               e=E_DEF,
               steps=8, dtype="bfloat16", use_graph=True, run_naive=False,
               tile=256, seed=0, remat=False, with_trainer=False,
               trainer_epochs=None):
    """Measure one (graph kind, head count) operating point. Returns a dict
    row for the detail list. ``remat=True`` checkpoints the per-layer branch
    activations — needed when E*H*D activations exceed HBM (uniform H=8)."""
    import jax.numpy as jnp
    import optax

    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.ops.bsr import choose_spmm, dense_coverage
    from difformer_tpu.train.optim import torch_adam

    F, C, LAYERS = 64, 112, 3
    x, s_sorted, r_sorted, s_uns, r_uns = build_graph(n, e, F, seed=seed,
                                                      kind=graph)
    y = np.random.default_rng(1).integers(0, 2, size=(n, C)).astype(np.float32)

    coverage = dense_coverage(s_sorted, r_sorted, n, tile=tile)
    if impl == "auto":
        impl, coverage = choose_spmm(s_sorted, r_sorted, n, tile=tile)
    if impl == "bsr-sorted":
        # hub-clustering relabel (ops/bsr.degree_sorted_order): permute
        # features/labels once on host; training is equivalent up to node
        # order, and hub blocks become dense tiles for the MXU path
        from difformer_tpu.ops.bsr import degree_sorted_order

        perm = degree_sorted_order(s_uns, r_uns, n)
        inv = np.argsort(perm)
        x, y = x[inv], y[inv]
        s_uns, r_uns = perm[s_uns].astype(np.int32), perm[r_uns].astype(np.int32)
        order = np.argsort(r_uns, kind="stable")
        s_sorted, r_sorted = s_uns[order], r_uns[order]
        impl = "bsr"
        impl_label = "bsr-sorted"
    else:
        impl_label = impl
    print(f"# [{graph} H={heads}] impl={impl_label} "
          f"dense_coverage={coverage:.3f}", file=sys.stderr, flush=True)

    # multi-head rows gather (ÂX)Wv instead of Â(XWv): H·D-wide per-edge
    # rows shrink to F+1 — the measured H=8 bottleneck (roofline gather
    # term). BENCH_SPMM_FIRST=0 reverts to reference operation order.
    spmm_first = heads > 1 and os.environ.get("BENCH_SPMM_FIRST", "1") == "1"
    # round 5: head-mean fusion (no [N, H, D] branch outputs; see
    # nn/difformer.fuse_head_mean). BENCH_FUSE_MEAN=0 reverts to the
    # reference head-mean order for A/B.
    fuse_mean = (heads > 1
                 and os.environ.get("BENCH_FUSE_MEAN", "1") == "1")
    model = DIFFormer(hidden_channels=64, out_channels=C, num_layers=LAYERS,
                      num_heads=heads, kernel="simple", dropout=0.0,
                      use_graph=use_graph, compute_dtype=dtype or None,
                      remat=remat, spmm_first=spmm_first,
                      fuse_head_mean=fuse_mean)
    # the naive baseline must keep the REFERENCE operation order
    # (gcn_conv over H·D-wide value projections, difformer.py:130, mean
    # after stacking heads) — a line-by-line port would have neither the
    # spmm_first rewrite nor the head-mean fusion; same param tree, so the
    # measured model's init works for both
    naive_model = DIFFormer(hidden_channels=64, out_channels=C,
                            num_layers=LAYERS, num_heads=heads,
                            kernel="simple", dropout=0.0,
                            use_graph=use_graph,
                            compute_dtype=dtype or None, remat=remat,
                            fuse_head_mean=False)
    if spmm_first:
        impl_label += "+spmm1st"
    if fuse_mean:
        impl_label += "+fusedmean"
    xs = jnp.asarray(x)
    labels = jnp.asarray(y)
    tx = torch_adam(1e-2, 0.0)

    # NOTE (round 5): the operator BUILD is deferred until after the naive
    # measurement — at proteins density the BSR blocks alone are ~7 GB and
    # their coexistence with the naive step OOM'd the naive, the trainer
    # probe, and (via leaked executables) every later sweep row
    def build_operator(impl_label):
        ell = None
        t0 = time.perf_counter()
        if impl == "ell":
            from difformer_tpu.ops.ell import build_ell_gcn

            ell = build_ell_gcn(s_sorted, r_sorted, n)
            print(f"# ELL built in {time.perf_counter() - t0:.1f}s "
                  f"buckets={ell[0].bucket_sizes}", file=sys.stderr,
                  flush=True)
        elif impl == "bsr":
            from difformer_tpu.ops.bsr import (
                build_bsr_bucketed_gcn,
                build_bsr_gcn,
            )

            kw = {}
            if os.environ.get("BENCH_BLOCK_BF16", "1") == "1":
                kw["block_dtype"] = jnp.bfloat16  # same step, half HBM
            if os.environ.get("BENCH_RES_TIGHT") == "0":
                kw["residual_kwargs"] = {}  # loose bucketing (pre-tuning)
            # int8 scaled-count blocks (round 5, bucketed layout only):
            # rank-1 GCN tiles store exact int8 edge counts + O(N) degree
            # scaling at matvec — half the bf16 block stream, 2x the tile
            # coverage per budget byte. BENCH_BLOCK_INT8=0 reverts for A/B.
            int8_kw = ("auto" if os.environ.get("BENCH_BLOCK_INT8", "1")
                       == "1" else False)
            # Kb-bucketed layout (BsrBuckets) with the on-chip-calibrated
            # occupancy threshold (bucketed_min_edges): measured 100.0 ms
            # vs the padded+cap layout's 115.4 ms on the powerlaw headline
            # (min_edges sweep record in BENCH_NOTES.md). A/B knobs:
            # BENCH_LAYOUT=padded, BENCH_MIN_EDGES, BENCH_BUDGET_GB.
            if os.environ.get("BENCH_LAYOUT", "bucketed") == "bucketed":
                if "BENCH_BUDGET_GB" in os.environ:
                    kw["budget_bytes"] = (
                        float(os.environ["BENCH_BUDGET_GB"]) * 2 ** 30)
                if "BENCH_MIN_EDGES" in os.environ:
                    kw["min_edges"] = int(os.environ["BENCH_MIN_EDGES"])
                ell = build_bsr_bucketed_gcn(s_sorted, r_sorted, n,
                                             tile=tile, verbose=True,
                                             scaled_int8=int8_kw, **kw)
                impl_label += "-bucketed"
                if ell[0].inv_scale is not None:
                    impl_label += "-int8"
            else:
                ell = build_bsr_gcn(s_sorted, r_sorted, n, tile=tile,
                                    verbose=True, **kw)
            print(f"# BSR built in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        return ell, impl_label

    def make_multi_step(senders, receivers, sorted_, ell_op=None,
                        use_model=None):
        mdl = use_model if use_model is not None else model
        s = jnp.asarray(senders)
        r = jnp.asarray(receivers)

        # all large arrays are jit ARGUMENTS (closed-over device arrays
        # would be embedded as constants and wreck compile time)
        def loss(params, xs, s, r, labels, ell_arg):
            out = mdl.apply(
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
                body, (params, opt_state), None, length=steps
            )
            return params, opt_state, ls[-1]

        return lambda p, o: multi(p, o, xs, s, r, labels, ell_op)

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
        print(f"# [{graph} H={heads}] {tag}: compile+{steps} steps "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        # min over a few calls: per-call dispatch latency through the
        # remote-TPU tunnel is noisy (tens of ms, occasional spikes)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            p1, o1, l = multi(p1, o1)
            float(l)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"# [{graph} H={heads}] {tag}: {best * 1e3:.1f} ms/step "
              f"(min of {reps})", file=sys.stderr, flush=True)
        return best

    # naive FIRST, with no prebuilt operator resident (see build_operator
    # note); then free its executable before the operator build
    naive_eps = None
    naive_note = None
    if run_naive:
        try:
            t_naive = timeit(
                make_multi_step(s_uns, r_uns, False,
                                use_model=naive_model), "naive",
                reps=2)
            naive_eps = e * LAYERS / t_naive
        except Exception as err:
            # e.g. HBM OOM on the [E, H·D] unsorted-scatter messages at
            # proteins edge density — the reference full-graph path cannot
            # run there at all (its answer is mini-batching,
            # main-batch.py:126-133); report that instead of dying
            run_naive = False
            naive_note = (f"reference-structure full-graph step failed at "
                          f"this scale ({type(err).__name__}) — the "
                          f"reference's only path here is mini-batching")
            print(f"# [{graph} H={heads}] naive failed ({err}); "
                  f"recording note", file=sys.stderr, flush=True)
    elif (graph, heads) in NAIVE_EDGES_PER_S and (n, e) == (N_DEF, E_DEF):
        # cached constants were measured at the default shape only — at any
        # other (n, e) report null rather than a wrong-shape ratio
        naive_eps = NAIVE_EDGES_PER_S[(graph, heads)]
    import gc

    gc.collect()   # drop the naive executable + its donated buffers

    ell, impl_label = build_operator(impl_label)
    t_fast = timeit(make_multi_step(s_sorted, r_sorted, True, ell_op=ell),
                    impl)
    edges_per_s = e * LAYERS / t_fast

    dtype_bytes = 2 if dtype == "bfloat16" else 4
    roofline = roofline_account(
        ell, impl=impl_label, e=e, layers=LAYERS, heads=heads, d=64,
        dtype_bytes=dtype_bytes, n=n, in_feat=F, hidden=64, out_ch=C,
        step_ms=t_fast * 1e3,
        row_width=(F + 1) if spmm_first
        else (64 if fuse_mean else None),
        fused_mean=fuse_mean or heads == 1)

    row = {
        "graph": label or graph, "heads": heads, "impl": impl_label,
        "n_nodes": n, "n_edges": e,
        "dense_coverage": round(coverage, 3),
        "edges_per_s": round(edges_per_s, 1),
        "step_ms": round(t_fast * 1e3, 2),
        "remat": remat,
        "vs_baseline": (round(edges_per_s / naive_eps, 3)
                        if naive_eps else None),
        "naive_edges_per_s": (round(naive_eps, 1) if naive_eps else None),
        "naive_measured_now": bool(run_naive),
        "calibration_measured_now": CALIB["measured_now"],
        "roofline": roofline,
    }
    if naive_note:
        row["naive_note"] = naive_note
    if with_trainer:
        # product-path (FullBatchTrainer/cli engine) throughput on the same
        # graph + operator + model — VERDICT r3 item 1
        gc.collect()   # free the bench multi-step executable first
        try:
            row["trainer"] = trainer_probe(
                jax, model=model, ell=ell, x=x, s_sorted=s_sorted,
                r_sorted=r_sorted, e=e, layers=LAYERS, heads=heads,
                graph=graph, bench_eps=edges_per_s, dtype=dtype,
                epochs=trainer_epochs)
        except Exception as err:
            print(f"# [{graph} H={heads}] trainer probe failed ({err})",
                  file=sys.stderr, flush=True)
            row["trainer"] = {"error": f"{type(err).__name__}: {err}"}
    return row


def run_minibatch_config(jax, *, n=N_DEF, e=E_DEF, dtype="bfloat16",
                         batch_size=10000, epochs=None, seed=0, label=None,
                         run_naive=None):
    """Trainer-level mini-batch row: the ogbn-proteins recipe
    (``node classification/run.sh:37-39`` — batch 10000, 3 layers, h=64,
    BCE) through the PRODUCT engine ``train/minibatch.MiniBatchTrainer`` on
    the powerlaw (proteins-shaped) graph: per epoch a random node
    permutation is cut into chunks, each trains on its induced subgraph
    (native C++ extraction, host prep overlapped with device compute), eval
    every 9 epochs (the preset's eval_step) over the full graph on device.
    Throughput unit: nodes/s (every node is trained once per epoch); the
    induced-subgraph edge count (measured host-side) gives edges/s trained.
    """
    import jax.numpy as jnp  # noqa: F401

    from difformer_tpu.data.splits import rand_train_test_idx
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.train.minibatch import MiniBatchTrainer

    epochs = epochs or int(os.environ.get("BENCH_MINIBATCH_EPOCHS", 18))
    F, C, LAYERS = 64, 112, 3
    x, s_sorted, r_sorted, _, _ = build_graph(n, e, F, seed=seed,
                                              kind="powerlaw")
    y = np.random.default_rng(2).integers(0, C, size=n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)

    model = DIFFormer(hidden_channels=64, out_channels=C, num_layers=LAYERS,
                      num_heads=1, kernel="simple", dropout=0.0,
                      compute_dtype=dtype or None)
    trainer = MiniBatchTrainer(model, x, np.stack([s_sorted, r_sorted]), y,
                               batch_size=batch_size, lr=1e-2,
                               weight_decay=0.0, loss="bce", metric="acc")

    # measured induced-subgraph edge count for one epoch's chunks (the
    # edges actually trained; cross-chunk edges drop by design)
    rng = np.random.default_rng(3)
    idx = rng.permutation(n)
    sub_edges = 0
    from difformer_tpu import native
    for i in range(-(-n // batch_size)):
        chunk = idx[i * batch_size:(i + 1) * batch_size]
        if native.available():
            sub = native.induced_subgraph(s_sorted, r_sorted, chunk, n)
        else:
            from difformer_tpu.data.transforms import subgraph
            sub, _ = subgraph(chunk, np.stack([s_sorted, r_sorted]), n)
        sub_edges += sub.shape[1]

    t0 = time.perf_counter()
    trainer.fit(split, epochs=2, runs=1, eval_step=10 ** 9)   # compile warm
    print(f"# [minibatch] warm 2 epochs {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    trainer.fit(split, epochs=epochs, runs=1, eval_step=9)
    dt = (time.perf_counter() - t0) / epochs
    print(f"# [minibatch] {dt * 1e3:.1f} ms/epoch "
          f"({n / dt / 1e6:.2f} M nodes/s)", file=sys.stderr, flush=True)

    # reference-structure naive loop, same invocation (VERDICT r4 item 6):
    # per epoch a fresh host permutation; per chunk a HOST induced-subgraph
    # extraction, a host->device feature/label upload, and ONE dispatch
    # (main-batch.py:126-142); every 9 epochs a full-graph forward whose
    # [N, C] logits are fetched to host and scored there (the de-facto
    # shape of eval.py:34-63 — the reference even moves the model to CPU,
    # which we charitably do NOT charge). Same model, same loss, same
    # static edge buckets (a torch loop has no compile, so bucketing is
    # charity, not cost).
    if run_naive is None:
        run_naive = os.environ.get("BENCH_RUN_NAIVE", "1") == "1"
    naive_dt = None
    if run_naive:
        import jax.numpy as jnp
        import optax

        from difformer_tpu.data.transforms import (
            edge_bucket,
            pad_edges,
            subgraph,
        )
        from difformer_tpu.train.optim import torch_adam

        ei_full = np.stack([s_sorted, r_sorted])
        y_oh = np.zeros((n, C), np.float32)
        y_oh[np.arange(n), y] = 1.0
        tx = torch_adam(1e-2, 0.0)

        @jax.jit
        def chunk_step(params, opt_state, x_i, s, r, em, y_i):
            def loss_fn(p):
                out = model.apply({"params": p}, x_i, s, r, train=False,
                                  edge_mask=em)
                return optax.sigmoid_binary_cross_entropy(out, y_i).mean()

            l, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, l

        e_b_full = edge_bucket(e)
        ei_pad, _, em_full = pad_edges(ei_full, None, e_b_full)
        full_args = (jnp.asarray(x), jnp.asarray(ei_pad[0], jnp.int32),
                     jnp.asarray(ei_pad[1], jnp.int32), jnp.asarray(em_full))

        @jax.jit
        def full_fwd(params, xs, s, r, em):
            return model.apply({"params": params}, xs, s, r, train=False,
                               edge_mask=em)

        chunk_bucket = trainer._estimate_chunk_edges()

        def naive_run(epochs_, params, opt_state, seed_):
            rng_np = np.random.default_rng(seed_)
            for ep in range(epochs_):
                idx = rng_np.permutation(n)
                for i in range(-(-n // batch_size)):
                    chunk = idx[i * batch_size:(i + 1) * batch_size]
                    sub, _ = subgraph(chunk, ei_full, n)   # host extract
                    sub_p, _, em = pad_edges(sub, None, chunk_bucket)
                    params, opt_state, loss = chunk_step(
                        params, opt_state, x[chunk],        # host upload
                        sub_p[0].astype(np.int32), sub_p[1].astype(np.int32),
                        em, y_oh[chunk])
                if ep % 9 == 0 or ep == epochs_ - 1:
                    logits = np.asarray(full_fwd(params, *full_args))
                    for name in ("train", "valid", "test"):
                        sp = np.asarray(split[name])
                        (np.argmax(logits[sp], -1) == y[sp]).mean()
            float(loss)
            return params, opt_state

        p0 = trainer.init_state(0)
        t0 = time.perf_counter()
        p1 = naive_run(2, *p0, 7)                        # compile warm
        print(f"# [minibatch naive] warm 2 epochs "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
              flush=True)
        t0 = time.perf_counter()
        naive_run(epochs, *p1, 8)
        naive_dt = (time.perf_counter() - t0) / epochs
        print(f"# [minibatch naive] {naive_dt * 1e3:.1f} ms/epoch",
              file=sys.stderr, flush=True)

    return {
        "graph": label or "powerlaw-minibatch", "heads": 1,
        "impl": f"minibatch-{batch_size}",
        "n_nodes": n, "n_edges": e,
        "dense_coverage": None,
        "edges_per_s": round(sub_edges * LAYERS / dt, 1),
        "nodes_per_s": round(n / dt, 1),
        "epoch_ms": round(dt * 1e3, 2),
        "step_ms": None, "remat": False,
        "sub_edges_per_epoch": int(sub_edges),
        "epochs": epochs, "eval_step": 9,
        "vs_baseline": (round(naive_dt / dt, 3) if naive_dt else None),
        "naive_edges_per_s": (round(sub_edges * LAYERS / naive_dt, 1)
                              if naive_dt else None),
        "naive_epoch_ms": (round(naive_dt * 1e3, 2) if naive_dt else None),
        "naive_measured_now": bool(naive_dt),
        "naive_note": ("reference-structure loop measured same-invocation: "
                       "per-chunk host subgraph + host upload + one "
                       "dispatch, host full-graph eval (main-batch.py:"
                       "126-145, eval.py:34-63)" if naive_dt else
                       "naive comparator disabled (BENCH_RUN_NAIVE=0)"),
        "calibration_measured_now": CALIB["measured_now"],
        "roofline": None,
    }


def run_sigmoid_config(jax, *, n=4096, heads=1, layers=3, steps=8,
                       dtype="bfloat16", seed=0):
    """DIFFormer-a operating point: full train step of the sigmoid (O(N²))
    model — graph branch ON — at the reference's sigmoid scale (it only
    ever runs the sigmoid kernel on graphs ≤ ~20k nodes — chameleon/
    squirrel/cora, ``node classification/run.sh:47-77``). The sweep includes
    the model AS THE REFERENCE RUNS IT (VERDICT r3 item 4): the cora-a
    shape — 8 layers, h=64, --use_graph (``run.sh:9-11``) — at N ∈
    {4096, 32768}, plus an H=4 row confirming the Pallas head grid scales.
    The production path is the auto dispatch (dense under the measured
    crossover, Pallas flash fwd+bwd kernels above it); the naive baseline
    is the reference's structure — materialize the [N, L, H] score tensor
    (``difformer.py:45-56``, here ``ops.sigmoid_attention_dense``) with
    unsorted-scatter gcn_conv — measured inline on the same graph where it
    fits. Row metric: pairs/s (N²·H·layers per step) plus edges/s for
    table consistency."""
    import jax.numpy as jnp
    import optax

    import difformer_tpu.nn.difformer as dif_mod
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.ops.sigmoid_attention import sigmoid_attention_dense
    from difformer_tpu.train.optim import torch_adam

    F, C, LAYERS = 64, 112, layers
    e = 16 * n
    x, s_sorted, r_sorted, s_uns, r_uns = build_graph(n, e, F, seed=seed,
                                                      kind="uniform")
    y = np.random.default_rng(1).integers(0, 2, size=(n, C)).astype(np.float32)

    model = DIFFormer(hidden_channels=64, out_channels=C, num_layers=LAYERS,
                      num_heads=heads, kernel="sigmoid", dropout=0.0,
                      use_graph=True, compute_dtype=dtype or None)
    xs = jnp.asarray(x)
    labels = jnp.asarray(y)
    tx = torch_adam(1e-2, 0.0)

    def make_multi_step(senders, receivers, sorted_):
        s = jnp.asarray(senders)
        r = jnp.asarray(receivers)

        def loss(params, xs, s, r, labels):
            out = model.apply({"params": params}, xs, s, r, train=False,
                              indices_are_sorted=sorted_)
            return optax.sigmoid_binary_cross_entropy(out, labels).mean()

        @jax.jit
        def multi(params, opt_state, xs, s, r, labels):
            def body(carry, _):
                params, opt_state = carry
                l, g = jax.value_and_grad(loss)(params, xs, s, r, labels)
                updates, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), l

            (params, opt_state), ls = jax.lax.scan(
                body, (params, opt_state), None, length=steps)
            return params, opt_state, ls[-1]

        return lambda p, o: multi(p, o, xs, s, r, labels)

    variables = model.init(
        jax.random.PRNGKey(0), xs, jnp.asarray(s_sorted[:128]),
        jnp.asarray(r_sorted[:128]), train=False,
    )

    def prep(multi, tag):
        """Compile, then return a one-timed-pass closure (round 5: fast and
        naive passes are INTERLEAVED rather than measured back-to-back —
        the first timed executions of a fresh executable run up to ~30%
        slow on the tunneled chip, which biased whichever side was
        measured first; min-over-interleaved-passes is order-free)."""
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        opt_state = tx.init(params)
        t0 = time.perf_counter()
        p1, o1, l = multi(params, opt_state)
        float(l)
        print(f"# [sigmoid N={n} H={heads}] {tag}: compile+{steps} steps "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        state = [p1, o1]

        def one_pass():
            t0 = time.perf_counter()
            state[0], state[1], l = multi(state[0], state[1])
            float(l)
            return (time.perf_counter() - t0) / steps

        return one_pass

    sorted_hint = os.environ.get("BENCH_SIGMOID_SORTED", "1") == "1"
    fast_pass = prep(make_multi_step(s_sorted, r_sorted, sorted_hint),
                     "flash")

    # naive: reference-structure dense scores, same model/protocol, swapped
    # in at the model's attention dispatch for the duration of the trace.
    # Beyond ~16k nodes the [N, N, H] f32 score tensor (+ cotangent) passes
    # ~4 GB and the reference's own path OOMs (difformer.py:45-56) — the
    # flash row then reports vs_baseline null with the reason.
    naive_pass = None
    naive_note = None
    # the dense [N, N, H] f32 score tensor + its backward cotangent must fit
    if n <= 16384 and n * n * heads * 4 <= 2 * 2 ** 30:
        saved = dif_mod.sigmoid_attention
        dif_mod.sigmoid_attention = (
            lambda q, k, v, **kw: sigmoid_attention_dense(
                q, k, v, key_mask=kw.get("key_mask")))
        try:
            # the monkeypatch only needs to be live while prep TRACES the
            # naive executable; timed passes run the compiled artifact
            naive_pass = prep(make_multi_step(s_uns, r_uns, False),
                              "naive-dense")
        except Exception as err:
            naive_note = f"naive-dense failed: {type(err).__name__}"
            print(f"# [sigmoid N={n}] {naive_note}", file=sys.stderr,
                  flush=True)
        finally:
            dif_mod.sigmoid_attention = saved
    else:
        naive_note = "reference dense path OOMs at this N"

    t_fast = float("inf")
    t_naive = float("inf") if naive_pass is not None else None
    for _ in range(4):
        t_fast = min(t_fast, fast_pass())
        if naive_pass is not None:
            t_naive = min(t_naive, naive_pass())
    print(f"# [sigmoid N={n} H={heads}] flash: {t_fast * 1e3:.1f} ms/step"
          + (f", naive-dense: {t_naive * 1e3:.1f} ms/step"
             if t_naive else "")
          + " (min of 4 interleaved passes)", file=sys.stderr, flush=True)

    # roofline, matched to the path the auto dispatch actually runs:
    #  * flash (n >= 8192): 3 score-tile evaluations per layer-step (fwd +
    #    dq + dkv backward recomputes) at the measured VPU sigmoid floor,
    #    plus 7 N²-rank MXU matmuls (BENCH_NOTES "VPU-bound analysis")
    #  * dense (n < 8192): 1 sigmoid evaluation (scores materialized, the
    #    backward reuses them), ~5 N²-rank matmuls, plus streaming the
    #    [N, L, H] f32 score tensor to and from HBM (write fwd, read bwd)
    pairs = float(n) * n * heads
    if n >= 8192:
        t_vpu = LAYERS * 3 * pairs / SIGMOID_VPU_PAIRS
        t_mxu = LAYERS * 7 * 2 * pairs * 64 / MXU_FLOPS
        t_stream = 0.0
    else:
        t_vpu = LAYERS * 1 * pairs / SIGMOID_VPU_PAIRS
        t_mxu = LAYERS * 5 * 2 * pairs * 64 / MXU_FLOPS
        t_stream = LAYERS * 2 * pairs * 4 / HBM_GBPS
    floor_ms = (t_vpu + t_mxu + t_stream) * 1e3
    pairs_per_s = pairs * LAYERS / t_fast
    # below the measured crossover the auto dispatch IS the dense path
    # (ops/sigmoid_attention auto: dense < 8192, Pallas >= 8192), so small-N
    # rows compare dense-on-sorted vs dense-on-unsorted (≈1.0 by design)
    impl_label = "flash-sigmoid" if n >= 8192 else "auto-dense-sigmoid"
    name = (f"sigmoid-{n}" + (f"-L{layers}" if layers != 3 else "")
            + (f"-H{heads}" if heads != 1 else ""))

    # steady-state product-path measurement (VERDICT r4 item 5): the
    # cora-a recipe (8 layers, use_graph, run.sh:9-11) through the
    # epoch-SCANNED FullBatchTrainer — one dispatch per block of epochs,
    # so the per-call dispatch floor the bare-step 0.93–0.94 readings were
    # attributed to is fully amortized — flash/auto vs the
    # reference-structure dense dispatch, same invocation.
    trainer = None
    if (os.environ.get("BENCH_SIGMOID_TRAINER", "1") == "1"
            and layers == 8 and t_naive is not None):
        from difformer_tpu.data.graph import GraphData
        from difformer_tpu.data.splits import rand_train_test_idx
        from difformer_tpu.train import FullBatchTrainer

        ep = int(os.environ.get("BENCH_SIGMOID_TRAINER_EPOCHS", 100))
        y1 = np.random.default_rng(2).integers(0, C, size=n)
        split = rand_train_test_idx(y1, 0.5, 0.25, rng=0)

        def make_fit(sorted_edges):
            gd = GraphData.from_numpy(
                x, np.stack([s_sorted, r_sorted] if sorted_edges
                            else [s_uns, r_uns]))
            tr = FullBatchTrainer(
                model, gd, y1, lr=1e-2, weight_decay=0.0, loss="nll",
                metric="acc",
                model_kwargs={"indices_are_sorted": sorted_edges})
            # compile + warm (traces under whatever attention dispatch is
            # live right now; timed passes reuse the compiled executable)
            tr.fit(split, epochs=ep, eval_step=10 ** 9, epoch_block=25)

            def one_pass():
                t0 = time.perf_counter()
                tr.fit(split, epochs=ep, eval_step=10 ** 9, epoch_block=25)
                return (time.perf_counter() - t0) / ep

            return one_pass

        fit_fast = make_fit(sorted_hint)
        saved = dif_mod.sigmoid_attention
        dif_mod.sigmoid_attention = (
            lambda q, k, v, **kw: sigmoid_attention_dense(
                q, k, v, key_mask=kw.get("key_mask")))
        try:
            fit_naive = make_fit(False)
        finally:
            dif_mod.sigmoid_attention = saved
        # interleaved passes (same rationale as the bare-step prep note)
        t_tr_fast = t_tr_naive = float("inf")
        for _ in range(3):
            t_tr_fast = min(t_tr_fast, fit_fast())
            t_tr_naive = min(t_tr_naive, fit_naive())
        print(f"# [sigmoid N={n}] scanned-trainer flash/auto: "
              f"{t_tr_fast * 1e3:.2f} ms/epoch, naive-dense: "
              f"{t_tr_naive * 1e3:.2f} ms/epoch (min of 3 interleaved "
              f"fits, {ep} epochs per fit)", file=sys.stderr, flush=True)
        trainer = {
            "epochs_per_fit": ep, "epoch_block": 25,
            "epoch_ms": round(t_tr_fast * 1e3, 2),
            "naive_epoch_ms": round(t_tr_naive * 1e3, 2),
            "vs_naive_steady_state": round(t_tr_naive / t_tr_fast, 3),
        }

    return {
        "graph": name, "heads": heads, "layers": layers,
        "impl": impl_label,
        "dense_coverage": None,
        "edges_per_s": round(e * LAYERS / t_fast, 1),
        "pairs_per_s": round(pairs_per_s, 1),
        "step_ms": round(t_fast * 1e3, 2),
        "remat": False,
        "vs_baseline": (round(t_naive / t_fast, 3) if t_naive else None),
        "naive_step_ms": (round(t_naive * 1e3, 2) if t_naive else None),
        "naive_edges_per_s": (round(e * LAYERS / t_naive, 1)
                              if t_naive else None),
        "naive_measured_now": t_naive is not None,
        "naive_note": naive_note,
        "roofline": {
            "vpu_sigmoid_ms": round(t_vpu * 1e3, 2),
            "mxu_ms": round(t_mxu * 1e3, 2),
            "score_stream_ms": round(t_stream * 1e3, 2),
            "roofline_ms": round(floor_ms, 2),
            "pct_of_roofline": round(100.0 * floor_ms / (t_fast * 1e3), 1),
        },
        **({"trainer": trainer} if trainer else {}),
    }


def main():
    jax = _setup_jax()

    steps = int(os.environ.get("BENCH_STEPS", 8))
    n = int(os.environ.get("BENCH_N", N_DEF))
    e = int(os.environ.get("BENCH_E", E_DEF))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # default ON: same-invocation baselines kill the chip-day-drift caveat
    # (1.6x observed on gather-bound programs, BENCH_NOTES.md)
    run_naive = os.environ.get("BENCH_RUN_NAIVE", "1") == "1"
    use_graph = os.environ.get("BENCH_USE_GRAPH", "1") == "1"
    tile = int(os.environ.get("BENCH_TILE", 256))

    if os.environ.get("BENCH_SIGMOID_ONLY") == "1":
        # child mode for the bounded-subprocess sigmoid row (see below)
        row = run_sigmoid_config(
            jax, n=int(os.environ.get("BENCH_SIGMOID_N", 4096)),
            layers=int(os.environ.get("BENCH_SIGMOID_LAYERS", 3)),
            heads=int(os.environ.get("BENCH_SIGMOID_HEADS", 1)),
            steps=steps, dtype=dtype)
        print(json.dumps(row), flush=True)
        return 0

    single = any(k in os.environ for k in
                 ("BENCH_GRAPH", "BENCH_IMPL", "BENCH_HEADS"))
    common = dict(n=n, e=e, steps=steps, dtype=dtype, use_graph=use_graph,
                  run_naive=run_naive, tile=tile)
    print(f"# bench: N={n} E={e} steps={steps} "
          f"mode={'single' if single else 'sweep'} "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    # same-run gather floor (VERDICT r3 item 2): pct_of_roofline compares
    # against THIS invocation's measured constants, so drift can never
    # masquerade as (or hide) a regression. BENCH_CALIBRATE=0 opts out.
    if os.environ.get("BENCH_CALIBRATE", "1") == "1":
        calibrate_gather(jax)

    rows = []

    def final_json(head, *, partial=False):
        detail = {
            "headline": {"graph": head.get("graph"),
                         "heads": head.get("heads"),
                         "impl": head.get("impl")},
            "n_nodes": n, "n_edges": e, "layers": 3, "hidden": 64,
            "dtype": dtype or "float32",
            "backend": jax.default_backend(),
            "gather_calibration": CALIB["detail"],
            "rows": rows,
        }
        if partial:
            detail["partial"] = True
        return json.dumps({
            "metric": "edges_per_s_per_chip",
            "value": head.get("edges_per_s"),
            "unit": "edges/s",
            "vs_baseline": head.get("vs_baseline"),
            "detail": detail,
        })

    def _on_term(signum, frame):
        # The sweep takes over an hour and only prints its JSON line at
        # the end; a driver-side `timeout` (SIGTERM) must not lose every
        # row already measured. Emit what exists, marked partial, and
        # exit hard (a live sigmoid child subprocess, if any, finishes
        # its own bounded row and dies; os._exit skips atexit/teardown
        # on purpose — the process is being killed anyway).
        head = next((r for r in rows
                     if r.get("graph") == "powerlaw"
                     and r.get("heads") == 1), None)
        head = head or next((r for r in rows if r.get("edges_per_s")), None)
        print(f"# SIGTERM during sweep: emitting {len(rows)} partial "
              f"row(s)", file=sys.stderr, flush=True)
        if head is None:
            os._exit(124)
        print(final_json(head, partial=True), flush=True)
        os._exit(0)

    import signal

    signal.signal(signal.SIGTERM, _on_term)

    if single:
        single_kw = {}
        if os.environ.get("BENCH_WITH_TRAINER") == "1":
            single_kw = dict(with_trainer=True, trainer_epochs=int(
                os.environ.get("BENCH_TRAINER_EPOCHS", 10)))
        rows = [run_config(
            jax, graph=os.environ.get("BENCH_GRAPH", "clustered"),
            heads=int(os.environ.get("BENCH_HEADS", 1)),
            impl=os.environ.get("BENCH_IMPL", "auto"),
            remat=os.environ.get("BENCH_REMAT") == "1", **single_kw,
            **common)]
        head = rows[0]
    else:
        matrix = [("clustered", 1), ("powerlaw", 1), ("uniform", 1),
                  ("clustered", 8), ("powerlaw", 8), ("uniform", 8)]
        # trainer-level (product path) probe on the headline shapes
        # (clustered/powerlaw at both head counts — VERDICT r3 item 1);
        # uniform is skipped by default to bound wall time (same machinery,
        # slower rows). BENCH_TRAINER=0 disables, =all probes every row.
        tr_mode = os.environ.get("BENCH_TRAINER", "1")
        trainer_set = (set(matrix) if tr_mode == "all"
                       else {("clustered", 1), ("powerlaw", 1),
                             ("uniform", 1),
                             ("clustered", 8), ("powerlaw", 8)}
                       if tr_mode == "1" else set())
        rows = []

        def row_gc():
            # drop every compiled executable + its captured constants
            # between rows — one row's leaked HBM (7 GB of BSR blocks at
            # proteins density, round 5) must not OOM the rest of the sweep
            import gc

            jax.clear_caches()
            gc.collect()

        for g, h in matrix:
            wt = (g, h) in trainer_set
            try:
                rows.append(run_config(jax, graph=g, heads=h, impl="auto",
                                       with_trainer=wt, **common))
            except Exception as err:   # e.g. HBM OOM at E*H*D activations
                print(f"# [{g} H={h}] failed ({err}); retrying with remat",
                      file=sys.stderr, flush=True)
                row_gc()
                rows.append(run_config(jax, graph=g, heads=h, impl="auto",
                                       remat=True, with_trainer=wt, **common))
            row_gc()
        if os.environ.get("BENCH_PROTEINS_DENSITY", "1") == "1":
            # VERDICT r4 item 1: full-graph row at REAL ogbn-proteins edge
            # density — N=131072, E≈39.5M (the bench default E=4.2M matches
            # proteins' node count but not its ~300 mean in-degree /
            # ~600 undirected mean degree). The reference only survives
            # this density by mini-batching (node classification/
            # run.sh:37-39, main-batch.py:126-133); the naive comparator
            # here IS its full-graph structure, measured or OOM-noted.
            e_pd = int(os.environ.get("BENCH_PD_E", 39_500_000))
            pd_common = dict(common, e=e_pd)
            try:
                rows.append(run_config(
                    jax, graph="powerlaw", heads=1, impl="auto",
                    label="proteins-density", with_trainer=tr_mode != "0",
                    trainer_epochs=int(os.environ.get(
                        "BENCH_PD_TRAINER_EPOCHS", 10)), **pd_common))
            except Exception as err:
                print(f"# [proteins-density] failed ({err}); retrying with "
                      f"remat", file=sys.stderr, flush=True)
                row_gc()
                try:
                    rows.append(run_config(
                        jax, graph="powerlaw", heads=1, impl="auto",
                        label="proteins-density", remat=True,
                        with_trainer=tr_mode != "0",
                        trainer_epochs=int(os.environ.get(
                            "BENCH_PD_TRAINER_EPOCHS", 10)), **pd_common))
                except Exception as err2:
                    print(f"# [proteins-density] failed again ({err2}); "
                          f"continuing without it", file=sys.stderr,
                          flush=True)
            row_gc()
        if os.environ.get("BENCH_MINIBATCH", "1") == "1":
            try:
                rows.append(run_minibatch_config(jax, n=n, e=e, dtype=dtype))
            except Exception as err:
                print(f"# [minibatch] failed ({err}); continuing without it",
                      file=sys.stderr, flush=True)
            row_gc()
            if os.environ.get("BENCH_PROTEINS_DENSITY", "1") == "1":
                # the same proteins-density shape through the minibatch
                # engine — the reference's ONLY way to run this density
                try:
                    rows.append(run_minibatch_config(
                        jax, n=n, e=int(os.environ.get(
                            "BENCH_PD_E", 39_500_000)), dtype=dtype,
                        label="proteins-density-minibatch"))
                except Exception as err:
                    print(f"# [proteins-density-minibatch] failed ({err}); "
                          f"continuing without it", file=sys.stderr,
                          flush=True)
                row_gc()
        if os.environ.get("BENCH_GRAPH_LEVEL", "1") == "1":
            # particle-track rows with the node-track honesty machinery
            # (VERDICT r3 item 6): reference-structure naive + roofline,
            # simple AND v2-sigmoid kernels
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import bench_graph_level

            gl_batch = int(os.environ.get("BENCH_GL_BATCH", 1024))
            for kern in ("simple", "sigmoid"):
                try:
                    rows.append(bench_graph_level.run_config(
                        jax, batch=gl_batch, steps=steps, kernel=kern,
                        dtype=dtype, calib=CALIB))
                except Exception as err:
                    print(f"# [graph-level {kern}] failed ({err}); "
                          f"continuing without it", file=sys.stderr,
                          flush=True)
                row_gc()
        if os.environ.get("BENCH_TEMPORAL", "1") == "1":
            # temporal-track row (round 5): the one track shape the sweep
            # was missing — scanned whole-epoch engine vs the reference's
            # per-snapshot dispatch loop, wikimath-shaped synthetic
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import bench_temporal

            try:
                rows.append(bench_temporal.run_config(
                    jax, T=int(os.environ.get("BENCH_TEMPORAL_T", 200)),
                    n=int(os.environ.get("BENCH_TEMPORAL_N", 1024))))
            except Exception as err:
                print(f"# [temporal] failed ({err}); continuing without it",
                      file=sys.stderr, flush=True)
        if os.environ.get("BENCH_SIGMOID", "1") == "1":
            # one row per N (default: the reference's sigmoid scale AND a
            # scale where its dense path OOMs — VERDICT r2 item 1), each in
            # a time-bounded subprocess: a pathologically slow compile must
            # not starve the sweep's final JSON line (the driver's
            # artifact). subprocess.run kills the exact child PID on
            # timeout.
            import subprocess

            budget = float(os.environ.get("BENCH_SIGMOID_TIMEOUT", 600))
            # configs as N[:layers[:heads]] — defaults: the 3-layer op-scale
            # points, the cora-a model shape (8 layers, run.sh:9-11) at the
            # reference scale AND where the reference OOMs, and an H=4 row
            # for the Pallas head grid (VERDICT r3 item 4)
            cfg_str = os.environ.get(
                "BENCH_SIGMOID_NS",
                "4096,8192,32768,4096:8,32768:8,8192:3:4")
            sig_cfgs = []
            for tok in cfg_str.split(","):
                if not tok:
                    continue
                parts = [int(v) for v in tok.split(":")]
                sig_cfgs.append((parts[0],
                                 parts[1] if len(parts) > 1 else 3,
                                 parts[2] if len(parts) > 2 else 1))
            for n_sig, l_sig, h_sig in sig_cfgs:
                env = dict(os.environ, BENCH_SIGMOID_ONLY="1",
                           BENCH_SIGMOID_N=str(n_sig),
                           BENCH_SIGMOID_LAYERS=str(l_sig),
                           BENCH_SIGMOID_HEADS=str(h_sig))
                try:
                    res = subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        env=env, timeout=budget, capture_output=True,
                        text=True)
                    sys.stderr.write(res.stderr)
                    out_lines = [l for l in res.stdout.strip().splitlines()
                                 if l.startswith("{")]
                    if res.returncode != 0 or not out_lines:
                        print(f"# [sigmoid N={n_sig}] child rc="
                              f"{res.returncode}, no JSON output; skipping "
                              f"row", file=sys.stderr, flush=True)
                        continue
                    rows.append(json.loads(out_lines[-1]))
                except subprocess.TimeoutExpired as err:
                    if err.stderr:
                        sys.stderr.write(
                            err.stderr if isinstance(err.stderr, str)
                            else err.stderr.decode())
                    print(f"# [sigmoid N={n_sig}] row exceeded "
                          f"{budget:.0f}s budget; continuing without it",
                          file=sys.stderr, flush=True)
                    # killing the child wedges the axon relay for minutes
                    # (BENCH_NOTES r3) — cool down so the next child is
                    # not doomed by this one's kill
                    time.sleep(float(os.environ.get(
                        "BENCH_SIGMOID_COOLDOWN", 120)))
                except Exception as err:
                    print(f"# [sigmoid N={n_sig}] row failed ({err}); "
                          f"continuing without it", file=sys.stderr,
                          flush=True)
        head = next(r for r in rows
                    if r["graph"] == "powerlaw" and r["heads"] == 1)

    print(final_json(head), flush=True)


if __name__ == "__main__":
    sys.exit(main())
