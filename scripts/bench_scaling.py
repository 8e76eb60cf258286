"""Multi-device scaling harness — edges/s vs shard count.

Measures the node-sharded distributed train step (halo exchange + psum'd
linear attention) at 1..N shards on whatever devices are available and
reports scaling efficiency (BASELINE.md north star: ≥80% at N hosts).

On real multi-chip hardware run as-is (one process per host with
`parallel.launch.initialize_cluster`). Without TPUs, `--cpu N` uses N
virtual CPU devices — correctness/compile validation only (CPU timings do
not reflect ICI).

Each row also records the analytic per-layer collective traffic
(``parallel.sharded_ops.collective_bytes_per_layer``): the halo all_to_all
wire bytes vs what a full-feature all_gather would ship — the regression
guard for the ≥80% scaling-efficiency target until multi-host hardware
exists. ``--json PATH`` writes the rows as a JSON artifact.

  python scripts/bench_scaling.py --cpu 8 --n 32768 --e 262144 \
      --graph clustered --json SCALING_r02.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", type=int, default=0,
                   help="use N virtual CPU devices")
    p.add_argument("--n", type=int, default=32768)
    p.add_argument("--e", type=int, default=262144)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--graph", default="uniform",
                   choices=["uniform", "clustered", "powerlaw"])
    p.add_argument("--layout", default="locality",
                   choices=["contiguous", "balanced", "locality"],
                   help="shard layout; 'locality' = label-prop community "
                        "reorder + min-cut snap")
    p.add_argument("--shuffle", action="store_true",
                   help="randomly relabel node ids first (real graphs do "
                        "not arrive community-sorted; the synthetic SBM "
                        "does, which flatters the contiguous layout)")
    p.add_argument("--t1-ms", type=float, default=0.0,
                   help="measured single-CHIP step time (ms) for the ICI "
                        "forecast; 0 = use the 1-shard row of this run "
                        "(meaningless on the CPU proxy — pass the bench.py "
                        "number)")
    p.add_argument("--ici-gbps", type=float, default=90.0,
                   help="per-link ICI bandwidth GB/s (v5p ~90/link)")
    p.add_argument("--coll-latency-us", type=float, default=5.0,
                   help="per-collective launch/latency floor (µs); ~1-10 µs "
                        "on ICI depending on topology — swept into the "
                        "worst-case forecast")
    p.add_argument("--json", default="", help="write rows to this path")
    args = p.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.parallel import make_mesh, partition_graph
    from difformer_tpu.parallel.api import make_sharded_train_step
    from difformer_tpu.train.optim import torch_adam

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    if args.graph == "uniform":
        x = rng.normal(size=(args.n, args.hidden)).astype(np.float32)
        ei = np.stack([
            rng.integers(0, args.n, args.e), rng.integers(0, args.n, args.e),
        ]).astype(np.int64)
    else:
        from bench import build_graph

        comm = max(32, args.n // 64)
        x, s_sorted, r_sorted, _, _ = build_graph(
            args.n, args.e, args.hidden, kind=args.graph, comm=comm)
        ei = np.stack([s_sorted, r_sorted]).astype(np.int64)
    if args.shuffle:
        shuf = rng.permutation(args.n)
        ei = shuf[ei]
        inv = np.argsort(shuf)
        x = x[inv]
    y = rng.integers(0, 8, args.n)
    mask = np.ones(args.n, bool)
    tx = torch_adam(1e-2, 0.0)

    def loss_fn(logits, labels, m):
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(
            logp, labels.reshape(-1, 1).astype(jnp.int32), axis=-1
        )[:, 0]
        mf = m.astype(logits.dtype)
        return -jnp.sum(ll * mf), jnp.sum(mf)

    init_model = DIFFormer(hidden_channels=args.hidden, out_channels=8,
                           num_layers=args.layers, dropout=0.0)
    variables = init_model.init(
        jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(ei[0, :128], jnp.int32), jnp.asarray(ei[1, :128], jnp.int32),
        train=False,
    )

    from difformer_tpu.parallel.sharded_ops import collective_bytes_per_layer

    results = {}
    rows = []
    shards = [s for s in [1, 2, 4, 8, 16, 32] if s <= n_dev]
    from difformer_tpu.parallel.partition import (
        edge_balanced_layout,
        locality_layout,
    )

    for s in shards:
        mesh = make_mesh((s,), ("graph",), devices=jax.devices()[:s])
        model = DIFFormer(hidden_channels=args.hidden, out_channels=8,
                          num_layers=args.layers, dropout=0.0,
                          axis_name="graph")
        perm_kw = {}
        if s > 1 and args.layout != "contiguous":
            make_layout = (locality_layout if args.layout == "locality"
                           else edge_balanced_layout)
            perm, n_loc = make_layout(ei, args.n, s)
            perm_kw = dict(node_perm=perm, nodes_per_shard=n_loc)
        sg = partition_graph(x, ei, s, labels=y, label_mask=mask,
                             build_halo=True, **perm_kw)
        comm = collective_bytes_per_layer(sg, feat_dim=args.hidden)
        step = make_sharded_train_step(model, mesh, tx, loss_fn)
        # fresh copy per shard count — the step donates params/opt buffers
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        opt = tx.init(params)
        params, opt, l = step(params, opt, sg, jax.random.PRNGKey(1))
        float(l)
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt, l = step(params, opt, sg, jax.random.PRNGKey(i))
        float(l)
        dt = (time.perf_counter() - t0) / args.steps
        eps = args.e * args.layers / dt
        results[s] = eps
        base = results[shards[0]] * s / shards[0]
        row = {
            "shards": s, "ms_step": round(dt * 1e3, 1),
            "edges_per_s": round(eps, 1),
            "efficiency_vs_linear": round(eps / base, 4),
            "halo_wire_bytes_per_layer": comm.get("halo_wire", 0),
            "halo_real_bytes_per_layer": comm.get("halo_real", 0),
            "allgather_bytes_per_layer": comm["allgather"],
            "attn_psum_bytes_per_layer": comm["attn_psum"],
        }
        # --- analytic ICI forecast (the CPU-proxy timing says nothing about
        # real scaling; this does): compute scales as t1/S, comm = exact
        # per-chip wire bytes over ICI. fwd + bwd each ship the halo (the
        # backward reverses the exchange), psum payload is N-independent.
        #
        # Round 4 (VERDICT r3 item 7): the forecast carries an IMBALANCE
        # term — under shard_map every shard runs the same padded shapes,
        # so skew materializes as padding overhead: the edge-dominated
        # compute inflates by edge_pad_factor (S·E_loc / ΣE_real) — plus a
        # per-collective latency floor, and reports best / expected / worst
        # instead of one number:
        #   best     — perfectly balanced, wire fully overlapped, no
        #              latency floors (the old headline);
        #   expected — padded (imbalanced) compute, wire overlapped with
        #              compute, latency floors paid;
        #   worst    — padded compute with the larger of edge/node factors,
        #              no overlap, latency floors paid.
        from difformer_tpu.parallel.partition import shard_balance_stats

        bal = shard_balance_stats(sg)
        t1_ms = args.t1_ms or (1e3 * args.e * args.layers / results[shards[0]])
        t_comp = t1_ms / s
        edge_f = bal["edge_pad_factor"]
        worst_f = max(edge_f, bal["node_pad_factor"])
        wire = (comm.get("halo_wire", 0) + comm["attn_psum"]) / max(s, 1)
        t_wire = 1e3 * args.layers * 2 * wire / (args.ici_gbps * 1e9)
        # collectives per step: per layer fwd {halo a2a, 2 attn psums} and
        # the mirrored transposes in bwd, plus the 2 loss psums
        n_coll = args.layers * 2 * 3 + 2
        t_lat = n_coll * args.coll_latency_us * 1e-3 if s > 1 else 0.0
        eff = lambda t_step: t_comp / t_step if t_step else 1.0
        t_best = max(t_comp, t_wire)
        t_exp = max(t_comp * edge_f, t_wire) + t_lat
        t_worst = t_comp * worst_f + t_wire + t_lat
        row["balance"] = bal
        row["forecast"] = {
            "t1_ms": round(t1_ms, 2),
            "t_compute_ms": round(t_comp, 3),
            "t_ici_ms": round(t_wire, 3),
            "t_latency_ms": round(t_lat, 4),
            "n_collectives": n_coll,
            "edge_pad_factor": round(edge_f, 4),
            "node_pad_factor": round(bal["node_pad_factor"], 4),
            "efficiency_best": round(eff(t_best), 4),
            "efficiency_expected": round(eff(t_exp), 4),
            "efficiency_worst": round(eff(t_worst), 4),
            # legacy fields (round-3 schema) for cross-round comparison
            "efficiency_no_overlap": round(
                t_comp / (t_comp + t_wire), 4),
            "efficiency_overlap": round(t_comp / max(t_comp, t_wire), 4),
            "ici_gbps": args.ici_gbps,
            "coll_latency_us": args.coll_latency_us,
        }
        rows.append(row)
        print(f"shards={s:3d}  {dt * 1e3:8.1f} ms/step  "
              f"{eps / 1e6:8.1f}M edges/s  "
              f"efficiency={eps / base * 100:5.1f}%  "
              f"halo/allgather="
              f"{comm.get('halo_wire', 0) / max(comm['allgather'], 1):.3f}  "
              f"ici-forecast best/exp/worst="
              f"{row['forecast']['efficiency_best'] * 100:.1f}%/"
              f"{row['forecast']['efficiency_expected'] * 100:.1f}%/"
              f"{row['forecast']['efficiency_worst'] * 100:.1f}%  "
              f"edge-pad={row['forecast']['edge_pad_factor']:.3f}",
              flush=True)

    if args.json:
        artifact = {
            "graph": args.graph, "layout": args.layout,
            "shuffled": bool(args.shuffle),
            "n_nodes": args.n, "n_edges": args.e,
            "hidden": args.hidden, "layers": args.layers,
            "backend": jax.default_backend(), "n_devices": n_dev,
            "note": ("CPU-mesh proxy: correctness + comm-volume regression "
                     "guard; timings do not reflect ICI"),
            "rows": rows,
        }
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
