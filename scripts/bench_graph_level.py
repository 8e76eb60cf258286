"""Graph-level (particle-track shape) training throughput on one chip.

The reference's only performance artifact for this track is wall-clock
seconds per run appended to a results txt (``physical particle/
main.py:116,138``). This measures the TPU-native equivalent — a jitted
multi-step train scan of DIFFormer_v2 + pooling head over PADDED graph
batches (the pad-once host design in ``data/batching.py``; reference config
shape: actstrack batch 1024, 2 layers, h=64, ``physical particle/
run.sh:1-13``) — and, round 4 (VERDICT r3 item 6), gives the row the same
honesty machinery as the node-track rows:

  * a **reference-structure naive comparator**: a flat-node-tensor encoder
    doing scatter_add per-graph aggregates + pad round-trips per layer and
    an unsorted-scatter GCN on the block-diagonal edge list — the exact
    operation structure of ``physical particle/difformer-v2.py:71-140`` +
    ``:30-46`` (a line-by-line port's layout), measured in the same
    invocation on the same graphs;
  * a **roofline account** (per-edge gather floor + MXU flops + the padded
    sigmoid's score-stream/VPU terms) with ``pct_of_roofline``;
  * a **v2-sigmoid row**. The reference's own v2 'sigmoid' einsum
    (``difformer-v2.py:124``, "abcd,ebcd->aemh") materializes a
    [B, B, M, H] cross-graph tensor (B²·M·H·4 bytes — ~0.5 GiB at the
    actstrack batch of 1024, ~8 GiB at the tau3mu batch of 8192); the
    naive comparator runs at full batch while the score tensor + backward
    cotangents fit, else at the largest batch that fits with the ratio
    extrapolated per-graph (conservative — cross-graph scoring is O(B²)).

Usage:
    python scripts/bench_graph_level.py [batch=1024] [n_node=100] [steps=8]

Also importable by bench.py (``run_config`` returns a BENCH row dict).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graphs(batch, n_node, seed=0):
    """Synthetic actstrack-shaped batch: ~n_node±20% 3-D points, kNN(5)."""
    from difformer_tpu.data.transforms import knn_graph

    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(batch):
        n = n_node + int(rng.integers(-n_node // 5, n_node // 5 + 1))
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        x = np.concatenate(
            [rng.normal(size=(n, 13)).astype(np.float32), pos], axis=1)
        ei = knn_graph(pos, 5, include_self=True)
        graphs.append((x, ei, float(rng.integers(0, 2))))
    return graphs


def build_flat(graphs, M):
    """Reference layout: exact ragged flat node tensor + graph-id vector +
    block-diagonal edges in flat space + the to_pad index table
    (``difformer-v2.py:8-28``: make_batch / to_pad)."""
    xs, eis, ys = zip(*graphs)
    n_nodes = np.asarray([x.shape[0] for x in xs], np.int32)
    offsets = np.concatenate([[0], np.cumsum(n_nodes)])
    Nt = int(offsets[-1])
    B = len(graphs)
    x_flat = np.concatenate(xs).astype(np.float32)
    batch_vec = np.repeat(np.arange(B, dtype=np.int32), n_nodes)
    senders = np.concatenate(
        [ei[0] + off for ei, off in zip(eis, offsets)]).astype(np.int32)
    receivers = np.concatenate(
        [ei[1] + off for ei, off in zip(eis, offsets)]).astype(np.int32)
    # to_pad gather table: [B, M] flat index, Nt = dummy zero row
    pad_index = np.full((B, M), Nt, np.int32)
    for b in range(B):
        pad_index[b, : n_nodes[b]] = offsets[b] + np.arange(n_nodes[b])
    # unpad gather: flat position n -> its padded slot b*M + i
    unpad_index = (batch_vec.astype(np.int64) * M
                   + (np.arange(Nt) - offsets[batch_vec])).astype(np.int32)
    return dict(x=x_flat, batch=batch_vec, n_nodes=n_nodes,
                senders=senders, receivers=receivers,
                pad_index=pad_index, unpad_index=unpad_index,
                labels=np.asarray(ys, np.float32), num_nodes=Nt, B=B, M=M)


def make_naive_model(hidden, num_layers, kernel, compute_dtype):
    """Reference-structure encoder+head on the FLAT layout (the shape a
    line-by-line port of ``difformer-v2.py`` would have): per layer, q/k/v
    on flat nodes → global-Frobenius normalize → to_pad gathers →
    per-graph einsums → scatter_add Σk/Σv → unpad gather; GCN via
    unsorted scatter-add on the block-diagonal edge list; pooling via
    scatter mean (PyG ``global_mean_pool``)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from difformer_tpu.nn.common import TorchLayerNorm, TorchLinear

    class NaiveConv(nn.Module):
        out_channels: int
        kernel: str = "simple"

        @nn.compact
        def __call__(self, x, batch, pad_index, unpad_index, n_nodes,
                     senders, receivers, B, M):
            N, D = x.shape[0], self.out_channels
            H = 1
            q = TorchLinear(D, name="Wq")(x).reshape(N, H, D)
            k = TorchLinear(D, name="Wk")(x).reshape(N, H, D)
            v = TorchLinear(D, name="Wv")(x).reshape(N, H, D)
            q = q / jnp.linalg.norm(q.astype(jnp.float32)).astype(q.dtype)
            k = k / jnp.linalg.norm(k.astype(jnp.float32)).astype(k.dtype)

            def to_pad(t):       # difformer-v2.py:23-28 (gather round-trip)
                tz = jnp.concatenate(
                    [t, jnp.zeros((1,) + t.shape[1:], t.dtype)])
                return tz[pad_index]            # [B, M, H, D]

            q_pad, k_pad, v_pad = to_pad(q), to_pad(k), to_pad(v)
            if self.kernel == "simple":
                # per-graph kT·v einsum + scatter_add sums (:80-111)
                kv = jnp.einsum("bmhk,bmhd->bhkd", k_pad, v_pad)
                k_sum = jax.ops.segment_sum(k, batch, B)     # scatter_add_
                v_sum = jax.ops.segment_sum(v, batch, B)
                num = (jnp.einsum("bmhk,bhkd->bmhd", q_pad, kv)
                       + v_sum[:, None])
                den = (jnp.einsum("bmhk,bhk->bmh", q_pad, k_sum)
                       + n_nodes.astype(q_pad.dtype)[:, None, None])
                out_pad = num / den[..., None]
            else:
                # the reference cross-graph einsum (:113-138): [B, B, M, H]
                s = jax.nn.sigmoid(
                    jnp.einsum("amhd,emhd->aemh", q_pad, k_pad))
                den = jnp.sum(s, axis=1, keepdims=True) + 1e-9
                out_pad = jnp.einsum("aemh,emhd->amhd", s / den, v_pad)
            attn = out_pad.reshape(B * M, H, D)[unpad_index]   # unpad gather

            # gcn_conv, reference structure (:30-46): col-degree norm,
            # unsorted scatter-add
            ones = jnp.ones((senders.shape[0],), jnp.float32)
            deg = jnp.zeros((N,), jnp.float32).at[receivers].add(ones)
            dinv = jnp.nan_to_num(deg ** -0.5, posinf=0.0)
            w = (dinv[senders] * dinv[receivers]).astype(x.dtype)
            msg = v[senders] * w[:, None, None]
            g = jnp.zeros_like(v).at[receivers].add(msg)

            return (attn + g).mean(axis=1)

    class NaiveModel(nn.Module):
        hidden: int
        num_layers: int
        kernel: str

        @nn.compact
        def __call__(self, x, batch, pad_index, unpad_index, n_nodes,
                     senders, receivers, B, M):
            if compute_dtype:
                x = x.astype(compute_dtype)
            x = TorchLinear(self.hidden, name="fc_in")(x)
            x = TorchLayerNorm(name="ln_0")(x)
            x = nn.relu(x)
            prev = x
            for i in range(self.num_layers):
                x = NaiveConv(self.hidden, kernel=self.kernel,
                              name=f"conv_{i}")(
                    x, batch, pad_index, unpad_index, n_nodes, senders,
                    receivers, B, M)
                x = 0.5 * x + 0.5 * prev
                x = TorchLayerNorm(name=f"ln_{i + 1}")(x)
                x = nn.relu(x)     # v2 extra activation (:217)
                prev = x
            h = TorchLinear(self.hidden, name="fc_out")(x)
            # global_mean_pool: scatter mean over graph ids
            pooled = jax.ops.segment_sum(h, batch, B) / jnp.maximum(
                jax.ops.segment_sum(jnp.ones((h.shape[0], 1), h.dtype),
                                    batch, B), 1.0)
            out = TorchLinear(1, name="lin")(pooled)
            if compute_dtype:
                out = out.astype(jnp.float32)
            return out

    return NaiveModel(hidden, num_layers, kernel)


def _timeit(jax, fn, params, tx, steps, tag, reps=3):
    import time as _t

    p = jax.tree_util.tree_map(jax.numpy.array, params)
    o = tx.init(p)
    t0 = _t.perf_counter()
    p, o, l = fn(p, o)
    float(l)
    print(f"# [graph-level] {tag}: compile+{steps} steps "
          f"{_t.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = _t.perf_counter()
        p, o, l = fn(p, o)
        float(l)
        best = min(best, (_t.perf_counter() - t0) / steps)
    print(f"# [graph-level] {tag}: {best * 1e3:.2f} ms/step",
          file=sys.stderr, flush=True)
    return best


def run_config(jax, *, batch=1024, n_node=100, steps=8, kernel="simple",
               dtype="bfloat16", calib=None, run_naive=True,
               naive_batch=None, seed=0):
    """One graph-level bench row (BENCH schema, VERDICT r3 item 6)."""
    import jax.numpy as jnp
    import optax

    import bench as bench_mod
    from difformer_tpu.data.batching import pad_graph_batch
    from difformer_tpu.nn import DIFFormerV2, GraphLevelModel
    from difformer_tpu.train.optim import torch_adam

    calib = calib or bench_mod.CALIB
    # amortize the per-dispatch tunnel latency (~20-40 ms through axon,
    # BENCH_NOTES): at ~3-6 ms/step a scan of 8 steps was ~50% dispatch
    # overhead (profiled device time 2.65 ms vs 5.9 ms wall per step,
    # round 5); 64 scanned steps bound the overhead at <10% for fast AND
    # naive alike
    steps = max(steps, int(os.environ.get("BENCH_GL_STEPS", 64)))
    LAYERS, HID = 2, 64
    graphs = build_graphs(batch, n_node, seed=seed)
    b = pad_graph_batch([g[0] for g in graphs], [g[1] for g in graphs],
                        [g[2] for g in graphs])
    bd = {k: jnp.asarray(getattr(b, k)) for k in
          ("node_feat", "node_mask", "n_nodes", "senders", "receivers",
           "edge_mask", "labels")}
    B, M = b.node_feat.shape[:2]
    e_real = int(np.asarray(b.edge_mask).sum())
    tx = torch_adam(1e-3, 0.0)

    enc = DIFFormerV2(hidden_channels=HID, out_channels=HID,
                      num_layers=LAYERS, dropout=0.0, kernel=kernel,
                      compute_dtype=dtype or "")
    model = GraphLevelModel(encoder=enc, out_channels=1)
    sorted_edges = bool(b.edges_sorted)
    from difformer_tpu.data.batching import regular_knn_table

    # conv plan ladder (BENCH_GL_PLAN ∈ auto|dense|knn|edge for A/Bs):
    # block-dense batched-matmul adjacency (MXU, round 5) ≻ knn gather
    # table ≻ masked edge list
    from difformer_tpu.data.batching import dense_adj

    plan = os.environ.get("BENCH_GL_PLAN", "auto")
    adj = dense_adj(b) if plan in ("auto", "dense") else None
    if adj is not None:
        adj = jnp.asarray(adj)
    knn_t = (regular_knn_table(b)
             if adj is None and plan in ("auto", "knn") else None)
    if knn_t is not None:
        # keep the transposed (out-edge) table too — it is what makes the
        # backward a dense gather (ops.graph_ops.knn_table_conv) instead
        # of a take-VJP scatter
        knn_t = tuple(None if t is None else jnp.asarray(t) for t in knn_t)
    variables = model.init(
        jax.random.PRNGKey(0), bd["node_feat"], bd["node_mask"],
        bd["n_nodes"], bd["senders"], bd["receivers"], None,
        bd["edge_mask"], train=False, indices_are_sorted=sorted_edges)

    def make_multi(loss_fn):
        @jax.jit
        def multi(params, opt_state):
            def body(carry, _):
                params, opt_state = carry
                l, g = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), l

            (params, opt_state), ls = jax.lax.scan(
                body, (params, opt_state), None, length=steps)
            return params, opt_state, ls[-1]

        return multi

    def loss_fn(p):
        out = model.apply({"params": p}, bd["node_feat"], bd["node_mask"],
                          bd["n_nodes"], bd["senders"], bd["receivers"],
                          None, bd["edge_mask"], train=False,
                          indices_are_sorted=sorted_edges,
                          knn_table=knn_t, dense_adj=adj)
        return optax.sigmoid_binary_cross_entropy(
            out.reshape(-1), bd["labels"].reshape(-1)).mean()

    t_fast = _timeit(jax, make_multi(loss_fn), variables["params"], tx,
                     steps, f"padded-{kernel}-B{batch}")
    graphs_per_s = batch / t_fast

    # ---- naive (reference structure) on the same graphs -------------------
    t_naive = None
    naive_note = None
    naive_b = batch
    if run_naive:
        if kernel == "sigmoid":
            # [B, B, M, H] cross-graph scores (f32): run the naive at full
            # batch while scores + backward cotangents fit in HBM (~2 GiB
            # score budget), else at the largest batch that does
            score_gib = batch * batch * M * 4 / 2 ** 30
            if naive_batch:
                naive_b = naive_batch
            elif score_gib > 2.0:
                naive_b = max(64, int((2 * 2 ** 30 / (M * 4)) ** 0.5))
            if naive_b != batch:
                naive_note = (
                    f"reference v2 sigmoid materializes [B,B,M,H] "
                    f"(~{score_gib:.1f} GiB at B={batch}); naive measured "
                    f"at B={naive_b} and linearly extrapolated per-graph — "
                    f"conservative, the cross-graph score actually scales "
                    f"O(B^2)")
        fl = build_flat(graphs[:naive_b], M)
        nm = make_naive_model(HID, LAYERS, kernel, dtype or "")
        args = tuple(jnp.asarray(fl[k]) for k in
                     ("x", "batch", "pad_index", "unpad_index", "n_nodes",
                      "senders", "receivers"))
        nvars = nm.init(jax.random.PRNGKey(0), *args, fl["B"], fl["M"])
        nlabels = jnp.asarray(fl["labels"])

        def naive_loss(p):
            out = nm.apply({"params": p}, *args, fl["B"], fl["M"])
            return optax.sigmoid_binary_cross_entropy(
                out.reshape(-1), nlabels).mean()

        t_naive_raw = _timeit(jax, make_multi(naive_loss), nvars["params"],
                              tx, steps, f"naive-{kernel}-B{naive_b}")
        # per-graph normalization when the naive ran at a reduced batch
        t_naive = t_naive_raw * (batch / naive_b)

    # ---- roofline ---------------------------------------------------------
    dtype_bytes = 2 if dtype == "bfloat16" else 4
    t_row = calib["base_ns"] * 1e-9 + HID * dtype_bytes / calib["gbps"]
    if adj is not None:
        # block-dense conv: no gathers — charge the adjacency HBM stream
        # (A fwd + A^T bwd per layer, read at compute dtype) and its
        # batched-matmul MXU flops instead of the per-row gather floor
        t_gather = 0.0
        t_adj = LAYERS * 2 * B * M * M * dtype_bytes / bench_mod.HBM_GBPS
        conv_flops = LAYERS * 2 * 2 * B * M * M * HID   # fwd + bwd dv
    else:
        t_gather = LAYERS * 2 * e_real * t_row      # fwd + bwd edge gathers
        t_adj = 0.0
        conv_flops = 0
    flops = 2 * B * M * (16 * HID + HID)            # in/out MLP
    flops += LAYERS * 2 * B * M * HID * HID * (3 + 2)   # proj + kv/num
    t_mxu = 3 * flops / bench_mod.MXU_FLOPS
    t_mxu += conv_flops / bench_mod.MXU_FLOPS
    # activation streaming (same convention as bench.roofline_account):
    # q/k/v projections at 5 HBM passes each (fwd write+read, cotangent
    # write+read, primal re-read), 2 branch outputs at 4, plus a lump of
    # 8 [B, M, HID] passes for LN/residual/relu/dropout/layer IO
    act_bytes = B * M * HID * dtype_bytes
    t_act = LAYERS * (5 * 3 + 4 * 2 + 8) * act_bytes / bench_mod.HBM_GBPS
    t_vpu = t_stream = 0.0
    if kernel == "sigmoid":
        pairs = float(B) * M * M
        t_vpu = LAYERS * pairs / bench_mod.SIGMOID_VPU_PAIRS
        t_stream = LAYERS * 2 * pairs * 4 / bench_mod.HBM_GBPS
        t_mxu += LAYERS * 3 * 2 * 2 * pairs * HID / bench_mod.MXU_FLOPS
    floor = t_gather + t_adj + t_mxu + t_act + t_vpu + t_stream
    roofline = {
        "conv_plan": ("dense" if adj is not None
                      else "knn-table" if knn_t is not None else "edge-list"),
        "gather_ms": round(t_gather * 1e3, 2),
        "adj_stream_ms": round(t_adj * 1e3, 2),
        "gathered_rows_per_layer": (0 if adj is not None else 2 * e_real),
        "mxu_ms": round(t_mxu * 1e3, 2),
        "act_stream_ms": round(t_act * 1e3, 2),
        "vpu_sigmoid_ms": round(t_vpu * 1e3, 2),
        "score_stream_ms": round(t_stream * 1e3, 2),
        "roofline_ms": round(floor * 1e3, 2),
        "pct_of_roofline": round(100.0 * floor / t_fast, 1),
    }

    return {
        "graph": f"graph-level-{kernel}", "heads": 1,
        "impl": f"padded-batch-B{batch}-{roofline['conv_plan']}",
        "dense_coverage": None,
        "edges_per_s": round(e_real * LAYERS / t_fast, 1),
        "graphs_per_s": round(graphs_per_s, 1),
        "step_ms": round(t_fast * 1e3, 2),
        "remat": False,
        "vs_baseline": (round(t_naive / t_fast, 3) if t_naive else None),
        "naive_step_ms": (round(t_naive * 1e3, 2) if t_naive else None),
        "naive_edges_per_s": (round(e_real * LAYERS / t_naive, 1)
                              if t_naive else None),
        "naive_measured_now": t_naive is not None,
        "naive_note": naive_note,
        "calibration_measured_now": calib.get("measured_now", False),
        "roofline": roofline,
    }


def main():
    import jax

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_node = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    import json

    for kernel in ("simple", "sigmoid"):
        row = run_config(jax, batch=batch, n_node=n_node, steps=steps,
                         kernel=kernel,
                         dtype=os.environ.get("BENCH_DTYPE", "bfloat16"))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
