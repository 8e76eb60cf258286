"""Graph-level (particle-track shape) training throughput on one chip.

The reference's only performance artifact for this track is wall-clock
seconds per run appended to a results txt (``physical particle/
main.py:116,138``). This measures the TPU-native equivalent: a jitted
multi-step train scan of DIFFormer_v2-s + pooling head over PADDED graph
batches (the pad-once host design in ``data/batching.py`` — block-diagonal
edges, masked pooling; reference config shape: actstrack batch 1024,
2 layers, h=64, ``physical particle/run.sh:1-13``).

Two operating points per run:
  * scan   — STEPS steps inside one ``lax.scan`` (dispatch amortized; the
             production trainer shape)
  * eager  — one jitted step per dispatch (what a naive port of the
             reference's per-batch loop does; through the remote-TPU
             tunnel this is dispatch-bound, the same lesson as the
             temporal engine's 74x)

Metric: graphs/s and padded-nodes/s. Usage:
    python scripts/bench_graph_level.py [batch=1024] [n_node=100] [steps=8]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from difformer_tpu.data.batching import pad_graph_batch
    from difformer_tpu.data.transforms import knn_graph
    from difformer_tpu.nn import DIFFormerV2, GraphLevelModel
    from difformer_tpu.train.optim import torch_adam

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_node = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    rng = np.random.default_rng(0)
    graphs = []
    for _ in range(batch):
        n = n_node + int(rng.integers(-n_node // 5, n_node // 5 + 1))
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        x = np.concatenate([rng.normal(size=(n, 13)).astype(np.float32), pos],
                           axis=1)   # feat ⊕ pos, actstrack-style
        ei = knn_graph(pos, 5, include_self=True)
        graphs.append((x, ei, float(rng.integers(0, 2))))
    b = pad_graph_batch([g[0] for g in graphs], [g[1] for g in graphs],
                        [g[2] for g in graphs])
    bd = {k: jnp.asarray(getattr(b, k)) for k in
          ("node_feat", "node_mask", "n_nodes", "senders", "receivers",
           "edge_mask", "labels")}
    print(f"# batch={batch} graphs, padded [B={batch}, "
          f"M={b.node_feat.shape[1]}] nodes, E_pad={b.senders.shape[0]}",
          flush=True)

    enc = DIFFormerV2(hidden_channels=64, out_channels=64, num_layers=2,
                      dropout=0.0)
    model = GraphLevelModel(encoder=enc, out_channels=1)
    tx = torch_adam(1e-3, 0.0)
    variables = model.init(
        jax.random.PRNGKey(0), bd["node_feat"], bd["node_mask"],
        bd["n_nodes"], bd["senders"], bd["receivers"], None, bd["edge_mask"],
        train=False)
    params = variables["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, bd["node_feat"], bd["node_mask"],
                          bd["n_nodes"], bd["senders"], bd["receivers"],
                          None, bd["edge_mask"], train=False)
        return optax.sigmoid_binary_cross_entropy(
            out.reshape(-1), bd["labels"].reshape(-1)).mean()

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

    @jax.jit
    def one(params, opt_state):
        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    for tag, fn, per_call in (("scan", multi, steps), ("eager", one, 1)):
        p = jax.tree_util.tree_map(jnp.array, params)
        o = tx.init(p)
        t0 = time.perf_counter()
        p, o, l = fn(p, o)
        float(l)
        print(f"# {tag}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps // per_call):
                p, o, l = fn(p, o)
            float(l)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"{tag}: {best * 1e3:.2f} ms/step = "
              f"{batch / best:,.0f} graphs/s, "
              f"{b.node_feat.shape[0] * b.node_feat.shape[1] / best / 1e6:.1f}M "
              f"padded-nodes/s", flush=True)


if __name__ == "__main__":
    main()
