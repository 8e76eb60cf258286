"""Worker for the multi-process (multi-host analog) launch tests.

Run as: python tests/mp_worker.py <rank> <num_processes> <port> [mode] [dir]
Each process contributes 2 virtual CPU devices; collectives cross the
process boundary through jax.distributed — the CPU stand-in for a
multi-host TPU pod (SURVEY.md §4's 'fake backend' analog).

Modes:
  psum (default) — toy cross-process psum through shard_map
  trainer        — full DistributedTrainer flow (VERDICT r3 item 3):
                   host-sharded global graph construction
                   (make_array_from_callback of the locality-layout
                   partition), real halo all_to_all + spmm_first train
                   steps across the process boundary, eval allgather, and
                   checkpoint save/resume under multi-process. Prints a
                   JSON line the parent compares bit-level against a
                   single-process 4-device run.
"""

import json
import os
import sys


def trainer_flow(ckpt_dir):
    """The shared trainer recipe — importable by the parent test so the
    single-process reference run is literally the same code."""
    import numpy as np
    import jax

    from difformer_tpu.data.splits import rand_train_test_idx
    from difformer_tpu.data.synthetic import random_graph
    from difformer_tpu.data.transforms import standard_preprocess
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.parallel.mesh import make_mesh
    from difformer_tpu.train.distributed import DistributedTrainer
    from difformer_tpu.train.trainer import idx_to_mask

    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=31, homophily=0.85)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    def build():
        model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                          dropout=0.0, axis_name="graph", spmm_first=True)
        init_model = DIFFormer(hidden_channels=16, out_channels=c,
                               num_layers=2, dropout=0.0, spmm_first=True)
        return DistributedTrainer(
            model, init_model, x, ei, y, train_mask=train_mask, lr=1e-2,
            loss="nll", layout="locality",
            mesh=make_mesh((4,), ("graph",)))

    tr = build()
    # manual steps for the bit-parity artifact
    params, opt = tr.init_state(0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        rng, sk = jax.random.split(rng)
        params, opt, loss = tr._step(params, opt, tr.sg, np.asarray(sk))
        losses.append(float(loss))
    ev = tr.evaluate(params, split)

    # checkpoint save + resume through fit (primary-writer + barrier under
    # multi-process); resumed run must agree with the uninterrupted one
    res_a = tr.fit(split, epochs=4, runs=1, eval_step=2,
                   ckpt_dir=ckpt_dir, checkpoint_every=2)
    tr2 = build()
    res_b = tr2.fit(split, epochs=8, runs=1, eval_step=2,
                    ckpt_dir=ckpt_dir, checkpoint_every=2, resume=True)
    # uninterrupted 8-epoch run: the resumed run must match it exactly
    # (deterministic-resume contract, now exercised across processes)
    tr3 = build()
    res_c = tr3.fit(split, epochs=8, runs=1, eval_step=2,
                    ckpt_dir=ckpt_dir + "_c", checkpoint_every=2)
    return {
        "losses": losses,
        "eval": {k: float(v) for k, v in ev.items()},
        "fit_a": {k: float(v) for k, v in res_a[0].items()},
        "fit_b": {k: float(v) for k, v in res_b[0].items()},
        "fit_c": {k: float(v) for k, v in res_c[0].items()},
    }


def bsr_flow():
    """spmm='bsr' DistributedTrainer across processes: the BSR tables are
    shard-local arrays built per process via make_global_array_tree (round
    5 — previously a NotImplementedError), driven through manual steps AND
    the epoch-scanned fit."""
    import numpy as np
    import jax

    from difformer_tpu.data.splits import rand_train_test_idx
    from difformer_tpu.data.synthetic import random_graph
    from difformer_tpu.data.transforms import standard_preprocess
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.parallel.mesh import make_mesh
    from difformer_tpu.train.distributed import DistributedTrainer
    from difformer_tpu.train.trainer import idx_to_mask

    n, c = 256, 3
    x, ei, y = random_graph(n, 2000, 10, c, seed=33, homophily=0.9)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      dropout=0.0, axis_name="graph")
    init_model = DIFFormer(hidden_channels=16, out_channels=c,
                           num_layers=2, dropout=0.0)
    tr = DistributedTrainer(model, init_model, x, ei, y,
                            train_mask=train_mask, lr=1e-2, loss="nll",
                            spmm="bsr", bsr_tile=16,
                            mesh=make_mesh((4,), ("graph",)))
    params, opt = tr.init_state(0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        rng, sk = jax.random.split(rng)
        params, opt, loss = tr._step(params, opt, tr.sg, np.asarray(sk),
                                     tr._ell)
        losses.append(float(loss))
    ev = tr.evaluate(params, split)
    fit = tr.fit(split, epochs=6, runs=1, eval_step=2, epoch_block=3)[0]
    return {
        "losses": losses,
        "eval": {k: float(v) for k, v in ev.items()},
        "fit": {k: float(v) for k, v in fit.items()},
    }


def dp_flow():
    """Graph-level DP trainer step across processes: each process
    materializes only its addressable shards of the stacked
    PaddedGraphBatch (shard_batches + make_global_array_tree over the
    'data' axis); the only collective is the gradient psum."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from difformer_tpu.data.synthetic import random_small_graphs
    from difformer_tpu.nn import DIFFormerV2, GraphLevelModel
    from difformer_tpu.parallel.api import make_global_array_tree
    from difformer_tpu.parallel.data_parallel import (
        make_dp_train_step,
        shard_batches,
    )
    from difformer_tpu.parallel.mesh import make_mesh
    from difformer_tpu.train.optim import torch_adam

    G = 4
    graphs = random_small_graphs(4 * G, seed=13)
    max_nodes = max(g[0].shape[0] for g in graphs)
    max_edges = 4 * max(g[1].shape[1] for g in graphs)
    enc = DIFFormerV2(hidden_channels=16, out_channels=16, num_layers=2,
                      dropout=0.0)
    gmodel = GraphLevelModel(encoder=enc, out_channels=1)
    mesh = make_mesh((G,), ("data",))
    tx = torch_adam(1e-2, 0.0)
    dp_step = make_dp_train_step(gmodel, mesh, tx, axis="data")

    batches = list(shard_batches(
        graphs, np.arange(len(graphs)), per_device_batch=2, n_devices=G,
        max_nodes=max_nodes, max_edges=max_edges,
        dense_plan=True))   # r5 block-dense conv plan rides the DP shards
    b0 = jax.tree_util.tree_map(lambda t: jnp.asarray(t[0]), batches[0])
    gvars = gmodel.init(
        jax.random.PRNGKey(0), b0.node_feat, b0.node_mask, b0.n_nodes,
        b0.senders, b0.receivers, None, b0.edge_mask, train=False,
    )
    params = make_global_array_tree(gvars["params"], mesh,
                                    spec=jax.sharding.PartitionSpec())
    opt = make_global_array_tree(tx.init(gvars["params"]), mesh,
                                 spec=jax.sharding.PartitionSpec())
    losses = []
    for i, b in enumerate(batches):
        bg = make_global_array_tree(b, mesh, axis="data")
        params, opt, loss = dp_step(params, opt, bg,
                                    np.asarray(jax.random.PRNGKey(5 + i)))
        losses.append(float(loss))
    return {"losses": losses}


def tp2d_flow():
    """2-D graph x model mesh spanning processes (4 procs x 2 devices =
    (4, 2) mesh): Wq/Wk/Wv column-sharded over 'model' within each
    process, nodes sharded over 'graph' across processes (GSPMD inserts
    the cross-process collectives)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from difformer_tpu.data.synthetic import random_graph
    from difformer_tpu.data.transforms import standard_preprocess
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.parallel.mesh import make_mesh
    from difformer_tpu.parallel.tensor_parallel import (
        make_tp_train_step,
        tp_param_specs,
    )
    from difformer_tpu.train.optim import torch_adam

    G = len(jax.devices())
    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=35, homophily=0.85)
    ei = standard_preprocess(ei, n)
    mask = np.ones(n, bool)
    mesh = make_mesh((G // 2, 2), ("graph", "model"))
    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      num_heads=2, dropout=0.0, kernel="simple")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(ei[0], jnp.int32), jnp.asarray(ei[1], jnp.int32),
        train=False,
    )
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    specs = tp_param_specs(host_params)
    params = jax.tree_util.tree_map(
        lambda leaf, s: jax.make_array_from_callback(
            leaf.shape, NamedSharding(mesh, s),
            lambda idx, a=leaf: a[idx]),
        host_params, specs)
    tx = torch_adam(1e-2, 5e-4)
    opt = tx.init(params)

    def loss_fn(logits, labels, m):
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(
            logp, labels.reshape(-1, 1).astype(jnp.int32), axis=-1)[:, 0]
        mf = m.astype(logits.dtype)
        return -jnp.sum(ll * mf), jnp.sum(mf)

    step = make_tp_train_step(model, mesh, tx, loss_fn, node_axis="graph")

    # node-sharded inputs must be global arrays under multi-process (jit
    # rejects numpy with non-trivial shardings); same path single-process
    def node_sharded(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(
            a.shape, NamedSharding(mesh, P("graph")),
            lambda idx, h=a: h[idx])

    xg, yg, mg = node_sharded(x), node_sharded(y.astype(np.int32)), \
        node_sharded(mask)
    losses = []
    for i in range(3):
        params, opt, loss = step(
            params, opt, xg, np.asarray(ei[0], np.int32),
            np.asarray(ei[1], np.int32), yg, mg,
            np.asarray(jax.random.PRNGKey(7 + i)))
        losses.append(float(loss))
    return {"losses": losses}


def main():
    rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "psum"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")

    os.environ["DIFFORMER_COORDINATOR"] = f"localhost:{port}"
    os.environ["DIFFORMER_NUM_PROCESSES"] = str(nprocs)
    os.environ["DIFFORMER_PROCESS_ID"] = str(rank)

    from difformer_tpu.parallel.launch import (
        global_device_count,
        initialize_cluster,
        is_primary,
    )

    assert initialize_cluster(), "cluster join failed"
    assert is_primary() == (rank == 0)
    G = global_device_count()
    assert G == 2 * nprocs, f"expected {2 * nprocs} global devices, got {G}"

    if mode == "trainer":
        out = trainer_flow(sys.argv[5])
        print("MP_TRAINER " + json.dumps(out), flush=True)
        return
    if mode == "bsr":
        print("MP_BSR " + json.dumps(bsr_flow()), flush=True)
        return
    if mode == "dp":
        print("MP_DP " + json.dumps(dp_flow()), flush=True)
        return
    if mode == "tp2d":
        print("MP_TP2D " + json.dumps(tp2d_flow()), flush=True)
        return

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from difformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((G,), ("graph",))
    n = 4 * G  # global length; 4 elements per device
    sharding = NamedSharding(mesh, P("graph"))
    full = np.arange(n, dtype=np.float32)
    arr = jax.make_array_from_callback(
        (n,), sharding, lambda idx: full[idx])

    # cross-process psum through shard_map (the api.py collective path)
    from jax import shard_map

    f = jax.jit(shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "graph"),
        mesh=mesh, in_specs=P("graph"), out_specs=P()))
    total = float(f(arr))
    expect = float(full.sum())
    assert abs(total - expect) < 1e-5, (total, expect)
    print(f"MP_OK rank={rank} devices={G} total={total}", flush=True)


if __name__ == "__main__":
    main()
