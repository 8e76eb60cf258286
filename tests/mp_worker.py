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
