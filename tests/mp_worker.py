"""Worker for the multi-process (multi-host analog) launch test.

Run as: python tests/mp_worker.py <rank> <num_processes> <port>
Each process contributes 2 virtual CPU devices; collectives cross the
process boundary through jax.distributed — the CPU stand-in for a
multi-host TPU pod (SURVEY.md §4's 'fake backend' analog).
"""

import os
import sys


def main():
    rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
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
