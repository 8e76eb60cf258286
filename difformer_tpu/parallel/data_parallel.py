"""Data-parallel training over batches of graphs (particle track).

The reference trains batches of small graphs on one GPU
(``physical particle/main.py:80-92``); here the batch axis maps onto a mesh
axis: each device holds B/S padded graphs with their own block-diagonal edge
lists (everything graph-local, so the only collective is the gradient psum
— classic DP, SURVEY.md §2.6 row 1).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from difformer_tpu.data.batching import pad_graph_batch
from difformer_tpu.parallel.mesh import DATA_AXIS


def shard_batches(dataset: Sequence, indices, per_device_batch, n_devices, *,
                  max_nodes, max_edges, shuffle=False, rng=None,
                  dense_plan=False):
    """Yield per-device-stacked PaddedGraphBatch pytrees [S, b, ...].

    ``dense_plan=True`` attaches the block-dense conv plan
    (``data/batching.dense_adj``) to each shard — [S, b, M, M] after
    stacking — so the DP step runs the batched-MXU-matmul conv instead of
    edge-list scatters.
    """
    idx = np.asarray(indices)
    if shuffle:
        rng = rng or np.random.default_rng()
        idx = idx[rng.permutation(idx.shape[0])]
    step = per_device_batch * n_devices
    for start in range(0, idx.shape[0] - step + 1, step):
        sel = idx[start:start + step]
        shards = []
        for d in range(n_devices):
            ids = sel[d * per_device_batch:(d + 1) * per_device_batch]
            graphs = [dataset[i] for i in ids]
            pb = pad_graph_batch(
                [g[0] for g in graphs], [g[1] for g in graphs],
                [g[2] for g in graphs], max_nodes=max_nodes,
                max_edges=max_edges, batch_size=per_device_batch,
            )
            if dense_plan:
                from difformer_tpu.data.batching import dense_adj

                pb = pb.replace(dense_adj=dense_adj(pb))
            shards.append(pb)
        yield jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *shards
        )


def make_dp_train_step(model, mesh, tx, axis: str = DATA_AXIS):
    """Jitted DP step over stacked per-device batches."""

    def body(params, opt_state, b, rng):
        b = jax.tree_util.tree_map(lambda t: t[0], b)

        def local_loss(p):
            rngs = {
                "dropout": jax.random.fold_in(rng, jax.lax.axis_index(axis))
            }
            out = model.apply(
                {"params": p}, b.node_feat, b.node_mask, b.n_nodes,
                b.senders, b.receivers, None, b.edge_mask, train=True,
                rngs=rngs, indices_are_sorted=b.edges_sorted,
                dense_adj=b.dense_adj,
            )[:, 0]
            per = optax.sigmoid_binary_cross_entropy(out, b.labels)
            m = b.graph_mask.astype(out.dtype)
            s = jnp.sum(per * m)
            c = jnp.sum(m)
            return jax.lax.psum(s, axis) / jnp.maximum(
                jax.lax.psum(c, axis), 1.0
            )

        loss, grads = jax.value_and_grad(local_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, stacked_batch, rng):
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(), P()),
        )
        return f(params, opt_state, stacked_batch, rng)

    return jax.jit(step, donate_argnums=(0, 1))
