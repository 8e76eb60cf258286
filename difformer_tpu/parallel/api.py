"""High-level distributed execution API.

``sharded_apply``/``make_sharded_train_step`` wrap a node-level model
(DIFFormer) in ``shard_map`` over a 1-D mesh axis: node features, labels and
per-shard edge lists are sharded; parameters are replicated; the collectives
inside the ops (psum'd attention aggregates, all-gather for the GCN branch,
ring sigmoid attention) make the result bit-equivalent to the single-device
run on the unpadded graph. Gradients under shard_map get their psum from the
partitioned loss automatically (jax transposes the collectives).

This is the component the reference lacks entirely (SURVEY.md §2.6): the
multi-chip path validated by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from difformer_tpu.parallel.mesh import GRAPH_AXIS
from difformer_tpu.parallel.partition import ShardedGraph


def _graph_specs(sg: ShardedGraph, axis: str):
    """PartitionSpecs for the ShardedGraph pytree (leading dim = shards)."""
    def spec(leaf):
        return P(axis)

    return jax.tree_util.tree_map(spec, sg)


def shard_graph_to_mesh(sg: ShardedGraph, mesh: Mesh, axis: str = GRAPH_AXIS):
    """Place stacked per-shard arrays so shard s lives on device s."""
    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P(axis)))

    return jax.tree_util.tree_map(put, sg)


def make_global_array_tree(tree, mesh: Mesh, spec=None, axis: str = GRAPH_AXIS):
    """Build global ``jax.Array`` leaves from identical host (numpy) pytrees
    present on every process — the multi-host construction path: each
    process materializes only its **addressable** shards via
    ``jax.make_array_from_callback`` (no full-array upload, no cross-process
    data motion). ``spec=None`` shards every leaf's leading dim over
    ``axis`` (the ShardedGraph layout, leading dim = n_shards); pass
    ``P()`` for replicated trees (params / optimizer state / rng keys).
    Works single-process too, where it reduces to a sharded device_put."""
    import numpy as np

    p = spec if spec is not None else P(axis)

    def put(leaf):
        arr = np.asarray(leaf)
        sh = NamedSharding(mesh, p if arr.ndim else P())
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree)


def fetch_to_host(a):
    """Device→host for arrays that may span processes: fully-addressable
    arrays copy directly; process-spanning sharded arrays are allgathered
    (multihost_utils); fully-replicated ones read the local replica."""
    import numpy as np

    if getattr(a, "is_fully_addressable", True):
        return np.asarray(a)
    if getattr(a, "is_fully_replicated", False):
        return np.asarray(a.addressable_shards[0].data)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(a, tiled=True))


def sharded_apply(model, mesh: Mesh, axis: str = GRAPH_AXIS, ell=None):
    """Build ``fn(params, sharded_graph, rng=None, train=False,
    ell_tables=None) -> logits`` running under shard_map. ``model`` must be
    constructed with ``axis_name=axis``. Returns logits stacked
    [S, N_loc, C].

    BSR tables can be bound two ways: ``ell=`` here closes over them (jit
    constants — fine single-process), or ``ell_tables=`` at call time as
    real (possibly process-spanning global) arrays — required under
    multi-process, where a closure constant cannot span processes."""

    def body(params, x, node_mask, senders, receivers, edge_mask, edge_weight,
             halo, ell_op, rng, train):
        # shard_map slices the stacked [S, ...] arrays to [1, ...]; squeeze
        x, node_mask = x[0], node_mask[0]
        senders, receivers, edge_mask = senders[0], receivers[0], edge_mask[0]
        if edge_weight is not None:
            edge_weight = edge_weight[0]
        if halo is not None:
            halo = jax.tree_util.tree_map(lambda t: t[0], halo)
        if ell_op is not None:
            ell_op = jax.tree_util.tree_map(lambda t: t[0], ell_op)
        rngs = None
        if rng is not None:
            # fold in the shard index for decorrelated dropout
            rngs = {
                "dropout": jax.random.fold_in(
                    rng, jax.lax.axis_index(axis)
                )
            }
        return model.apply(
            {"params": params},
            x,
            senders,
            receivers,
            edge_weight,
            node_mask=node_mask,
            edge_mask=edge_mask,
            train=train,
            rngs=rngs,
            halo=halo,
            ell=ell_op,
        )

    def apply_fn(params, sg: ShardedGraph, rng=None, train=False,
                 ell_tables=None):
        ell_arg = ell if ell_tables is None else ell_tables
        ew = sg.edge_weight
        senders, halo = _senders_and_halo(sg)
        in_specs = (
            P(),            # params replicated
            P(axis),        # node_feat
            P(axis),        # node_mask
            P(axis),        # senders
            P(axis),        # receivers
            P(axis),        # edge_mask
            P() if ew is None else P(axis),
            P() if halo is None
            else jax.tree_util.tree_map(lambda _: P(axis), halo),
            P() if ell_arg is None
            else jax.tree_util.tree_map(lambda _: P(axis), ell_arg),
            P(),            # rng
        )
        f = jax.shard_map(
            functools.partial(body, train=train),
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis),
        )
        return f(
            params, sg.node_feat, sg.node_mask, senders, sg.receivers,
            sg.edge_mask, ew, halo, ell_arg, rng,
        )

    return apply_fn


def _senders_and_halo(sg: ShardedGraph):
    """Pick the boundary-exchange plan when the partition carries one.
    Prefers the comm/compute-overlap split (dict plan)."""
    if sg.int_senders is not None:
        plan = {
            "send_idx": sg.send_idx, "send_mask": sg.send_mask,
            "int_senders": sg.int_senders,
            "int_receivers": sg.int_receivers, "int_value": sg.int_value,
            "bnd_senders": sg.bnd_senders,
            "bnd_receivers": sg.bnd_receivers, "bnd_value": sg.bnd_value,
        }
        return sg.senders_table, plan
    if sg.senders_table is not None:
        return sg.senders_table, (sg.send_idx, sg.send_mask, sg.edge_value)
    return sg.senders, None


def make_sharded_train_step(model, mesh: Mesh, tx, loss_fn,
                            axis: str = GRAPH_AXIS, ell=None,
                            jit_step=True):
    """Distributed train step over a ShardedGraph (jitted by default).

    loss_fn(logits_local, labels_local, mask_local) -> (sum_loss, count) so
    the global mean is psum(sum)/psum(count) — computed here.

    ``ell=`` closes over BSR tables as jit constants (single-process);
    ``step(..., ell_tables=...)`` takes them as real arrays instead —
    required under multi-process (a closure constant cannot span
    processes). ``jit_step=False`` returns the raw step for embedding in a
    caller's ``lax.scan`` (the epoch-scanned distributed fit)."""

    def body(params, opt_state, x, node_mask, senders, receivers, edge_mask,
             edge_weight, halo, ell_op, labels, label_mask, rng):
        x, node_mask = x[0], node_mask[0]
        senders, receivers, edge_mask = senders[0], receivers[0], edge_mask[0]
        labels, label_mask = labels[0], label_mask[0]
        if edge_weight is not None:
            edge_weight = edge_weight[0]
        if halo is not None:
            halo = jax.tree_util.tree_map(lambda t: t[0], halo)
        if ell_op is not None:
            ell_op = jax.tree_util.tree_map(lambda t: t[0], ell_op)

        def local_loss(p):
            rngs = {
                "dropout": jax.random.fold_in(rng, jax.lax.axis_index(axis))
            }
            out = model.apply(
                {"params": p}, x, senders, receivers, edge_weight,
                node_mask=node_mask, edge_mask=edge_mask, train=True,
                rngs=rngs, halo=halo, ell=ell_op,
            )
            s, c = loss_fn(out, labels, label_mask)
            return jax.lax.psum(s, axis) / jnp.maximum(
                jax.lax.psum(c, axis), 1.0
            )

        loss, grads = jax.value_and_grad(local_loss)(params)
        # grads of replicated params under shard_map are already psum'd by
        # the transpose of the collectives; loss is identical on all shards.
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, sg: ShardedGraph, rng, ell_tables=None):
        ell_arg = ell if ell_tables is None else ell_tables
        ew = sg.edge_weight
        senders, halo = _senders_and_halo(sg)
        in_specs = (
            P(), P(),
            P(axis), P(axis), P(axis), P(axis), P(axis),
            P() if ew is None else P(axis),
            P() if halo is None
            else jax.tree_util.tree_map(lambda _: P(axis), halo),
            P() if ell_arg is None
            else jax.tree_util.tree_map(lambda _: P(axis), ell_arg),
            P(axis), P(axis), P(),
        )
        f = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P(), P()),
        )
        return f(
            params, opt_state, sg.node_feat, sg.node_mask, senders,
            sg.receivers, sg.edge_mask, ew, halo, ell_arg, sg.labels,
            sg.label_mask, rng,
        )

    if not jit_step:
        return step
    return jax.jit(step, donate_argnums=(0, 1))
