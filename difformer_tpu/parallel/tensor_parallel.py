"""Tensor parallelism over attention heads (Megatron column->row analog).

The reference has no TP at all (single ``cuda:N`` device — ``node
classification/main.py:37-40``; SURVEY.md §2.6). In ``DIFFormerConv`` the
heads are embarrassingly parallel: Wq/Wk/Wv project to ``[N, H, D]``
(``node classification/difformer.py:115-120``) and every downstream op —
linear/sigmoid attention, the per-head GCN branch — is independent per head
until the ``mean(dim=1)`` over heads (``difformer.py:130``). So the natural
TP decomposition is:

  * **column-parallel**: shard the output dim of the Wq/Wk/Wv kernels (and
    their biases) over a ``model`` mesh axis -> each device holds and
    computes H/TP heads;
  * **row-parallel**: the mean over heads is the one all-reduce per layer.

This is done GSPMD-style, the idiomatic JAX way: we only *annotate* the
parameter shardings and jit the unchanged model — XLA partitions the einsums
per head-shard and inserts the psum for the head-mean (plus scalar psums for
the global-Frobenius q/k norms, which reduce over all heads). No shard_map,
no model changes, and it composes with node sharding on a second mesh axis.

Practical note (documented deviation rationale): every reference config has
d ≤ 400 and H ≤ 8, so TP is never *needed* for capacity — this layer exists
for capability parity of the parallelism surface and for wide-model
headroom; the graph (node/edge) axis in ``parallel/api.py`` is the scaling
path that matters at reference scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# flax module names whose parameters are head-sharded (projections producing
# [N, H*D]; see nn/difformer.py DIFFormerConv)
_TP_MODULES = ("Wq", "Wk", "Wv")


def _path_keys(path):
    return [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]


def tp_param_specs(params, axis: str = MODEL_AXIS):
    """PartitionSpec pytree for a DIFFormer(/V2) param tree: Wq/Wk/Wv
    kernels column-sharded (``[in, H*D]`` -> ``P(None, axis)``), their biases
    sharded on the same dim, everything else replicated."""

    def spec(path, leaf):
        keys = _path_keys(path)
        if any(k in _TP_MODULES for k in keys):
            if keys[-1] == "kernel" and leaf.ndim == 2:
                return P(None, axis)
            if keys[-1] == "bias" and leaf.ndim == 1:
                return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def tp_shard_params(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place a (replicated/host) param tree onto ``mesh`` with TP shardings.

    Requires ``num_heads * out_channels`` divisible by the axis size — the
    shard boundary must fall between heads, i.e. axis size must divide H
    (each head's D-block stays on one device)."""
    axis_size = int(mesh.shape[axis])
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = _path_keys(path)
        if any(k in _TP_MODULES for k in keys) and keys[-1] == "kernel":
            out_dim = int(leaf.shape[-1])
            if out_dim % axis_size != 0:
                raise ValueError(
                    f"TP mesh axis {axis!r} has size {axis_size}, which does "
                    f"not divide the {'.'.join(keys[:-1])} output dim "
                    f"{out_dim} (= num_heads * out_channels); pick an axis "
                    f"size that divides num_heads so each head's D-block "
                    f"stays on one device"
                )
    specs = tp_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def tp_apply(model, mesh: Mesh, axis: str = MODEL_AXIS,
             node_axis: Optional[str] = None):
    """Jitted ``fn(params, x, senders, receivers)`` with TP-sharded params.

    ``node_axis``: optional second mesh axis to shard the node dim of ``x``
    and the logits (2-D node x head parallelism). Edge index arrays stay
    replicated — the GCN gather crosses node shards, and GSPMD resolves it.
    """

    pspec = P(node_axis) if node_axis else P()

    def fwd(params, x, senders, receivers):
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, pspec))
        out = model.apply({"params": params}, x, senders, receivers,
                          train=False)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, pspec))

    jitted = {}

    def apply_fn(params, x, senders, receivers):
        if "f" not in jitted:
            jitted["f"] = jax.jit(fwd, in_shardings=(
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s),
                    tp_param_specs(params, axis),
                ),
                NamedSharding(mesh, pspec),
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P()),
            ))
        return jitted["f"](params, x, senders, receivers)

    return apply_fn


def make_tp_train_step(model, mesh: Mesh, tx, loss_fn,
                       axis: str = MODEL_AXIS,
                       node_axis: Optional[str] = None):
    """Build a jitted full-batch train step with TP-sharded params.

    ``loss_fn(logits, labels, mask) -> (sum_loss, count)`` as in
    ``parallel/api.make_sharded_train_step``. Params and opt state keep
    their TP shardings across steps (out_shardings pin them); the update is
    elementwise so optimizer moments shard identically to their params.
    """

    pspec = P(node_axis) if node_axis else P()

    def step(params, opt_state, x, senders, receivers, labels, mask, rng):
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, pspec))

        def objective(p):
            logits = model.apply({"params": p}, x, senders, receivers,
                                 train=True, rngs={"dropout": rng})
            total, count = loss_fn(logits, labels, mask)
            return total / jnp.maximum(count, 1.0)

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    jitted = {}

    def step_fn(params, opt_state, x, senders, receivers, labels, mask, rng):
        if "f" not in jitted:
            ps = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), tp_param_specs(params, axis)
            )
            # opt-state shardings are left to GSPMD: Adam moments are
            # elementwise in the params, so inference shards them identically
            jitted["f"] = jax.jit(
                step,
                in_shardings=(
                    ps, None,
                    NamedSharding(mesh, pspec),
                    NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                    NamedSharding(mesh, pspec), NamedSharding(mesh, pspec),
                    NamedSharding(mesh, P()),
                ),
                out_shardings=(ps, None, None),
                donate_argnums=(0, 1),
            )
        return jitted["f"](params, opt_state, x, senders, receivers,
                           labels, mask, rng)

    return step_fn
