"""Temporal-snapshot training engine (spatial-temporal track).

Reference loop: ``spatial-temporal/main.py:87-145``. Two optimization modes
(SURVEY.md §7.3 item 7):

* **cumulative** (all datasets but wikimath): the mean snapshot MSE is
  backpropagated once per epoch. Gradients are linear, so this equals the
  sum of per-snapshot gradients scaled by 1/T — computed here by per-snapshot
  ``value_and_grad`` + tree accumulation (no retain_graph gymnastics needed).
* **incremental** (wikimath): one optimizer step per snapshot.

Early stopping on validation cost with best-state restore
(``main.py:127-143``). Per-snapshot graph rebuild (``--special_treat``
knn/dense, ``main.py:96-104``) is a data-layer transform here
(``rebuild='knn'|'dense'``).

TPU-native engine shape: snapshots are padded once to a single static shape
(``pad_snapshots``), then the whole epoch — all T snapshots plus the
optimizer update(s) — compiles to ONE jitted ``lax.scan`` program per mode
(``use_scan=True``, default). One device dispatch per epoch instead of T+1:
through a high-latency link (e.g. the axon tunnel at 20-40 ms/dispatch,
BENCH_NOTES.md) a ~500-snapshot chickenpox epoch is dispatch-bound in the
per-snapshot form. The python-loop path (``use_scan=False``) is kept as a
debuggable fallback and as the ragged-shape escape hatch; both produce
bit-identical losses (same rng split sequence, same accumulation order).
"""

from __future__ import annotations

import copy
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from difformer_tpu.data.graph import TemporalSnapshot
from difformer_tpu.data.transforms import edge_bucket, knn_graph, pad_edges
from difformer_tpu.train.optim import torch_adam


def temporal_signal_split(snapshots: Sequence, train_ratio: float):
    """torch_geometric_temporal parity: contiguous prefix/suffix split."""
    k = int(train_ratio * len(snapshots))
    return list(snapshots[:k]), list(snapshots[k:])


def rebuild_graph(snap: TemporalSnapshot, mode: str) -> TemporalSnapshot:
    """--special_treat parity (``main.py:96-104``)."""
    n = snap.node_feat.shape[0]
    if mode == "knn":
        ei = knn_graph(snap.node_feat, k=5, include_self=True, metric="cosine")
        ew = np.ones(ei.shape[1], np.float32)
    elif mode == "dense":
        row = np.repeat(np.arange(n), n)
        col = np.tile(np.arange(n), n)
        ei = np.stack([row, col])
        ew = np.ones(ei.shape[1], np.float32)
    else:
        return snap
    return TemporalSnapshot(snap.node_feat, ei, ew, snap.target)


def pad_snapshots(snaps: List[TemporalSnapshot]):
    """Pad all edge lists to one bucket so jit compiles a single shape.
    Returns device-ready stacked dict."""
    e_max = edge_bucket(max(s.edge_index.shape[1] for s in snaps))
    eis, ews, masks = [], [], []
    for s in snaps:
        w = s.edge_weight
        if w is None:
            w = np.ones(s.edge_index.shape[1], np.float32)
        ei, wp, m = pad_edges(s.edge_index, w, e_max)
        eis.append(ei)
        ews.append(wp)
        masks.append(m)
    return {
        "x": jnp.asarray(np.stack([s.node_feat for s in snaps])),
        "senders": jnp.asarray(np.stack([e[0] for e in eis]), jnp.int32),
        "receivers": jnp.asarray(np.stack([e[1] for e in eis]), jnp.int32),
        "edge_weight": jnp.asarray(np.stack(ews)),
        "edge_mask": jnp.asarray(np.stack(masks)),
        "y": jnp.asarray(np.stack([s.target for s in snaps])),
    }


class TemporalTrainer:
    """Train a node-regression model over snapshot sequences.

    model.apply convention as elsewhere; output [N, 1] or [N] is compared to
    snapshot targets with MSE.
    """

    def __init__(self, model, *, lr=1e-2, weight_decay=5e-4,
                 mode="cumulative", rebuild="none", seed=123,
                 use_scan=True):
        self.model = model
        self.tx = torch_adam(lr, weight_decay)
        self.mode = mode
        self.rebuild = rebuild
        self.seed = seed
        self.use_scan = use_scan

        def snap_loss(params, x, s, r, w, em, y, rng):
            out = self.model.apply(
                {"params": params}, x, s, r, w, edge_mask=em, train=True,
                rngs={"dropout": rng},
            )
            return jnp.mean((out.reshape(y.shape) - y) ** 2)

        self._grad = jax.jit(jax.value_and_grad(snap_loss))
        grad_fn = jax.value_and_grad(snap_loss)

        def eval_cost(params, x, s, r, w, em, y):
            out = self.model.apply(
                {"params": params}, x, s, r, w, edge_mask=em, train=False,
            )
            return jnp.mean((out.reshape(y.shape) - y) ** 2)

        self._eval = jax.jit(eval_cost)

        @jax.jit
        def apply_updates(params, opt_state, grads):
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        self._apply_updates = apply_updates

        def _batch(data, t=slice(None)):
            return (data["x"][t], data["senders"][t], data["receivers"][t],
                    data["edge_weight"][t], data["edge_mask"][t], data["y"][t])

        self._batch = _batch

        # --- whole-epoch scan programs (one dispatch per epoch) -----------
        def epoch_cumulative(params, opt_state, data, rng):
            T = data["x"].shape[0]

            def body(carry, batch):
                rng, acc = carry
                rng, sk = jax.random.split(rng)
                c, g = grad_fn(params, *batch, sk)
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return (rng, acc), c

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (_, acc), costs = jax.lax.scan(body, (rng, zeros), _batch(data))
            acc = jax.tree_util.tree_map(lambda a: a / T, acc)
            updates, opt_state = self.tx.update(acc, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, costs.mean()

        def epoch_incremental(params, opt_state, data, rng):
            def body(carry, batch):
                params, opt_state, rng = carry
                rng, sk = jax.random.split(rng)
                c, g = grad_fn(params, *batch, sk)
                updates, opt_state = self.tx.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), c

            (params, opt_state, _), costs = jax.lax.scan(
                body, (params, opt_state, rng), _batch(data))
            return params, opt_state, costs.mean()

        def epoch_eval(params, data):
            def body(_, batch):
                return None, eval_cost(params, *batch)

            _, costs = jax.lax.scan(body, None, _batch(data))
            return costs.mean()

        # no buffer donation: ``fit`` keeps a live reference to the previous
        # params as the best-val restore point (main.py:130-143 parity)
        self._epoch_cumulative = jax.jit(epoch_cumulative)
        self._epoch_incremental = jax.jit(epoch_incremental)
        self._epoch_eval = jax.jit(epoch_eval)

    def _prep(self, snaps):
        snaps = [rebuild_graph(s, self.rebuild) for s in snaps]
        return pad_snapshots(snaps)

    def init_params(self, sample: TemporalSnapshot, run=0):
        d = self._prep([sample])
        variables = self.model.init(
            jax.random.PRNGKey(self.seed + run),
            d["x"][0], d["senders"][0], d["receivers"][0], d["edge_weight"][0],
            edge_mask=d["edge_mask"][0], train=False,
        )
        return variables["params"]

    def epoch_train(self, params, opt_state, data, rng):
        if self.use_scan:
            fn = (self._epoch_cumulative if self.mode == "cumulative"
                  else self._epoch_incremental)
            params, opt_state, cost = fn(params, opt_state, data, rng)
            return params, opt_state, float(cost)
        T = data["x"].shape[0]
        # costs stay on device inside the snapshot loop — a float() there
        # would sync per snapshot and serialize host dispatch with compute
        if self.mode == "cumulative":
            costs = []
            acc = jax.tree_util.tree_map(jnp.zeros_like, params)
            for t in range(T):
                rng, sk = jax.random.split(rng)
                c, g = self._grad(
                    params, data["x"][t], data["senders"][t],
                    data["receivers"][t], data["edge_weight"][t],
                    data["edge_mask"][t], data["y"][t], sk,
                )
                costs.append(c)
                acc = jax.tree_util.tree_map(lambda a, b: a + b, acc, g)
            acc = jax.tree_util.tree_map(lambda a: a / T, acc)
            params, opt_state = self._apply_updates(params, opt_state, acc)
            return params, opt_state, float(jnp.stack(costs).mean())
        # incremental
        costs = []
        for t in range(T):
            rng, sk = jax.random.split(rng)
            c, g = self._grad(
                params, data["x"][t], data["senders"][t],
                data["receivers"][t], data["edge_weight"][t],
                data["edge_mask"][t], data["y"][t], sk,
            )
            costs.append(c)
            params, opt_state = self._apply_updates(params, opt_state, g)
        return params, opt_state, float(jnp.stack(costs).mean())

    def evaluate(self, params, data):
        if self.use_scan:
            return float(self._epoch_eval(params, data))
        T = data["x"].shape[0]
        costs = [
            self._eval(
                params, data["x"][t], data["senders"][t],
                data["receivers"][t], data["edge_weight"][t],
                data["edge_mask"][t], data["y"][t],
            )
            for t in range(T)
        ]
        return float(jnp.stack(costs).mean())

    def fit(self, train_snaps, val_snaps, test_snaps, *, epochs=100,
            early_stopping=20, run=0, verbose=False, display_step=20):
        train_d = self._prep(train_snaps)
        val_d = self._prep(val_snaps)
        test_d = self._prep(test_snaps)

        params = self.init_params(train_snaps[0], run)
        opt_state = self.tx.init(params)
        rng = jax.random.PRNGKey(1000 + self.seed + run)

        best_val = np.inf
        best_params = params
        no_improve = 0
        for epoch in range(epochs):
            rng, sk = jax.random.split(rng)
            params, opt_state, cost_tr = self.epoch_train(
                params, opt_state, train_d, sk
            )
            cost_val = self.evaluate(params, val_d)
            if cost_val < best_val:
                best_val = cost_val
                best_params = params
                no_improve = 0
            else:
                no_improve += 1
                if no_improve >= early_stopping:
                    break
            if verbose and epoch % display_step == 0:
                print(f"epoch {epoch}: train {cost_tr:.4f} val {cost_val:.4f}")
        cost_te = self.evaluate(best_params, test_d)
        return {"test": cost_te, "valid": best_val, "params": best_params}
