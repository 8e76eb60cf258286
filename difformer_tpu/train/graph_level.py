"""Graph-level (batched small graphs) training engine — particle track.

Reference loop: ``physical particle/main.py:62-139`` — PyG DataLoader
batches, BCE-with-logits on the graph logit, per-epoch eval on
train/valid/test via ``eval_batch`` (sigmoid then metric averaged over
batches, ``physical particle/eval.py:34-46``). Here batches are padded to
static (batch_size, max_nodes, max_edges) buckets so one jitted step serves
every batch; padding graphs are masked out of the loss and metrics.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from difformer_tpu.data.batching import batch_iterator
from difformer_tpu.train.optim import torch_adam
from difformer_tpu.utils.metrics import METRICS, roc_auc_score


class GraphLevelTrainer:
    """dataset[i] = (node_feat [n,F], edge_index [2,e], label scalar)."""

    def __init__(self, model, dataset: Sequence, *, batch_size=32,
                 lr=1e-3, weight_decay=0.0, metric="rocauc", seed=123,
                 max_nodes=None, max_edges=None):
        self.model = model
        self.dataset = dataset
        self.batch_size = batch_size
        self.metric = metric
        self.tx = torch_adam(lr, weight_decay)
        self.seed = seed
        self.max_nodes = max_nodes or max(g[0].shape[0] for g in dataset)
        me = max_edges or batch_size * max(
            g[1].shape[1] for g in dataset
        )
        self.max_edges = me
        # center-major edge builders (kNN/radius) emit receiver-sorted
        # edges; when EVERY graph qualifies, batches stay globally sorted
        # (pad_graph_batch points padding at the tail) and gcn_conv takes
        # XLA's sorted-scatter path (measured 28% faster per conv)
        self._edges_sorted = all(
            np.all(np.diff(np.asarray(g[1][1], np.int64)) >= 0)
            for g in dataset
        )
        # dataset-wide max out-degree, rounded up to a lane-friendly
        # multiple of 8: the static reverse-table width for the
        # scatter-free backward (knn_table_conv) — per-batch widths would
        # retrace the step every batch
        k_rev = max((int(np.bincount(np.asarray(g[1][0])).max(initial=0))
                     for g in dataset if g[1].shape[1]), default=0)
        self._k_rev_pad = -(-k_rev // 8) * 8 if k_rev else 0
        self._step = jax.jit(self._step_impl, donate_argnums=(0, 1))
        self._fwd = jax.jit(self._fwd_impl)
        self._knn_mode = None   # probe on first batch (k-in-regular plan)
        self._dense_mode = None  # probe on first batch (block-dense plan)

    def _apply(self, params, b, train, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        return self.model.apply(
            {"params": params},
            b["node_feat"], b["node_mask"], b["n_nodes"],
            b["senders"], b["receivers"], None, b["edge_mask"],
            train=train, rngs=rngs,
            indices_are_sorted=self._edges_sorted,
            knn_table=b.get("knn_table"),
            dense_adj=b.get("dense_adj"),
        )

    def _step_impl(self, params, opt_state, b, rng):
        def loss(p):
            out = self._apply(p, b, True, rng)[:, 0]
            per = optax.sigmoid_binary_cross_entropy(out, b["labels"])
            m = b["graph_mask"].astype(out.dtype)
            return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)

        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = self.tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    def _fwd_impl(self, params, b):
        return self._apply(params, b, False)[:, 0]

    def _to_device(self, batch):
        d = {
            "node_feat": jnp.asarray(batch.node_feat),
            "node_mask": jnp.asarray(batch.node_mask),
            "n_nodes": jnp.asarray(batch.n_nodes),
            "senders": jnp.asarray(batch.senders),
            "receivers": jnp.asarray(batch.receivers),
            "edge_mask": jnp.asarray(batch.edge_mask),
            "labels": jnp.asarray(batch.labels),
            "graph_mask": jnp.asarray(batch.graph_mask),
        }
        if self._dense_mode is not False:
            # block-dense plan first (one batched MXU matmul per direction,
            # data/batching.dense_adj round 5); gated off for good when the
            # per-graph node count / HBM budget rules it out
            from difformer_tpu.data.batching import dense_adj

            adj = dense_adj(batch)
            if adj is None:
                self._dense_mode = False
            else:
                self._dense_mode = True
                d["dense_adj"] = jnp.asarray(adj)
                return d
        if self._knn_mode is not False:
            # k-in-regular datasets (kNN builders) get the scatter-free
            # dense conv plan; the first non-regular batch (radius graphs)
            # turns the probe off for good (one retrace at most)
            from difformer_tpu.data.batching import regular_knn_table

            t = regular_knn_table(batch, k_rev_pad=self._k_rev_pad)
            if t is None:
                self._knn_mode = False
            else:
                self._knn_mode = True
                d["knn_table"] = tuple(
                    jnp.asarray(a) if a is not None else None for a in t)
        return d

    def init_state(self, run=0):
        it = batch_iterator(
            self.dataset, np.arange(min(len(self.dataset), self.batch_size)),
            self.batch_size, max_nodes=self.max_nodes,
            max_edges=self.max_edges,
        )
        b = self._to_device(next(it))
        variables = self.model.init(
            jax.random.PRNGKey(self.seed + run),
            b["node_feat"], b["node_mask"], b["n_nodes"],
            b["senders"], b["receivers"], None, b["edge_mask"], train=False,
        )
        params = variables["params"]
        return params, self.tx.init(params)

    def eval_split(self, params, indices):
        """Metric over a split (scores pooled across batches, exact AUC —
        the reference averages per-batch AUCs, ``eval.py:42-46``; pooled is
        the standard estimator and batch-size independent)."""
        scores, labels = [], []
        for batch in batch_iterator(
            self.dataset, indices, self.batch_size,
            max_nodes=self.max_nodes, max_edges=self.max_edges,
        ):
            b = self._to_device(batch)
            out = np.asarray(self._fwd(params, b))
            gm = np.asarray(batch.graph_mask)
            scores.append(out[gm])
            labels.append(np.asarray(batch.labels)[gm])
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        if self.metric == "rocauc":
            return roc_auc_score(labels, scores)
        if self.metric == "acc":
            return float(((scores > 0) == (labels > 0.5)).mean())
        raise ValueError(self.metric)

    def fit(self, split_idx, *, epochs=20, runs=1, verbose=False,
            logger=None):
        summaries = []
        for run in range(runs):
            t0 = time.time()
            params, opt_state = self.init_state(run)
            rng_np = np.random.default_rng(self.seed + run)
            rng = jax.random.PRNGKey(999 + run)
            best = {"valid": -np.inf, "test": 0.0, "train": 0.0, "epoch": -1}
            for epoch in range(epochs):
                # background-thread prefetch overlaps host batch padding
                # with the (async-dispatched) device step
                from difformer_tpu.data.batching import prefetch

                for batch in prefetch(batch_iterator(
                    self.dataset, split_idx["train"], self.batch_size,
                    max_nodes=self.max_nodes, max_edges=self.max_edges,
                    shuffle=True, rng=rng_np,
                )):
                    rng, sk = jax.random.split(rng)
                    params, opt_state, loss = self._step(
                        params, opt_state, self._to_device(batch), sk
                    )
                res = {
                    name: self.eval_split(params, idx)
                    for name, idx in split_idx.items()
                }
                if logger is not None:
                    logger.add_result(
                        run, (res["train"], res["valid"], res["test"])
                    )
                if res["valid"] > best["valid"]:
                    best = {**res, "epoch": epoch}
                if verbose:
                    print(f"run {run} epoch {epoch}: {res}")
            best["seconds"] = time.time() - t0
            summaries.append(best)
        return summaries
