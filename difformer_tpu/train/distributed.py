"""Distributed full-graph training engine (node-sharded).

The multi-chip counterpart of ``FullBatchTrainer``: the graph is
edge-partitioned over a 1-D mesh (``parallel.partition``), the model runs
under ``shard_map`` with the collective-augmented ops, and the train step is
one jitted program (BASELINE.md north star: multi-host edge-partitioned
training; the reference has no distributed path at all, SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.parallel.api import make_sharded_train_step, sharded_apply
from difformer_tpu.parallel.mesh import GRAPH_AXIS, make_mesh
from difformer_tpu.parallel.partition import ShardedGraph, partition_graph
from difformer_tpu.train.optim import torch_adam
from difformer_tpu.utils.metrics import METRICS


def _nll_sum(logits, labels, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(
        logp, labels.reshape(-1, 1).astype(jnp.int32), axis=-1
    )[:, 0]
    m = mask.astype(logits.dtype)
    return -jnp.sum(ll * m), jnp.sum(m)


def _bce_sum(logits, labels, mask):
    import optax

    per = optax.sigmoid_binary_cross_entropy(
        logits, labels.astype(logits.dtype)
    ).mean(axis=-1)
    m = mask.astype(logits.dtype)
    return jnp.sum(per * m), jnp.sum(m)


class DistributedTrainer:
    """Node-sharded full-graph trainer over all local devices (or a given
    mesh). ``model`` must be constructed with ``axis_name='graph'`` and an
    axis-free twin is used for initialization."""

    def __init__(self, model, init_model, node_feat, edge_index, labels, *,
                 train_mask, mesh=None, lr=1e-2, weight_decay=5e-4,
                 loss="nll", metric="acc", seed=123, spmm="halo",
                 bsr_tile=256, balance_edges=False, layout=None):
        self.mesh = mesh or make_mesh()
        n_shards = int(np.prod(self.mesh.devices.shape))
        labels_np = np.asarray(labels)
        self.labels_eval = labels_np
        if loss == "bce" and (labels_np.ndim == 1 or labels_np.shape[-1] == 1):
            flat = labels_np.reshape(-1).astype(np.int64)
            oh = np.zeros((flat.shape[0], int(flat.max()) + 1), np.float32)
            oh[np.arange(flat.shape[0]), np.clip(flat, 0, None)] = 1.0
            labels_for_train = oh
        elif loss == "bce":
            labels_for_train = labels_np.astype(np.float32)
        else:
            labels_for_train = (
                labels_np.reshape(labels_np.shape[0], -1)[:, 0]
                if labels_np.ndim > 1 else labels_np
            ).astype(np.int32)

        # layout: 'contiguous' (equal node blocks) | 'balanced'
        # (degree-balanced cuts, = balance_edges=True) | 'locality'
        # (label-prop community reorder + degree-balanced cuts + min-cut snap — the
        # halo-minimizing production layout for community graphs)
        if layout is None:
            layout = "balanced" if balance_edges else "contiguous"
        elif layout not in ("contiguous", "balanced", "locality"):
            raise ValueError(
                f"unknown layout {layout!r}: expected 'contiguous', "
                "'balanced', or 'locality'"
            )
        balance_edges = layout != "contiguous"
        ell = None
        self._node_perm = None
        if spmm == "bsr" and balance_edges:
            import warnings

            warnings.warn(
                "balance_edges=True is ignored with spmm='bsr': BSR shards "
                "must stay tile-aligned (node_align=bsr_tile), which is "
                "incompatible with degree-balanced cut points; using uniform "
                "tile-aligned shards instead",
                stacklevel=2,
            )
        if spmm == "bsr":
            # block-sparse MXU hybrid (ops/bsr.py): dense adjacency tiles as
            # batched matmuls after one tiled all_gather; per-edge COO tail
            from difformer_tpu.ops.bsr import build_bsr_gcn_sharded

            self.sg = partition_graph(
                np.asarray(node_feat, np.float32), np.asarray(edge_index),
                n_shards, labels=labels_for_train, label_mask=train_mask,
                build_halo=False, node_align=bsr_tile,
            )
            ei = np.asarray(edge_index)
            fwd, rev, rows_per = build_bsr_gcn_sharded(
                ei[0], ei[1], int(np.asarray(node_feat).shape[0]), n_shards,
                tile=bsr_tile)
            assert rows_per == self.sg.nodes_per_shard, (
                rows_per, self.sg.nodes_per_shard)
            ell = (fwd, rev)
        else:
            perm_kw = {}
            if balance_edges:
                # degree-balanced contiguous shards (SURVEY §7.3 risk 4):
                # equal cumulative receiver degree per shard instead of
                # equal node count — the slowest shard gates every psum.
                # 'locality' additionally community-reorders (label prop) and snaps cuts to
                # community boundaries (minimizes halo bytes).
                from difformer_tpu.parallel.partition import (
                    edge_balanced_layout,
                    locality_layout,
                )

                make_layout = (locality_layout if layout == "locality"
                               else edge_balanced_layout)
                perm, n_loc = make_layout(
                    np.asarray(edge_index),
                    int(np.asarray(node_feat).shape[0]), n_shards)
                perm_kw = dict(node_perm=perm, nodes_per_shard=n_loc)
                self._node_perm = perm
            self.sg = partition_graph(
                np.asarray(node_feat, np.float32), np.asarray(edge_index),
                n_shards, labels=labels_for_train, label_mask=train_mask,
                build_halo=True,   # boundary-only exchange with comm overlap
                **perm_kw,
            )
        # multi-process (multi-host) mode: the partition is computed
        # identically on every process (deterministic host code on the same
        # inputs); each process then materializes only its addressable
        # shards of the global arrays (make_array_from_callback) — the real
        # multi-host construction path, exercised cross-process by
        # tests/test_multiprocess.py. BSR tables ride the same path: they
        # are shard-local arrays (leading dim = n_shards) threaded through
        # the step as real arguments, NOT jit constants — a closure
        # constant cannot span processes.
        self._mp = jax.process_count() > 1
        from difformer_tpu.parallel.api import make_global_array_tree

        if self._mp:
            self.sg = make_global_array_tree(self.sg, self.mesh)
        self._ell = (None if ell is None
                     else make_global_array_tree(ell, self.mesh))
        self.model = model
        self.init_model = init_model
        self.metric_name = metric
        self.metric_fn = METRICS[metric]
        self._eval_cache = None   # (split_key, masks_dev, labels_dev, jit)
        self._block_cache = {}    # epoch-scanned fit blocks
        self.tx = torch_adam(lr, weight_decay)
        self.seed = seed
        loss_fn = _nll_sum if loss == "nll" else _bce_sum
        self._step_raw = make_sharded_train_step(
            model, self.mesh, self.tx, loss_fn, jit_step=False)
        self._step = jax.jit(self._step_raw, donate_argnums=(0, 1))
        self._apply_fn = sharded_apply(model, self.mesh)
        # jit ONCE (a fresh lambda per eval would retrace every epoch);
        # BSR instances must pass their tables (self._ell) explicitly
        self._apply = jax.jit(
            lambda p, g, e=None: self._apply_fn(p, g, ell_tables=e))
        self._x0 = np.asarray(node_feat, np.float32)
        self._ei0 = np.asarray(edge_index)

    @staticmethod
    def _to_host(tree):
        """Host copies of (possibly process-spanning) state leaves."""
        from difformer_tpu.parallel.api import fetch_to_host

        return jax.tree_util.tree_map(fetch_to_host, tree)

    def init_state(self, run=0):
        variables = self.init_model.init(
            jax.random.PRNGKey(self.seed + run),
            jnp.asarray(self._x0),
            jnp.asarray(self._ei0[0], jnp.int32),
            jnp.asarray(self._ei0[1], jnp.int32),
            train=False,
        )
        params = variables["params"]
        opt_state = self.tx.init(params)
        if self._mp:
            from jax.sharding import PartitionSpec as P

            from difformer_tpu.parallel.api import make_global_array_tree

            params = make_global_array_tree(params, self.mesh, spec=P())
            opt_state = make_global_array_tree(opt_state, self.mesh, spec=P())
        return params, opt_state

    def _metric_device_fn(self):
        """Device metric ``fn(out, labels, masks) -> [S]`` over the sharded
        logits, or ``None`` when the metric/label shape has no device path.
        Covers single-label 'acc' and multilabel 'rocauc'
        (device_rocauc_tasks); other metrics use the host path."""
        le = self.labels_eval
        if self.metric_name == "acc" and (le.ndim == 1
                                          or le.shape[-1] == 1):
            def metric(out, labels, masks):
                out = out.reshape(-1, out.shape[-1])
                val = (jnp.argmax(out, -1) == labels).astype(jnp.float32)
                m = masks.astype(jnp.float32)
                return (m @ val) / jnp.maximum(m.sum(axis=1), 1.0)

            return metric
        if (self.metric_name == "rocauc" and le.ndim == 2
                and le.shape[-1] > 1):
            from difformer_tpu.utils.metrics import device_rocauc_tasks

            def metric(out, labels, masks):
                out = out.reshape(-1, out.shape[-1]).astype(jnp.float32)
                return jnp.stack([
                    device_rocauc_tasks(out, labels, masks[i])
                    for i in range(masks.shape[0])
                ])

            return metric
        return None

    def _eval_tables(self, split_idx):
        """(names, device split masks [S, n_pad], padded device labels) —
        laid out once in the padded shard order (via node_perm) so padding
        rows never enter any mask; cached by split content hash (splits
        with equal first element/length must not silently reuse another
        split's masks, e.g. rotated CV folds)."""
        import hashlib

        le = self.labels_eval
        names = tuple(split_idx.keys())
        key = (names, tuple(
            hashlib.sha1(
                np.ascontiguousarray(np.asarray(v, np.int64)).tobytes()
            ).hexdigest()
            for v in split_idx.values()))
        if self._eval_cache is None or self._eval_cache[0] != key:
            n = le.shape[0]
            n_pad = int(np.prod(self.sg.node_feat.shape[:2]))
            pos = (self._node_perm if self._node_perm is not None
                   else np.arange(n))
            masks = np.zeros((len(names), n_pad), bool)
            for i, name in enumerate(names):
                masks[i, pos[np.asarray(split_idx[name])]] = True
            if self.metric_name == "acc":
                lp = np.zeros((n_pad,), np.int32)
                lp[pos] = le.reshape(n, -1)[:, 0].astype(np.int32)
            else:
                lp = np.zeros((n_pad, le.shape[1]), np.float32)
                lp[pos] = le.astype(np.float32)

            # device-resident cache: numpy leaves here would re-upload the
            # [n_pad, T] label matrix (~58 MB at proteins scale) on every
            # eval call — the very transfer this path exists to remove.
            # Under multi-process the constants must be global replicated
            # arrays (a committed single-device array conflicts with the
            # sharded logits' mesh).
            if self._mp:
                from jax.sharding import PartitionSpec as P

                from difformer_tpu.parallel.api import make_global_array_tree

                masks_dev, lp_dev = make_global_array_tree(
                    (masks, lp), self.mesh, spec=P())
            else:
                masks_dev, lp_dev = jnp.asarray(masks), jnp.asarray(lp)
            self._eval_cache = (key, masks_dev, lp_dev)
        return (names,) + self._eval_cache[1:]

    def _device_eval(self, out_dev, split_idx):
        """On-device split metrics over the sharded logits — fetches only
        [n_splits] scalars instead of the full [N, C] logits (which cost
        seconds at headline scale through a remote-TPU tunnel and a full
        cross-process allgather under multi-host)."""
        metric = self._metric_device_fn()
        if metric is None:
            return None
        names, masks, lp = self._eval_tables(split_idx)
        if "metric" not in self._block_cache:
            self._block_cache["metric"] = jax.jit(metric)
        from difformer_tpu.parallel.api import fetch_to_host

        vals = fetch_to_host(self._block_cache["metric"](out_dev, lp, masks))
        return dict(zip(names, map(float, vals)))

    def evaluate(self, params, split_idx):
        from difformer_tpu.parallel.api import fetch_to_host

        out_dev = self._apply(params, self.sg, self._ell)
        res = self._device_eval(out_dev, split_idx)
        if res is not None:
            return res
        out = fetch_to_host(out_dev)
        out = out.reshape(-1, out.shape[-1])
        if self._node_perm is not None:
            out = out[self._node_perm]      # padded layout -> original order
        else:
            out = out[: self.labels_eval.shape[0]]
        return {
            name: self.metric_fn(self.labels_eval[np.asarray(idx)],
                                 out[np.asarray(idx)])
            for name, idx in split_idx.items()
        }

    # -- epoch-scanned fast path (round 5) -----------------------------------
    # Same recipe as FullBatchTrainer: the per-epoch loop pays one dispatch
    # per train step plus a per-epoch eval round-trip; the scanned path runs
    # `epoch_block` epochs in ONE jitted lax.scan — shard_map composes with
    # scan, so the collectives compile into the loop body — with split
    # metrics computed on device and only [B, 1+S] scalars fetched per
    # block. Eval placement is STATIC (after the first epoch of each
    # eval_step group), matching the per-epoch loop's
    # `epoch % eval_step == 0` schedule.

    def _fit_block(self, groups, eval_step):
        key = ("block", groups, eval_step)
        if key not in self._block_cache:
            metric = self._metric_device_fn()

            def block(params, opt_state, rng, sg, ell_tables, masks,
                      labels):
                def body(carry, _):
                    params, opt_state, rng = carry
                    rng, sk = jax.random.split(rng)
                    params, opt_state, loss = self._step_raw(
                        params, opt_state, sg, sk, ell_tables)
                    return (params, opt_state, rng), loss

                def group(carry, _):
                    carry, loss0 = body(carry, None)
                    params, opt_state, rng = carry
                    out = self._apply_fn(params, sg, ell_tables=ell_tables)
                    mets = metric(out, labels, masks)
                    carry, losses = jax.lax.scan(
                        body, carry, None, length=eval_step - 1)
                    return carry, (
                        jnp.concatenate([loss0[None], losses]), mets)

                (params, opt_state, rng), (losses, metrics) = jax.lax.scan(
                    group, (params, opt_state, rng), None, length=groups)
                return params, opt_state, rng, losses.reshape(-1), metrics

            self._block_cache[key] = jax.jit(block, donate_argnums=(0, 1))
        return self._block_cache[key]

    def _fit_noeval_block(self, length):
        key = ("noeval", length)
        if key not in self._block_cache:
            def block(params, opt_state, rng, sg, ell_tables):
                def body(carry, _):
                    params, opt_state, rng = carry
                    rng, sk = jax.random.split(rng)
                    params, opt_state, loss = self._step_raw(
                        params, opt_state, sg, sk, ell_tables)
                    return (params, opt_state, rng), loss

                (params, opt_state, rng), losses = jax.lax.scan(
                    body, (params, opt_state, rng), None, length=length)
                return params, opt_state, rng, losses

            self._block_cache[key] = jax.jit(block, donate_argnums=(0, 1))
        return self._block_cache[key]

    def _fit_run_scanned(self, run, split_idx, *, epochs, epoch_block,
                         eval_step, logger, verbose, display_step):
        from difformer_tpu.parallel.api import fetch_to_host

        names, masks, labels = self._eval_tables(split_idx)
        params, opt_state = self.init_state(run)
        rng = np.asarray(jax.random.PRNGKey(1000 + self.seed + run))
        best = {"valid": -np.inf, "test": 0.0, "train": 0.0, "epoch": -1}

        def take(e, res, loss):
            nonlocal best
            if logger is not None:
                logger.add_result(
                    run, (res["train"], res["valid"], res["test"]))
            if res["valid"] > best["valid"]:
                best = {**res, "epoch": e}
            if verbose and e % display_step == 0:
                print(f"run {run} epoch {e}: loss {loss:.4f} {res}")

        epoch = 0
        last_eval = -1
        losses = np.full((1,), np.nan)
        if eval_step < epochs:
            groups = max(1, epoch_block // eval_step)
            L = groups * eval_step
            blk = self._fit_block(groups, eval_step)
            while epoch + L <= epochs:
                params, opt_state, rng, losses, metrics = blk(
                    params, opt_state, rng, self.sg, self._ell, masks,
                    labels)
                losses = np.asarray(fetch_to_host(losses))
                metrics = np.asarray(fetch_to_host(metrics))
                for gi in range(groups):
                    e = epoch + gi * eval_step
                    take(e, dict(zip(names, map(float, metrics[gi]))),
                         losses[gi * eval_step])
                    last_eval = e
                epoch += L
        else:
            blk = self._fit_noeval_block(epoch_block)
            while epoch + epoch_block <= epochs:
                params, opt_state, rng, losses = blk(
                    params, opt_state, rng, self.sg, self._ell)
                epoch += epoch_block
            losses = np.asarray(fetch_to_host(losses))
        # remainder via the per-epoch path — same rng stream
        while epoch < epochs:
            rng_dev = jnp.asarray(rng)
            rng_dev, sk = jax.random.split(rng_dev)
            rng = np.asarray(rng_dev)
            params, opt_state, loss = self._step(
                params, opt_state, self.sg, np.asarray(sk), self._ell)
            if epoch % eval_step == 0 or epoch == epochs - 1:
                take(epoch, self.evaluate(params, split_idx), float(loss))
                last_eval = epoch
            epoch += 1
        if last_eval != epochs - 1 and (epochs - 1) % eval_step != 0:
            # forced final-epoch eval (reference main.py:133) when the
            # scanned blocks covered the final epoch off-boundary
            out = self._apply(params, self.sg, self._ell)
            take(epochs - 1, self._device_eval(out, split_idx),
                 float(losses[-1]))
        return best

    def fit(self, split_idx, *, epochs=100, runs=1, eval_step=1,
            verbose=False, display_step=50, logger=None,
            ckpt_dir="", checkpoint_every=0, resume=False,
            epoch_block=8):
        """``ckpt_dir`` + ``checkpoint_every=N`` writes a full training
        checkpoint (params, optimizer state, rng, best-val scalar) every N
        epochs via orbax, and ``resume=True`` continues from the latest one
        with the exact rng stream — same contract as
        ``FullBatchTrainer.fit`` (SURVEY.md §5: periodic checkpoints +
        deterministic resume are the minimum failure-recovery story, and
        they matter most on the multi-chip path). Params/opt state are
        replicated across the mesh, so the checkpoint is mesh-shape
        independent.

        ``epoch_block > 1`` takes the epoch-scanned fast path (one jitted
        dispatch per block, on-device eval metrics) when no checkpointing
        is requested and the metric has a device formulation; the per-epoch
        loop below is the fallback (and the checkpointing path)."""
        scan_ok = (epoch_block and epoch_block > 1
                   and not (ckpt_dir and checkpoint_every > 0)
                   and not resume
                   and self._metric_device_fn() is not None)
        summaries = []
        if scan_ok:
            for run in range(runs):
                summaries.append(self._fit_run_scanned(
                    run, split_idx, epochs=epochs, epoch_block=epoch_block,
                    eval_step=eval_step, logger=logger, verbose=verbose,
                    display_step=display_step))
            return summaries
        for run in range(runs):
            params, opt_state = self.init_state(run)
            rng = jax.random.PRNGKey(1000 + self.seed + run)
            best = {"valid": -np.inf, "test": 0.0, "train": 0.0, "epoch": -1}
            start_epoch = 0
            mgr = None
            if ckpt_dir and checkpoint_every > 0:
                from difformer_tpu.train.checkpoint import CheckpointManager

                mgr = CheckpointManager(f"{ckpt_dir}/run{run}")
                last = mgr.latest_step() if resume else None
                if last is not None:
                    template = {
                        "params": self._to_host(params),
                        "opt_state": self._to_host(opt_state),
                        "rng": np.asarray(rng),
                        "best_valid": np.array(0.0, np.float32),
                    }
                    restored = mgr.restore(last, template)
                    # back to host arrays: restored leaves are committed to
                    # one device, which conflicts with the mesh placement
                    # the sharded step expects; numpy leaves re-place freely
                    params, opt_state, rng = jax.tree_util.tree_map(
                        np.asarray, (restored["params"],
                                     restored["opt_state"], restored["rng"]))
                    if self._mp:
                        from jax.sharding import PartitionSpec as P

                        from difformer_tpu.parallel.api import (
                            make_global_array_tree,
                        )

                        params = make_global_array_tree(
                            params, self.mesh, spec=P())
                        opt_state = make_global_array_tree(
                            opt_state, self.mesh, spec=P())
                    best["valid"] = float(restored["best_valid"])
                    start_epoch = last + 1
            for epoch in range(start_epoch, epochs):
                rng, sk = jax.random.split(rng)
                # host key: multiprocess jit accepts numpy args as
                # replicated-by-assumption; a single-device committed key
                # array would conflict with the mesh placement
                params, opt_state, loss = self._step(
                    params, opt_state, self.sg, np.asarray(sk), self._ell
                )
                if epoch % eval_step == 0 or epoch == epochs - 1:
                    res = self.evaluate(params, split_idx)
                    if logger is not None:
                        logger.add_result(
                            run, (res["train"], res["valid"], res["test"])
                        )
                    if res["valid"] > best["valid"]:
                        best = {**res, "epoch": epoch}
                    if verbose and epoch % display_step == 0:
                        print(f"run {run} epoch {epoch}: loss "
                              f"{float(loss):.4f} {res}")
                if mgr is not None and (epoch + 1) % checkpoint_every == 0:
                    payload = {
                        "params": self._to_host(params),
                        "opt_state": self._to_host(opt_state),
                        "rng": np.asarray(rng),
                        "best_valid": np.array(best["valid"], np.float32),
                    }
                    # orbax's CheckpointManager is multihost-aware: every
                    # process calls save (it barriers internally and the
                    # primary writes replicated numpy leaves once)
                    mgr.save(epoch, payload)
            if mgr is not None:
                mgr.close()
            summaries.append(best)
        return summaries
