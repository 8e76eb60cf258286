"""Full-batch training engine (node classification / set classification).

Replaces the reference's module-level script loop
(``node classification/main.py:104-158``): seed-fixed runs, full-graph
forward/backward per epoch, per-epoch eval with best-val tracking. Here the
whole step (forward + loss + backward + Adam update) is one jitted function
with donated state — the graph stays on device across the run, matching the
reference's single host→device boundary (``main.py:78-79``).

Loss selection parity (``main.py:119-129``): BCE-with-logits for the
multilabel datasets {yelp-chi, deezer-europe, twitch-e, fb100,
ogbn-proteins}, else NLL on log-softmax.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from difformer_tpu.data.graph import GraphData
from difformer_tpu.train.optim import torch_adam
from difformer_tpu.utils.metrics import METRICS


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Any
    extra: Any = None   # non-param variable collections (e.g. batch_stats)


def nll_loss(logits, labels, mask):
    """NLLLoss(log_softmax(out)) == masked mean cross-entropy
    (``main.py:126-129``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def bce_with_logits_loss(logits, labels, mask):
    """BCEWithLogitsLoss, masked mean over nodes and tasks
    (``main.py:119-125``; labels one-hot when single-column)."""
    labels = labels.astype(logits.dtype)
    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    per = per.mean(axis=-1)
    m = mask.astype(logits.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def mse_loss(preds, targets, mask):
    per = (preds.reshape(targets.shape) - targets) ** 2
    if per.ndim > 1:            # per-node mean over feature columns
        per = per.mean(axis=tuple(range(1, per.ndim)))
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


LOSSES = {"nll": nll_loss, "bce": bce_with_logits_loss, "mse": mse_loss}


def idx_to_mask(idx, n):
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(idx)] = True
    return mask


class FullBatchTrainer:
    """Train a node-level model on one (full) graph.

    model.apply convention: ``apply(variables, x, senders, receivers,
    edge_weight, train=..., rngs={'dropout': ...}, **kw)``.
    """

    def __init__(
        self,
        model,
        graph: GraphData,
        labels,
        *,
        lr: float = 1e-2,
        weight_decay: float = 5e-4,
        loss: str = "nll",
        metric: str = "acc",
        seed: int = 123,
        onehot_bce_labels: bool = False,
        model_kwargs: Optional[dict] = None,
        manireg: float = 0.0,
    ):
        self.model = model
        self.graph = graph
        self.metric_fn: Callable = METRICS[metric]
        self.loss_name = loss
        self.loss_fn = LOSSES[loss]
        self.tx = torch_adam(lr, weight_decay)
        self.seed = seed
        self.manireg = manireg
        self.model_kwargs = dict(model_kwargs or {})
        self._sorted = bool(
            self.model_kwargs.pop("indices_are_sorted", graph.edges_sorted)
        )

        labels = np.asarray(labels)
        if loss == "bce":
            if labels.ndim == 1 or labels.shape[-1] == 1 or onehot_bce_labels:
                # one-hot path (reference eval.py:20-22)
                flat = labels.reshape(-1).astype(np.int64)
                labels2 = np.zeros((flat.shape[0], int(flat.max()) + 1), np.float32)
                labels2[np.arange(flat.shape[0]), np.clip(flat, 0, None)] = 1.0
                labels2[flat < 0] = 0.0
                self.labels_train = jnp.asarray(labels2)
            else:
                self.labels_train = jnp.asarray(labels.astype(np.float32))
        elif loss == "mse":
            # regression targets stay float, original layout
            self.labels_train = jnp.asarray(labels.astype(np.float32))
        else:
            self.labels_train = jnp.asarray(
                labels.reshape(labels.shape[0], -1)[:, 0].astype(np.int32)
                if labels.ndim > 1 else labels.astype(np.int32)
            )
        self.labels_eval = labels  # numpy, original layout, for metrics

        self.metric_name = metric
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._forward_eval = jax.jit(self._forward_eval_impl)
        self._block_cache = {}

    # -- state ---------------------------------------------------------------
    def _init_impl(self, rng, g, kwargs):
        return self.model.init(
            {"params": rng},
            g.node_feat,
            g.senders,
            g.receivers,
            g.edge_weight,
            train=False,
            indices_are_sorted=self._sorted,
            **kwargs,
        )

    def init_state(self, run: int = 0, init_params=None) -> TrainState:
        """``init_params`` overrides the flax initialization — e.g. weights
        imported from a torch state_dict for cross-framework equivalence
        runs (tests/test_reference_convergence.py)."""
        g = self.graph
        rng = jax.random.PRNGKey(self.seed + run)
        # jitted: an eager flax init dispatches every op individually —
        # ~300 ms per call through the remote-TPU tunnel at headline scale
        if not hasattr(self, "_init_jit"):
            self._init_jit = jax.jit(self._init_impl)
        variables = self._init_jit(rng, g, self.model_kwargs)
        params = variables["params"]
        if init_params is not None:
            params = jax.tree_util.tree_map(jnp.asarray, init_params)
        extra = {k: v for k, v in variables.items() if k != "params"}
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            extra=extra,
        )

    # -- steps ---------------------------------------------------------------
    # NOTE: graph arrays, labels and any ELL tables are threaded through jit
    # as ARGUMENTS, never closed over — closed-over device arrays become
    # giant constants in the jaxpr and blow up XLA compile time.
    def _loss(self, params, extra, rng, train_mask, g, labels, kwargs):
        out, new_vars = self.model.apply(
            {"params": params, **extra},
            g.node_feat,
            g.senders,
            g.receivers,
            g.edge_weight,
            train=True,
            rngs={"dropout": rng},
            mutable=list(extra.keys()),
            indices_are_sorted=self._sorted,
            **kwargs,
        )
        loss = self.loss_fn(out, labels, train_mask)
        if self.manireg > 0:
            # Laplacian smoothness over edges (image and text/main.py:103-112)
            diff = jnp.take(out, g.senders, axis=0) - jnp.take(
                out, g.receivers, axis=0
            )
            loss = loss + self.manireg * jnp.mean(
                jnp.sum(jnp.square(diff), axis=-1)
            )
        return loss, new_vars

    def _train_step_impl(self, state: TrainState, rng, train_mask, g, labels,
                         kwargs):
        (loss, new_extra), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state.params, state.extra, rng, train_mask, g, labels, kwargs)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        extra = {**state.extra, **dict(new_extra)}
        return TrainState(params, opt_state, state.step + 1, extra), loss

    def _forward_eval_impl(self, params, extra, g, kwargs):
        return self.model.apply(
            {"params": params, **extra},
            g.node_feat,
            g.senders,
            g.receivers,
            g.edge_weight,
            train=False,
            indices_are_sorted=self._sorted,
            **kwargs,
        )

    # -- epoch-scanned fast path --------------------------------------------
    # The per-epoch loop pays one device dispatch for the train step and a
    # full [N, C] logits fetch for the eval every epoch — through the axon
    # remote-TPU tunnel that is 2 × ~20-40 ms dispatch plus ~1 GB/s for the
    # logits, which can exceed the step itself at headline scale. The
    # scanned path runs `epoch_block` epochs inside ONE jitted lax.scan with
    # the split metrics computed on device, fetching only [B, 1+S] scalars
    # per block (the same recipe as the temporal engine's 74x scan win).
    # Semantics match the per-epoch loop: same rng stream (split per epoch),
    # eval at `epoch % eval_step == 0` and at the final epoch, best-val
    # tracking and logging on host from the fetched scalars.

    def _device_split_metrics(self, out, labels, split_masks):
        """Per-split metric on device → [S] for split_masks [S, N].

        Exactly matches the host metric for the cases the scanned path
        accepts: 'acc' == METRICS['acc'] for single-label targets (int
        labels, or the one-hot labels_train derived from them on the bce
        path), 'mse' == METRICS['mse'] for dense targets. rocauc/f1 and
        multilabel acc stay host-side (fit falls back to the per-epoch
        loop; parity asserted in tests/test_trainer.py)."""
        if self.metric_name == "rocauc":
            from difformer_tpu.utils.metrics import device_rocauc_tasks

            return jnp.stack([
                device_rocauc_tasks(out.astype(jnp.float32), labels,
                                    split_masks[s])
                for s in range(split_masks.shape[0])
            ])
        if self.metric_name == "acc":
            pred = jnp.argmax(out, axis=-1)
            true = labels if labels.ndim == 1 else jnp.argmax(labels, axis=-1)
            val = (pred == true).astype(jnp.float32)
        else:  # mse
            val = (out.reshape(labels.shape).astype(jnp.float32)
                   - labels.astype(jnp.float32)) ** 2
            if val.ndim > 1:
                val = val.mean(axis=-1)
        m = split_masks.astype(jnp.float32)
        return (m @ val) / jnp.maximum(m.sum(axis=1), 1.0)

    def _train_body(self, carry, _, train_mask, g, labels, kwargs):
        state, rng = carry
        rng, sk = jax.random.split(rng)
        state, loss = self._train_step_impl(
            state, sk, train_mask, g, labels, kwargs)
        return (state, rng), loss

    def _fit_block(self, groups, eval_step):
        """Jitted block of ``groups * eval_step`` epochs with one on-device
        eval per group, placed AFTER the first epoch of the group (matching
        the per-epoch loop's ``epoch % eval_step == 0`` schedule when the
        block starts on an eval_step boundary). The eval positions are
        STATIC — an earlier version used ``lax.cond`` per epoch, and the
        mere presence of the never-taken eval branch cost ~20% step time on
        TPU (measured 38.2 vs 31.6 ms/epoch at the headline shape); nested
        scans with unconditional evals run at the bare train-step rate."""
        key = (groups, eval_step)
        if key not in self._block_cache:
            def block(state, rng, train_mask, split_masks, g, labels,
                      kwargs):
                body = functools.partial(
                    self._train_body, train_mask=train_mask, g=g,
                    labels=labels, kwargs=kwargs)

                def group(carry, _):
                    carry, loss0 = body(carry, None)
                    state, rng = carry
                    out = self._forward_eval_impl(
                        state.params, state.extra, g, kwargs)
                    metrics = self._device_split_metrics(
                        out, labels, split_masks)
                    carry, losses = jax.lax.scan(
                        body, carry, None, length=eval_step - 1)
                    return carry, (
                        jnp.concatenate([loss0[None], losses]), metrics)

                (state, rng), (losses, metrics) = jax.lax.scan(
                    group, (state, rng), None, length=groups)
                return state, rng, losses.reshape(-1), metrics

            self._block_cache[key] = jax.jit(block, donate_argnums=(0,))
        return self._block_cache[key]

    def _fit_noeval_block(self, length):
        """Jitted pure train-step scan (used when eval_step >= epochs)."""
        key = ("noeval", length)
        if key not in self._block_cache:
            def block(state, rng, train_mask, g, labels, kwargs):
                body = functools.partial(
                    self._train_body, train_mask=train_mask, g=g,
                    labels=labels, kwargs=kwargs)
                (state, rng), losses = jax.lax.scan(
                    body, (state, rng), None, length=length)
                return state, rng, losses

            self._block_cache[key] = jax.jit(block, donate_argnums=(0,))
        return self._block_cache[key]

    def _scan_eligible(self, epoch_block, eval_step, save_best, print_prop,
                       ckpt_dir, checkpoint_every, resume):
        if not epoch_block or epoch_block <= 1:
            return False
        if save_best or print_prop or resume:
            return False            # need per-epoch host access to params/out
        if ckpt_dir and checkpoint_every > 0:
            return False
        if self.metric_name == "mse":
            return True
        le = self.labels_eval
        if self.metric_name == "rocauc":
            # device_rocauc_tasks matches host eval_rocauc for NaN-free
            # multilabel targets (the proteins-family shape); the
            # single-column softmax variant stays host-side
            return le.ndim == 2 and le.shape[-1] > 1
        if self.metric_name != "acc":
            return False            # f1 stays host-side
        # device acc matches host eval_acc only for single-label targets
        return le.ndim == 1 or le.shape[-1] == 1

    def _fit_run_scanned(self, run, split_idx, train_mask, *, epochs,
                         epoch_block, eval_step, logger, verbose,
                         display_step, init_params):
        names = ("train", "valid", "test")
        n = self.graph.num_nodes
        split_masks = jnp.asarray(
            np.stack([idx_to_mask(split_idx[k], n) for k in names]))
        state = self.init_state(run, init_params=init_params)
        rng = jax.random.PRNGKey(1000 + self.seed + run)
        best = {"valid": -np.inf, "test": 0.0, "train": 0.0, "epoch": -1}

        def take(e, res, loss):
            nonlocal best
            if logger is not None:
                logger.add_result(
                    run, (res["train"], res["valid"], res["test"]))
            if res["valid"] > best["valid"]:
                best = {**res, "epoch": e}
            if verbose and e % display_step == 0:
                print(f"run {run} epoch {e}: loss {loss:.4f} "
                      f"train {res['train']:.4f} valid {res['valid']:.4f} "
                      f"test {res['test']:.4f}")

        epoch = 0
        last_eval = -1
        if eval_step < epochs:
            groups = max(1, epoch_block // eval_step)
            L = groups * eval_step              # epochs per block
            blk = self._fit_block(groups, eval_step)
            while epoch + L <= epochs:
                state, rng, losses, metrics = blk(
                    state, rng, train_mask, split_masks, self.graph,
                    self.labels_train, self.model_kwargs)
                losses = np.asarray(losses)
                metrics = np.asarray(metrics)
                for gi in range(groups):        # eval at group start epochs
                    e = epoch + gi * eval_step
                    take(e, dict(zip(names, map(float, metrics[gi]))),
                         losses[gi * eval_step])
                epoch += L
        else:
            # eval only at the end — but the per-epoch loop always evals at
            # epoch 0 (0 % eval_step == 0): reproduce it with a 1-epoch
            # block + device metrics, then pure train-step blocks
            blk1 = self._fit_noeval_block(1)
            state, rng, l0 = blk1(
                state, rng, train_mask, self.graph, self.labels_train,
                self.model_kwargs)
            take(0, self._eval_state_device(state, split_masks, names),
                 float(np.asarray(l0)[0]))
            last_eval = 0
            epoch = 1
            blk = self._fit_noeval_block(epoch_block)
            while epoch + epoch_block <= epochs:
                state, rng, losses = blk(
                    state, rng, train_mask, self.graph, self.labels_train,
                    self.model_kwargs)
                epoch += epoch_block
            if epoch < epochs:
                # trailing partial block in ONE dispatch (a per-epoch tail
                # here would pay a dispatch per epoch + a separate
                # train-step compile); length-keyed, so it compiles once
                blk_rem = self._fit_noeval_block(epochs - epoch)
                state, rng, losses = blk_rem(
                    state, rng, train_mask, self.graph, self.labels_train,
                    self.model_kwargs)
                epoch = epochs

        # remainder (and the forced final-epoch eval) via the per-epoch
        # path — same rng stream, metrics on device (tested identical to
        # the host metrics for the scan-eligible cases)
        while epoch < epochs:
            rng, step_rng = jax.random.split(rng)
            state, loss = self.train_step(state, step_rng, train_mask)
            if epoch % eval_step == 0 or epoch == epochs - 1:
                take(epoch, self._eval_state_device(state, split_masks,
                                                    names), float(loss))
                last_eval = epoch
            epoch += 1
        if last_eval != epochs - 1 and (epochs - 1) % eval_step != 0:
            # scanned blocks covered the final epoch but its forced eval
            # (reference main.py:133: every epoch incl. the last under
            # eval_step gating) was not an eval_step boundary; the final
            # epoch's loss is the tail of the last block's losses array
            take(epochs - 1, self._eval_state_device(state, split_masks,
                                                     names),
                 float(np.asarray(losses)[-1]))
        return best

    def _eval_state_device(self, state, split_masks, names):
        """Split metrics for a state, computed on device — NOT
        self.evaluate: the host path fetches the full [N, C] logits (58 MB
        ≈ seconds through the remote-TPU tunnel); this fetches [S]
        scalars."""
        if "state_eval" not in self._block_cache:
            def fe(params, extra, g, kwargs, labels, split_masks):
                out = self._forward_eval_impl(params, extra, g, kwargs)
                return self._device_split_metrics(out, labels, split_masks)

            self._block_cache["state_eval"] = jax.jit(fe)
        metrics = self._block_cache["state_eval"](
            state.params, state.extra, self.graph, self.model_kwargs,
            self.labels_train, split_masks)
        return dict(zip(names, map(float, np.asarray(metrics))))

    # -- public API ----------------------------------------------------------
    def train_step(self, state, rng, train_mask):
        return self._train_step(state, rng, train_mask, self.graph,
                                self.labels_train, self.model_kwargs)

    def evaluate(self, state, split_idx):
        out = np.asarray(
            self._forward_eval(state.params, state.extra, self.graph,
                               self.model_kwargs)
        )
        res = {}
        for name, idx in split_idx.items():
            idx = np.asarray(idx)
            res[name] = self.metric_fn(self.labels_eval[idx], out[idx])
        return res, out

    def fit(
        self,
        split_idx,
        *,
        epochs: int = 100,
        runs: int = 1,
        logger=None,
        eval_step: int = 1,
        verbose: bool = False,
        display_step: int = 50,
        save_best: bool = False,
        ckpt_dir: str = "",
        checkpoint_every: int = 0,
        resume: bool = False,
        init_params=None,
        print_prop: bool = False,
        epoch_block: int = 0,
    ):
        """``ckpt_dir`` + ``checkpoint_every=N`` writes a full training
        checkpoint (params, optimizer state, rng, best-val scalar) every N
        epochs via orbax; ``resume=True`` restarts from the latest one and
        continues the exact rng stream — the periodic-checkpoint/
        deterministic-resume pair the reference lacks (SURVEY.md §5).

        ``epoch_block > 1`` requests the epoch-scanned fast path (one jitted
        lax.scan per block of epochs, metrics on device — see the
        "epoch-scanned fast path" comment above); it silently falls back to
        the per-epoch loop when the configuration needs per-epoch host
        access (save_best / print_prop / checkpointing / resume) or a
        host-side metric (rocauc, f1, multilabel acc)."""
        n = self.graph.num_nodes
        train_mask = jnp.asarray(idx_to_mask(split_idx["train"], n))
        if self._scan_eligible(epoch_block, eval_step, save_best, print_prop,
                               ckpt_dir, checkpoint_every, resume):
            return [
                self._fit_run_scanned(
                    run, split_idx, train_mask, epochs=epochs,
                    epoch_block=epoch_block, eval_step=eval_step,
                    logger=logger, verbose=verbose,
                    display_step=display_step, init_params=init_params)
                for run in range(runs)
            ]
        summaries = []
        for run in range(runs):
            state = self.init_state(run, init_params=init_params)
            rng = jax.random.PRNGKey(1000 + self.seed + run)
            best = {"valid": -np.inf, "test": 0.0, "train": 0.0, "epoch": -1}
            best_params = None
            start_epoch = 0
            mgr = None
            if ckpt_dir and checkpoint_every > 0:
                from difformer_tpu.train.checkpoint import CheckpointManager

                mgr = CheckpointManager(f"{ckpt_dir}/run{run}")
                last = mgr.latest_step() if resume else None
                if last is not None:
                    restored = mgr.restore(last, {
                        "state": state, "rng": rng,
                        "best_valid": np.array(0.0, np.float32),
                    })
                    state, rng = restored["state"], restored["rng"]
                    best["valid"] = float(restored["best_valid"])
                    start_epoch = last + 1
            for epoch in range(start_epoch, epochs):
                rng, step_rng = jax.random.split(rng)
                state, loss = self.train_step(state, step_rng, train_mask)
                if epoch % eval_step == 0 or epoch == epochs - 1:
                    res, out = self.evaluate(state, split_idx)
                    if logger is not None:
                        logger.add_result(
                            run, (res["train"], res["valid"], res["test"])
                        )
                    if res["valid"] > best["valid"]:
                        best = {**res, "epoch": epoch}
                        if save_best:
                            best_params = jax.tree_util.tree_map(
                                np.asarray, state.params
                            )
                    if verbose and epoch % display_step == 0:
                        print(
                            f"run {run} epoch {epoch}: loss {float(loss):.4f} "
                            f"train {res['train']:.4f} valid {res['valid']:.4f} "
                            f"test {res['test']:.4f}"
                        )
                        if print_prop:
                            # reference main.py:149-151 diagnostic
                            pred = out.argmax(axis=-1)
                            _, counts = np.unique(pred, return_counts=True)
                            print("Predicted proportions:",
                                  counts / pred.shape[0])
                if mgr is not None and (epoch + 1) % checkpoint_every == 0:
                    mgr.save(epoch, {
                        "state": jax.tree_util.tree_map(np.asarray, state),
                        "rng": np.asarray(rng),
                        "best_valid": np.array(best["valid"], np.float32),
                    })
            if mgr is not None:
                mgr.close()  # flush async orbax writes
            if save_best:
                best["params"] = best_params
            summaries.append(best)
        return summaries

    def evaluate_params(self, params, split_idx, extra=None):
        """Eval-only path for loaded checkpoints (reference
        ``test_large_dataset.py:85-98`` capability)."""
        state = TrainState(params=params, opt_state=None, step=0,
                           extra=extra or {})
        return self.evaluate(state, split_idx)
