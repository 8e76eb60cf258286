"""Checkpoint/resume + profiling utils tests."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.data.graph import GraphData
from difformer_tpu.data.splits import rand_train_test_idx
from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.nn import DIFFormer
from difformer_tpu.train import FullBatchTrainer
from difformer_tpu.train.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from difformer_tpu.utils.profiling import ThroughputMeter, count_parameters


def _trainer():
    x, ei, y = random_graph(80, 300, 8, 3, seed=0)
    g = GraphData.from_numpy(x, ei)
    model = DIFFormer(hidden_channels=8, out_channels=3, dropout=0.0)
    return FullBatchTrainer(model, g, y, lr=1e-2), y


def test_save_restore_roundtrip(tmp_path):
    tr, y = _trainer()
    state = tr.init_state(0)
    mask = jnp.asarray(np.arange(80) < 40)
    state, _ = tr.train_step(state, jax.random.PRNGKey(0), mask)

    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, {"params": state.params,
                           "opt_state": state.opt_state,
                           "step": state.step})
    template = {"params": tr.init_state(1).params,
                "opt_state": tr.init_state(1).opt_state,
                "step": jnp.zeros((), jnp.int32)}
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == 1


def test_resume_determinism(tmp_path):
    """Training 2 steps straight == training 1 step, checkpoint, restore,
    1 more step (same rng stream)."""
    tr, _ = _trainer()
    mask = jnp.asarray(np.arange(80) < 40)
    rngs = [jax.random.PRNGKey(i) for i in range(2)]

    s = tr.init_state(0)
    for r in rngs:
        s, _ = tr.train_step(s, r, mask)
    direct = jax.tree_util.tree_leaves(s.params)

    s2 = tr.init_state(0)
    s2, _ = tr.train_step(s2, rngs[0], mask)
    path = os.path.join(tmp_path, "mid")
    save_checkpoint(path, {"params": s2.params, "opt_state": s2.opt_state})
    t = tr.init_state(0)
    restored = restore_checkpoint(path, {"params": t.params,
                                         "opt_state": t.opt_state})
    s3 = s2.replace(params=restored["params"],
                    opt_state=restored["opt_state"])
    s3, _ = tr.train_step(s3, rngs[1], mask)
    resumed = jax.tree_util.tree_leaves(s3.params)
    for a, b in zip(direct, resumed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_manager_best_slot(tmp_path):
    tr, _ = _trainer()
    state = tr.init_state(0)
    mgr = CheckpointManager(os.path.join(tmp_path, "run"), max_to_keep=2)
    assert mgr.save_if_best(0, {"params": state.params}, 0.5)
    assert not mgr.save_if_best(1, {"params": state.params}, 0.4)
    assert mgr.save_if_best(2, {"params": state.params}, 0.9)
    restored = mgr.restore_best({"params": tr.init_state(1).params})
    assert restored is not None
    mgr.close()


def test_throughput_meter_and_param_count():
    tr, _ = _trainer()
    state = tr.init_state(0)
    n = count_parameters(state.params)
    assert n > 0
    m = ThroughputMeter(edges_per_step=1000, layers=3)
    m.step(5)
    s = m.summary()
    assert s["steps"] == 5 and s["edges_per_s"] > 0
