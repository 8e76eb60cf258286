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


def test_periodic_checkpoint_and_deterministic_resume(tmp_path):
    """Kill training mid-run; resume from the latest periodic checkpoint;
    final params must equal the uninterrupted run (exact rng-stream
    continuation)."""
    import jax
    import numpy as np

    from difformer_tpu.data.graph import GraphData
    from difformer_tpu.data.splits import rand_train_test_idx
    from difformer_tpu.data.synthetic import random_graph
    from difformer_tpu.data.transforms import standard_preprocess
    from difformer_tpu.nn import DIFFormer
    from difformer_tpu.train import FullBatchTrainer

    n, c = 120, 3
    x, ei, y = random_graph(n, 500, 8, c, seed=5, homophily=0.8)
    g = GraphData.from_numpy(x, standard_preprocess(ei, n))
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)

    def make():
        m = DIFFormer(hidden_channels=8, out_channels=c, num_layers=2,
                      dropout=0.3)  # dropout: rng stream must line up too
        return FullBatchTrainer(m, g, y, lr=1e-2, seed=3)

    # uninterrupted 10 epochs
    t_full = make()
    t_full.fit(split, epochs=10, runs=1, save_best=True)
    # interrupted at 6 (checkpoint every 3 → latest at epoch 5)
    d = str(tmp_path / "ck")
    t_a = make()
    t_a.fit(split, epochs=6, runs=1, ckpt_dir=d, checkpoint_every=3)
    t_b = make()
    t_b.fit(split, epochs=10, runs=1, ckpt_dir=d, checkpoint_every=3,
            resume=True, save_best=True)

    # params equality is the real check: compare the epoch-8 checkpoint of
    # the resumed run against the same checkpoint of an uninterrupted run
    from difformer_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(f"{d}/run0")
    last = mgr.latest_step()
    assert last == 8  # epochs 2,5,8 saved with every=3
    restored = mgr.restore(last, {
        "state": t_b.init_state(0), "rng": jax.random.PRNGKey(0),
        "best_valid": np.array(0.0, np.float32),
    })

    # replay the uninterrupted trainer to epoch 8 checkpoint for comparison
    d2 = str(tmp_path / "ck2")
    t_c = make()
    t_c.fit(split, epochs=10, runs=1, ckpt_dir=d2, checkpoint_every=3)
    mgr2 = CheckpointManager(f"{d2}/run0")
    ref = mgr2.restore(mgr2.latest_step(), {
        "state": t_c.init_state(0), "rng": jax.random.PRNGKey(0),
        "best_valid": np.array(0.0, np.float32),
    })
    ra = jax.tree_util.tree_leaves(restored["state"].params)
    rb = jax.tree_util.tree_leaves(ref["state"].params)
    for a, b in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(restored["rng"]),
                                  np.asarray(ref["rng"]))
