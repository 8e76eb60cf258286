"""DistributedTrainer end-to-end on the 8-device CPU mesh: learns, and its
logits match the single-device trainer's given identical params."""

import numpy as np

from difformer_tpu.data.splits import rand_train_test_idx
from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.data.transforms import standard_preprocess
from difformer_tpu.nn import DIFFormer
from difformer_tpu.train.distributed import DistributedTrainer
from difformer_tpu.train.trainer import idx_to_mask


def test_distributed_trainer_learns():
    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=21, homophily=0.85)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      dropout=0.0, axis_name="graph")
    init_model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                           dropout=0.0)
    tr = DistributedTrainer(model, init_model, x, ei, y,
                            train_mask=train_mask, lr=1e-2, loss="nll")
    res = tr.fit(split, epochs=40, runs=1, eval_step=5)
    assert res[0]["test"] > 0.5, res


def test_distributed_trainer_bsr_matches_halo():
    """spmm='bsr' (sharded block-sparse hybrid) trains to the same quality
    as the default halo path and its eval logits agree given equal params."""
    n, c = 256, 3
    x, ei, y = random_graph(n, 2000, 10, c, seed=22, homophily=0.9)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      dropout=0.0, axis_name="graph")
    init_model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                           dropout=0.0)
    tr_halo = DistributedTrainer(model, init_model, x, ei, y,
                                 train_mask=train_mask, lr=1e-2, loss="nll")
    tr_bsr = DistributedTrainer(model, init_model, x, ei, y,
                                train_mask=train_mask, lr=1e-2, loss="nll",
                                spmm="bsr", bsr_tile=16)

    # identical params → identical logits (up to fp reassociation)
    params, _ = tr_halo.init_state(0)
    out_h = np.asarray(tr_halo._apply(params, tr_halo.sg))
    out_b = np.asarray(tr_bsr._apply(params, tr_bsr.sg, tr_bsr._ell))
    out_h = out_h.reshape(-1, c)[:n]
    out_b = out_b.reshape(-1, c)[:n]
    np.testing.assert_allclose(out_b, out_h, rtol=2e-4, atol=2e-5)

    res = tr_bsr.fit(split, epochs=40, runs=1, eval_step=5)
    assert res[0]["test"] > 0.5, res


def test_distributed_trainer_checkpoint_resume(tmp_path):
    """Interrupted sharded run resumed from the periodic checkpoint matches
    the uninterrupted run exactly (same rng stream, same params)."""
    import jax

    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=23, homophily=0.85)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    def make():
        model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                          dropout=0.0, axis_name="graph")
        init_model = DIFFormer(hidden_channels=16, out_channels=c,
                               num_layers=2, dropout=0.0)
        return DistributedTrainer(model, init_model, x, ei, y,
                                  train_mask=train_mask, lr=1e-2, loss="nll")

    from difformer_tpu.train.checkpoint import CheckpointManager

    def ckpt_template(tr):
        p, o = tr.init_state(0)
        return {"params": p, "opt_state": o, "rng": jax.random.PRNGKey(0),
                "best_valid": np.array(0.0, np.float32)}

    # interrupted at 6 (checkpoints at 2, 5), resumed to 10 → ckpt at 8
    d = str(tmp_path / "ck")
    tr_a = make()
    tr_a.fit(split, epochs=6, runs=1, ckpt_dir=d, checkpoint_every=3)
    tr_b = make()
    tr_b.fit(split, epochs=10, runs=1, ckpt_dir=d, checkpoint_every=3,
             resume=True)
    mgr = CheckpointManager(f"{d}/run0")
    assert mgr.latest_step() == 8
    resumed = mgr.restore(8, ckpt_template(tr_b))

    # uninterrupted run's epoch-8 checkpoint must match exactly
    d2 = str(tmp_path / "ck2")
    tr_c = make()
    tr_c.fit(split, epochs=10, runs=1, ckpt_dir=d2, checkpoint_every=3)
    mgr2 = CheckpointManager(f"{d2}/run0")
    ref = mgr2.restore(8, ckpt_template(tr_c))
    for a, b in zip(jax.tree_util.tree_leaves(resumed["params"]),
                    jax.tree_util.tree_leaves(ref["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_distributed_trainer_rejects_unknown_layout():
    """ADVICE r3: a typo'd layout string must raise, not silently fall back
    to 'balanced'."""
    import pytest

    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=21, homophily=0.85)
    ei = standard_preprocess(ei, n)
    train_mask = idx_to_mask(rand_train_test_idx(y, 0.5, 0.25, rng=0)["train"],
                             n)
    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      dropout=0.0, axis_name="graph")
    init_model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                           dropout=0.0)
    with pytest.raises(ValueError, match="unknown layout"):
        DistributedTrainer(model, init_model, x, ei, y,
                           train_mask=train_mask, layout="local")


def test_distributed_device_eval_matches_host():
    """The sharded device-eval path (scalars only cross host) equals the
    host fetch-all-logits metric, for both layouts (perm vs none)."""
    from difformer_tpu.parallel.api import fetch_to_host

    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=29, homophily=0.85)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    for layout in (None, "locality"):
        model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                          dropout=0.0, axis_name="graph")
        init_model = DIFFormer(hidden_channels=16, out_channels=c,
                               num_layers=2, dropout=0.0)
        tr = DistributedTrainer(model, init_model, x, ei, y,
                                train_mask=train_mask, layout=layout)
        params, _ = tr.init_state(0)
        res_dev = tr.evaluate(params, split)

        # host reference on the same logits
        out = fetch_to_host(tr._apply(params, tr.sg))
        out = out.reshape(-1, out.shape[-1])
        out = (out[tr._node_perm] if tr._node_perm is not None
               else out[:n])
        for name, idx in split.items():
            want = tr.metric_fn(y[np.asarray(idx)], out[np.asarray(idx)])
            np.testing.assert_allclose(res_dev[name], want, atol=1e-6)


def test_distributed_scanned_fit_matches_loop():
    """round 5: DistributedTrainer's epoch-scanned fast path (one jitted
    lax.scan per block, on-device eval) produces the same per-epoch
    logger rows and best summary as the per-epoch dispatch loop."""
    from difformer_tpu.utils.logger import RunLogger

    n, c = 160, 3
    x, ei, y = random_graph(n, 700, 10, c, seed=24, homophily=0.85)
    ei = standard_preprocess(ei, n)
    split = rand_train_test_idx(y, 0.5, 0.25, rng=0)
    train_mask = idx_to_mask(split["train"], n)

    def make():
        model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                          dropout=0.0, axis_name="graph")
        init_model = DIFFormer(hidden_channels=16, out_channels=c,
                               num_layers=2, dropout=0.0)
        return DistributedTrainer(model, init_model, x, ei, y,
                                  train_mask=train_mask, lr=1e-2,
                                  loss="nll")

    # epochs=11, eval_step=2, epoch_block=4 exercises: scanned groups,
    # the trailing per-epoch remainder, and the forced final-epoch eval
    log_a, log_b = RunLogger(1), RunLogger(1)
    res_a = make().fit(split, epochs=11, eval_step=2, epoch_block=4,
                       logger=log_a)
    res_b = make().fit(split, epochs=11, eval_step=2, epoch_block=0,
                       logger=log_b)
    assert len(log_a.results[0]) == len(log_b.results[0])
    np.testing.assert_allclose(
        np.asarray(log_a.results[0]), np.asarray(log_b.results[0]),
        rtol=1e-5, atol=1e-6)
    for k in ("train", "valid", "test", "epoch"):
        np.testing.assert_allclose(res_a[0][k], res_b[0][k],
                                   rtol=1e-5, atol=1e-6)
