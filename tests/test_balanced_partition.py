"""Edge-balanced (degree-balanced) partitioning: same math as the uniform
contiguous layout, better per-shard edge balance on skewed graphs
(SURVEY.md §7.3 risk 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.nn import DIFFormer
from difformer_tpu.parallel import make_mesh, partition_graph
from difformer_tpu.parallel.api import sharded_apply
from difformer_tpu.parallel.partition import edge_balanced_layout

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((N_DEV,), ("graph",))


def _skewed_graph(n=128, e=1024, f=8, c=3, seed=0):
    """Receivers follow a power-ish law: low-id nodes absorb most edges —
    the layout where equal-node shards have badly unbalanced edge counts."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    senders = rng.integers(0, n, e)
    u = rng.random(e)
    receivers = np.minimum((u ** 3 * n).astype(np.int64), n - 1)
    ei = np.stack([senders, receivers]).astype(np.int64)
    y = rng.integers(0, c, n)
    return x, ei, y


def test_layout_balances_edges():
    x, ei, y = _skewed_graph()
    n = x.shape[0]
    perm, n_loc = edge_balanced_layout(ei, n, N_DEV)
    assert perm.shape == (n,)
    assert sorted(set(perm // n_loc)) == list(range(N_DEV))

    def shard_edge_counts(shard_of_node):
        return np.bincount(shard_of_node[ei[1]], minlength=N_DEV)

    uniform_counts = shard_edge_counts(
        np.arange(n) // (-(-n // N_DEV)))
    balanced_counts = shard_edge_counts(perm // n_loc)
    assert balanced_counts.max() < uniform_counts.max()
    # within 2x of perfect balance (integer cuts on a skewed graph)
    assert balanced_counts.max() <= 2 * ei.shape[1] / N_DEV


def test_balanced_partition_matches_single_device(mesh):
    x, ei, y = _skewed_graph()
    n, c = x.shape[0], 3

    single = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2)
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    variables = single.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r,
                            train=False)
    expect = np.asarray(single.apply(variables, jnp.asarray(x), s, r,
                                     train=False))

    sharded_model = DIFFormer(hidden_channels=16, out_channels=c,
                              num_layers=2, axis_name="graph")
    perm, n_loc = edge_balanced_layout(ei, n, N_DEV)
    for build_halo in (False, True):
        sg = partition_graph(x, ei, N_DEV, labels=y, node_perm=perm,
                             nodes_per_shard=n_loc, build_halo=build_halo)
        apply_fn = sharded_apply(sharded_model, mesh)
        got = np.asarray(
            jax.jit(lambda p, g: apply_fn(p, g))(variables["params"], sg)
        ).reshape(-1, c)[perm]               # padded layout -> original order
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_distributed_trainer_balance_edges():
    from difformer_tpu.data.splits import rand_train_test_idx
    from difformer_tpu.data.transforms import standard_preprocess
    from difformer_tpu.train.distributed import DistributedTrainer
    from difformer_tpu.train.trainer import idx_to_mask

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
                            train_mask=train_mask, lr=1e-2, loss="nll",
                            balance_edges=True)
    res = tr.fit(split, epochs=40, runs=1, eval_step=5)
    assert res[0]["test"] > 0.5, res
