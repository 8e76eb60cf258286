"""Tensor parallelism (head-sharded Wq/Wk/Wv) vs single-device reference.

TP is GSPMD-annotated (parallel/tensor_parallel.py): the same program with
params column-sharded over a 'model' axis must produce the same numbers as
the replicated run — forward, and a full Adam train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from difformer_tpu.nn import DIFFormer
from difformer_tpu.parallel.mesh import make_mesh
from difformer_tpu.parallel.tensor_parallel import (
    make_tp_train_step,
    tp_apply,
    tp_param_specs,
    tp_shard_params,
)
from difformer_tpu.train.optim import torch_adam


def _toy(n=64, e=256, f=12, c=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    r = jnp.asarray(rng.integers(0, n, e), jnp.int32)
    y = jnp.asarray(rng.integers(0, c, n), jnp.int32)
    return x, s, r, y


def _model(kernel="simple", heads=4):
    return DIFFormer(hidden_channels=16, out_channels=4, num_layers=2,
                     num_heads=heads, kernel=kernel, dropout=0.0)


def test_tp_param_specs_target_projections():
    x, s, r, _ = _toy()
    model = _model()
    params = model.init(jax.random.PRNGKey(0), x, s, r, train=False)["params"]
    specs = tp_param_specs(params)
    assert specs["conv_0"]["Wq"]["kernel"] == P(None, "model")
    assert specs["conv_0"]["Wv"]["bias"] == P("model")
    assert specs["fc_in"]["kernel"] == P()
    assert specs["ln_0"] == jax.tree_util.tree_map(lambda _: P(),
                                                   specs["ln_0"])


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_tp_forward_matches_single_device(kernel):
    x, s, r, _ = _toy()
    model = _model(kernel=kernel)
    params = model.init(jax.random.PRNGKey(0), x, s, r, train=False)["params"]
    want = model.apply({"params": params}, x, s, r, train=False)

    mesh = make_mesh((4,), ("model",))
    tp_params = tp_shard_params(params, mesh)
    got = tp_apply(model, mesh)(tp_params, x, s, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_forward_2d_mesh_node_by_head():
    x, s, r, _ = _toy()
    model = _model()
    params = model.init(jax.random.PRNGKey(0), x, s, r, train=False)["params"]
    want = model.apply({"params": params}, x, s, r, train=False)

    mesh = make_mesh((2, 2), ("graph", "model"))
    tp_params = tp_shard_params(params, mesh)
    got = tp_apply(model, mesh, node_axis="graph")(tp_params, x, s, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _nll(logits, labels, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return -jnp.sum(ll * m), jnp.sum(m)


def test_tp_train_step_matches_single_device():
    x, s, r, y = _toy()
    mask = jnp.ones(x.shape[0], bool)
    model = _model()
    params = model.init(jax.random.PRNGKey(0), x, s, r, train=False)["params"]
    tx = torch_adam(1e-2, 5e-4)

    # single-device reference: same objective, same update rule
    def objective(p):
        logits = model.apply({"params": p}, x, s, r, train=True,
                             rngs={"dropout": jax.random.PRNGKey(7)})
        total, count = _nll(logits, y, mask)
        return total / count

    loss_ref, grads = jax.value_and_grad(objective)(params)
    upd, _ = tx.update(grads, tx.init(params), params)
    want = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

    mesh = make_mesh((4,), ("model",))
    tp_params = tp_shard_params(params, mesh)
    step = make_tp_train_step(model, mesh, tx, _nll)
    got, opt_state, loss = step(tp_params, tx.init(params), x, s, r, y, mask,
                                jax.random.PRNGKey(7))
    assert abs(float(loss) - float(loss_ref)) < 1e-5

    flat_w, _ = jax.tree_util.tree_flatten(want)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)

    # updated params keep their TP shardings (no silent re-replication)
    wq = got["conv_0"]["Wq"]["kernel"]
    assert not wq.sharding.is_fully_replicated

    # second step runs from the donated/sharded state
    got2, _, loss2 = step(got, opt_state, x, s, r, y, mask,
                          jax.random.PRNGKey(8))
    assert np.isfinite(float(loss2))
