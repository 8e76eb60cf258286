"""Importing the reference's trained torch DIFFormer checkpoints
(state_dict key layout per node classification/difformer.py:147-226)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.nn import DIFFormer
from difformer_tpu.utils.torch_import import (
    load_torch_checkpoint,
    params_from_torch_state_dict,
    torch_state_dict_from_params,
)


def _model_and_params(heads=2):
    m = DIFFormer(hidden_channels=8, out_channels=3, num_layers=2,
                  num_heads=heads, dropout=0.0)
    x = jnp.zeros((5, 4))
    s = r = jnp.zeros(6, jnp.int32)
    p = m.init(jax.random.PRNGKey(0), x, s, r, train=False)["params"]
    return m, p


def test_round_trip_preserves_tree():
    _, params = _model_and_params()
    sd = torch_state_dict_from_params(params)
    # reference key layout
    assert "fcs.0.weight" in sd and "convs.1.Wv.bias" in sd
    assert "bns.2.weight" in sd            # L+1 LayerNorms
    assert sd["fcs.0.weight"].shape == (8, 4)   # torch [out, in]

    back = params_from_torch_state_dict(sd)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converted_params_run_in_model():
    model, params = _model_and_params()
    back = params_from_torch_state_dict(torch_state_dict_from_params(params))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)),
                    jnp.float32)
    s = jnp.asarray(np.arange(10) % 10, jnp.int32)
    r = jnp.asarray((np.arange(10) * 3) % 10, jnp.int32)
    want = model.apply({"params": params}, x, s, r, train=False)
    got = model.apply({"params": back}, x, s, r, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_load_torch_checkpoint_file(tmp_path):
    torch = pytest.importorskip("torch")
    _, params = _model_and_params()
    sd = {k: torch.tensor(v) for k, v in
          torch_state_dict_from_params(params).items()}
    path = str(tmp_path / "cora-difformer.pkl")
    torch.save(sd, path)

    got = load_torch_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unknown_keys_raise():
    with pytest.raises(KeyError, match="unrecognized"):
        params_from_torch_state_dict({"foo.weight": np.zeros(3)})
