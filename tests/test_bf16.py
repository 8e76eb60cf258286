"""bf16 compute-dtype path: runs, stays finite, close to f32, and learns."""

import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.data.graph import GraphData
from difformer_tpu.data.splits import rand_train_test_idx
from difformer_tpu.data.synthetic import random_graph
from difformer_tpu.nn import DIFFormer
from difformer_tpu.train import FullBatchTrainer


def test_bf16_forward_close_to_f32(rng):
    n, e, f, c = 100, 400, 8, 3
    x, ei, y = random_graph(n, e, f, c, seed=3)
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    m32 = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                    dropout=0.0)
    mbf = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                    dropout=0.0, compute_dtype="bfloat16")
    v = m32.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r, train=False)
    o32 = np.asarray(m32.apply(v, jnp.asarray(x), s, r, train=False))
    obf = np.asarray(mbf.apply(v, jnp.asarray(x), s, r, train=False))
    assert obf.dtype == np.float32
    assert np.isfinite(obf).all()
    # bf16 has ~3 decimal digits; logits should agree loosely
    denom = np.maximum(np.abs(o32), 0.1)
    assert np.median(np.abs(obf - o32) / denom) < 0.1


def test_bf16_training_learns():
    n, c = 150, 3
    x, ei, y = random_graph(n, 600, 8, c, seed=5, homophily=0.85)
    g = GraphData.from_numpy(x, ei)
    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2,
                      dropout=0.0, compute_dtype="bfloat16")
    tr = FullBatchTrainer(model, g, y, lr=1e-2, loss="nll")
    res = tr.fit(rand_train_test_idx(y, 0.5, 0.25, rng=0), epochs=40, runs=1)
    assert res[0]["test"] > 0.5, res
