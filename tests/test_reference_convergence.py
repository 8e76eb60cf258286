"""Full-training equivalence vs the EXECUTED reference (VERDICT r2 item 5).

Extends the 10-step trajectory parity (tests/test_reference_exec.py) to
complete 100+-epoch training runs on a Cora-statistics synthetic graph
(N=2708, E=10556, 7 classes, 140/500/1000 semi-supervised split — the shape
of ``node classification/run.sh:4-6``):

  * dropout-off **exact trajectory + same destination** for
    {simple, sigmoid} x {use_graph, graph_weight} — per-epoch losses track
    and the final train/valid/test accuracies agree;
  * dropout-on **distributional** check — final accuracy within the
    cross-seed spread (different RNGs make per-step parity meaningless,
    per SURVEY.md §7.3 risk 5);
  * one level up: ``FullBatchTrainer.fit`` (best-val selection) against the
    reference's epoch loop shape (``node classification/main.py:104-158``)
    run on the executed reference model — the frameworks pick the same
    answer, not just the same gradients.

The reference model code really runs (tests/ref_exec.py stubs only
torch_sparse.matmul and torch_geometric.utils.degree).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from difformer_tpu.data.graph import GraphData                     # noqa: E402
from difformer_tpu.data.synthetic import random_graph              # noqa: E402
from difformer_tpu.nn import DIFFormer                             # noqa: E402
from difformer_tpu.train import FullBatchTrainer                   # noqa: E402
from difformer_tpu.train.optim import torch_adam                   # noqa: E402
from difformer_tpu.utils.torch_import import (                     # noqa: E402
    params_from_torch_state_dict,
)
from tests.ref_exec import reference_difformer_v1                  # noqa: E402

N, E, F, C = 2708, 10556, 64, 7
HID, LAYERS = 32, 2
LR, WD = 1e-2, 5e-4
EPOCHS = 100


def _cora_like(seed=0):
    x, ei, y = random_graph(N, E, F, C, seed=seed, homophily=0.8)
    rng = np.random.default_rng(seed + 99)
    order = rng.permutation(N)
    split = {"train": order[:140], "valid": order[140:640],
             "test": order[640:1640]}
    return x, ei.astype(np.int64), y.astype(np.int64), split


def _build_pair(kernel, flags, seed=0, dropout=0.0):
    ref = reference_difformer_v1()
    torch.manual_seed(seed)
    tmodel = ref.DIFFormer(
        F, HID, C, num_layers=LAYERS, kernel=kernel, dropout=dropout,
        num_heads=flags.get("num_heads", 1),
        use_bn=True, use_residual=True, use_weight=True,
        use_graph=flags.get("use_graph", True),
        graph_weight=flags.get("graph_weight", -1),
        use_source=False,
    )
    jmodel = DIFFormer(hidden_channels=HID, out_channels=C,
                       num_layers=LAYERS, kernel=kernel, dropout=dropout,
                       **flags)
    params = params_from_torch_state_dict(tmodel.state_dict())
    return tmodel, jmodel, params


def _torch_train(tmodel, x, ei, y, split, epochs, seed=0, eval_every=1):
    """The reference's epoch-loop shape (main.py:104-158): full-batch NLL
    Adam steps, per-epoch eval, best-val selection."""
    torch.manual_seed(seed)
    opt = torch.optim.Adam(tmodel.parameters(), lr=LR, weight_decay=WD)
    x_t = torch.tensor(x)
    ei_t = torch.tensor(ei)
    y_t = torch.tensor(y)
    tr = torch.tensor(split["train"])
    losses = []
    best = {"valid": -1.0}
    for epoch in range(epochs):
        tmodel.train()
        opt.zero_grad()
        out = tmodel(x_t, ei_t)
        loss = torch.nn.functional.nll_loss(
            torch.nn.functional.log_softmax(out[tr], dim=1), y_t[tr])
        loss.backward()
        opt.step()
        losses.append(float(loss))
        if epoch % eval_every == 0 or epoch == epochs - 1:
            tmodel.eval()
            with torch.no_grad():
                logits = tmodel(x_t, ei_t).numpy()
            accs = {k: float((logits[v].argmax(1) == y[v]).mean())
                    for k, v in split.items()}
            if accs["valid"] > best["valid"]:
                best = {**accs, "epoch": epoch}
    tmodel.eval()
    with torch.no_grad():
        final = tmodel(x_t, ei_t).numpy()
    return losses, final, best


def _jax_train(jmodel, params, x, ei, y, split, epochs, dropout_seed=0):
    tx = torch_adam(LR, WD)
    opt_state = tx.init(params)
    xs = jnp.asarray(x)
    s = jnp.asarray(ei[0], jnp.int32)
    r = jnp.asarray(ei[1], jnp.int32)
    tr = jnp.asarray(split["train"])
    yj = jnp.asarray(y[split["train"]])

    @jax.jit
    def step(params, opt_state, rng):
        def objective(p):
            logits = jmodel.apply({"params": p}, xs, s, r, train=True,
                                  rngs={"dropout": rng})
            logp = jax.nn.log_softmax(logits[tr], axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, yj[:, None], axis=-1))
        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    fwd = jax.jit(lambda p: jmodel.apply({"params": p}, xs, s, r,
                                         train=False))
    losses = []
    rng = jax.random.PRNGKey(dropout_seed)
    for _ in range(epochs):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    final = np.asarray(fwd(params))
    return losses, final, params


def _accs(logits, y, split):
    return {k: float((logits[v].argmax(1) == y[v]).mean())
            for k, v in split.items()}


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
@pytest.mark.parametrize("flags", [dict(), dict(graph_weight=0.7)],
                         ids=["use_graph", "graph_weight"])
def test_full_training_convergence_exact(kernel, flags):
    """100 epochs, dropout off: the loss trajectories track throughout and
    both frameworks land on the same accuracies."""
    x, ei, y, split = _cora_like()
    tmodel, jmodel, params = _build_pair(kernel, flags)

    losses_t, final_t, _ = _torch_train(tmodel, x, ei, y, split, EPOCHS,
                                        eval_every=EPOCHS)  # eval only at end
    losses_j, final_j, _ = _jax_train(jmodel, params, x, ei, y, split,
                                      EPOCHS)

    losses_t, losses_j = np.asarray(losses_t), np.asarray(losses_j)
    # early trajectory is bit-comparable; late epochs accumulate fp32
    # round-off divergence — bound the relative drift over the whole run
    np.testing.assert_allclose(losses_j[:20], losses_t[:20],
                               rtol=2e-3, atol=2e-4)
    rel = np.abs(losses_j - losses_t) / (np.abs(losses_t) + 1e-3)
    assert rel.max() < 0.08, f"loss trajectories diverged: {rel.max():.3f}"

    acc_t, acc_j = _accs(final_t, y, split), _accs(final_j, y, split)
    for k in ("train", "valid", "test"):
        assert abs(acc_t[k] - acc_j[k]) <= 0.015, (k, acc_t, acc_j)


def test_full_training_dropout_distributional():
    """Dropout on (0.5): per-step parity is impossible across RNGs; the
    distributions must agree — mean final test accuracy over 3 seeds within
    the combined cross-seed spread."""
    x, ei, y, split = _cora_like()
    accs_t, accs_j = [], []
    for seed in range(3):
        tmodel, jmodel, params = _build_pair("simple", {}, seed=seed,
                                             dropout=0.5)
        _, final_t, _ = _torch_train(tmodel, x, ei, y, split, EPOCHS,
                                     seed=seed, eval_every=EPOCHS)
        accs_t.append(_accs(final_t, y, split)["test"])
        _, final_j, _ = _jax_train(jmodel, params, x, ei, y, split, EPOCHS,
                                   dropout_seed=seed)
        accs_j.append(_accs(final_j, y, split)["test"])
    mt, mj = np.mean(accs_t), np.mean(accs_j)
    spread = max(np.std(accs_t) + np.std(accs_j), 0.02)
    assert abs(mt - mj) <= 2 * spread, (accs_t, accs_j)


def test_trainer_best_val_selection_vs_reference_loop():
    """One level up (VERDICT r2 item 5): FullBatchTrainer.fit — jitted
    donated step, per-epoch eval, best-val selection — against the
    reference's script loop (main.py:104-158) running the executed
    reference model from the same weights."""
    x, ei, y, split = _cora_like()
    tmodel, jmodel, params = _build_pair("simple", {})

    _, _, best_t = _torch_train(tmodel, x, ei, y, split, EPOCHS)

    g = GraphData.from_numpy(x.astype(np.float32), ei)
    trainer = FullBatchTrainer(jmodel, g, y, lr=LR, weight_decay=WD,
                               loss="nll", metric="acc")
    best_j = trainer.fit(split, epochs=EPOCHS, runs=1,
                         init_params=params)[0]

    for k in ("train", "valid", "test"):
        assert abs(best_t[k] - best_j[k]) <= 0.015, (k, best_t, best_j)
