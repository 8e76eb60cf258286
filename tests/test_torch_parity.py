"""Cross-framework parity vs actual PyTorch (CPU): optimizer trajectories
and initializer distributions. The reference trains with
``torch.optim.Adam(weight_decay=wd)`` and ``nn.Linear`` defaults; these
tests pin our optax chain and init to torch's behavior exactly."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from difformer_tpu.train.optim import torch_adam


def test_adam_trajectory_matches_torch():
    """20 steps of Adam with coupled weight decay on identical quadratic
    losses must track torch to fp32 precision (catches eps placement,
    bias correction, decay ordering differences)."""
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    targets = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(20)]

    # torch
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=0.1)
    torch_traj = []
    for t in targets:
        opt.zero_grad()
        loss = ((wt - torch.tensor(t)) ** 2).sum()
        loss.backward()
        opt.step()
        torch_traj.append(wt.detach().numpy().copy())

    # ours
    tx = torch_adam(1e-2, weight_decay=0.1)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    for i, t in enumerate(targets):
        grad = 2 * (wj - jnp.asarray(t))
        updates, state = tx.update(grad, state, wj)
        wj = optax.apply_updates(wj, updates)
        np.testing.assert_allclose(
            np.asarray(wj), torch_traj[i], rtol=1e-5, atol=1e-6,
            err_msg=f"diverged at step {i}",
        )


def test_adam_no_decay_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4,)).astype(np.float32)
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=5e-3)
    tx = torch_adam(5e-3)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    for step in range(30):
        g_np = (np.sin(w0 * (step + 1))).astype(np.float32)
        opt.zero_grad()
        wt.grad = torch.tensor(g_np)
        opt.step()
        updates, state = tx.update(jnp.asarray(g_np), state, wj)
        wj = optax.apply_updates(wj, updates)
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_linear_init_distribution_matches_torch():
    """U(±1/√fan_in) for weight and bias — compare moments and bounds
    against torch.nn.Linear's default init."""
    fan_in, fan_out, trials = 64, 32, 50
    t_w = np.concatenate([
        torch.nn.Linear(fan_in, fan_out).weight.detach().numpy().ravel()
        for _ in range(trials)
    ])
    from difformer_tpu.nn.common import TorchLinear

    j_w = []
    for s in range(trials):
        v = TorchLinear(fan_out).init(
            jax.random.PRNGKey(s), jnp.zeros((1, fan_in))
        )
        j_w.append(np.asarray(v["params"]["kernel"]).ravel())
    j_w = np.concatenate(j_w)

    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(t_w).max() <= bound + 1e-6
    assert np.abs(j_w).max() <= bound + 1e-6
    np.testing.assert_allclose(t_w.std(), j_w.std(), rtol=0.05)
    np.testing.assert_allclose(t_w.mean(), j_w.mean(), atol=2e-3)


def test_layernorm_matches_torch(rng):
    x = rng.normal(size=(10, 16)).astype(np.float32)
    t_ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        t_out = t_ln(torch.tensor(x)).numpy()

    from difformer_tpu.nn.common import TorchLayerNorm

    m = TorchLayerNorm()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    j_out = np.asarray(m.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-5, atol=1e-5)
