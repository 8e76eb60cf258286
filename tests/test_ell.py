"""ELL scatter-free SpMM tests: parity with gcn_conv, gradient parity, and
model integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.nn import DIFFormer
from difformer_tpu.ops.ell import build_ell_gcn, gcn_conv_ell
from difformer_tpu.ops.graph_ops import gcn_conv


@pytest.mark.parametrize("shape", [(1, 4), (2, 8)])
def test_ell_matches_gcn_conv(rng, shape):
    n, e = 50, 400
    h, d = shape
    x = rng.normal(size=(n, h, d)).astype(np.float32)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    expect = gcn_conv(
        jnp.asarray(x), jnp.asarray(senders, jnp.int32),
        jnp.asarray(receivers, jnp.int32), None,
    )
    ef, er = build_ell_gcn(senders, receivers, n)
    got = gcn_conv_ell(jnp.asarray(x), ef, er)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_ell_skewed_degrees(rng):
    """Power-law-ish: one hub node with huge in-degree."""
    n = 40
    senders = np.concatenate([
        rng.integers(0, n, 500),
        rng.integers(0, n, 30),
    ])
    receivers = np.concatenate([
        np.zeros(500, np.int64),            # hub
        rng.integers(1, n, 30),
    ])
    x = rng.normal(size=(n, 1, 4)).astype(np.float32)
    expect = gcn_conv(
        jnp.asarray(x), jnp.asarray(senders, jnp.int32),
        jnp.asarray(receivers, jnp.int32), None,
    )
    ef, er = build_ell_gcn(senders, receivers, n)
    got = gcn_conv_ell(jnp.asarray(x), ef, er)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_ell_gradient_matches(rng):
    n, e = 30, 150
    x = rng.normal(size=(n, 1, 4)).astype(np.float32)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    t = rng.normal(size=(n, 1, 4)).astype(np.float32)
    ef, er = build_ell_gcn(senders, receivers, n)

    def loss_ell(x):
        return jnp.sum((gcn_conv_ell(x, ef, er) - t) ** 2)

    def loss_seg(x):
        return jnp.sum((gcn_conv(
            x, jnp.asarray(senders, jnp.int32),
            jnp.asarray(receivers, jnp.int32), None,
        ) - t) ** 2)

    g1 = jax.grad(loss_ell)(jnp.asarray(x))
    g2 = jax.grad(loss_seg)(jnp.asarray(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_ell_edgeless_graph():
    ef, er = build_ell_gcn(np.zeros(0, np.int64), np.zeros(0, np.int64), 10)
    x = jnp.ones((10, 1, 3))
    out = gcn_conv_ell(x, ef, er)
    np.testing.assert_allclose(out, 0.0)


def test_difformer_with_ell_matches_coo(rng):
    n, e, f, c = 80, 400, 8, 3
    x = rng.normal(size=(n, f)).astype(np.float32)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    s = jnp.asarray(senders, jnp.int32)
    r = jnp.asarray(receivers, jnp.int32)
    model = DIFFormer(hidden_channels=16, out_channels=c, num_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), s, r,
                           train=False)
    out_coo = model.apply(variables, jnp.asarray(x), s, r, train=False)
    ell = build_ell_gcn(senders, receivers, n)
    out_ell = model.apply(variables, jnp.asarray(x), s, r, train=False,
                          ell=ell)
    np.testing.assert_allclose(np.asarray(out_coo), np.asarray(out_ell),
                               rtol=2e-4, atol=2e-5)


def test_ell_matvec_feature_chunking_matches_unchunked(rng, monkeypatch):
    """A tiny gather budget forces multi-chunk execution; results are
    identical to the single-gather path (the HBM guard for wide trailing
    dims, e.g. H=8)."""
    import difformer_tpu.ops.ell as ell_mod
    from difformer_tpu.ops.ell import build_ell_gcn, gcn_conv_ell

    n, e = 128, 1024
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n, 4, 8)).astype(np.float32))
    fwd, rev = build_ell_gcn(s, r, n)

    want = np.asarray(gcn_conv_ell(x, fwd, rev))
    monkeypatch.setattr(ell_mod, "_GATHER_BUDGET_BYTES", 4096)
    got = np.asarray(gcn_conv_ell(x, fwd, rev))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # gradient path (reverse ELL) chunks identically
    g = jnp.asarray(rng.normal(size=(n, 4, 8)).astype(np.float32))
    f = lambda x: jnp.vdot(gcn_conv_ell(x, fwd, rev), g)
    got_g = np.asarray(jax.grad(f)(x))
    monkeypatch.setattr(ell_mod, "_GATHER_BUDGET_BYTES", 1 << 30)
    want_g = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-6, atol=1e-6)


def test_ell_matvec_lane_rounded_scan_chunking(rng, monkeypatch):
    """F>128 path: chunk width rounds to the 128-lane tile and chunks run
    under lax.scan; numerics unchanged."""
    import difformer_tpu.ops.ell as ell_mod
    from difformer_tpu.ops.ell import build_ell_gcn, gcn_conv_ell

    n, e = 96, 512
    s = rng.integers(0, n, e).astype(np.int64)
    r = rng.integers(0, n, e).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n, 2, 160)).astype(np.float32))  # F=320
    fwd, rev = build_ell_gcn(s, r, n)
    want = np.asarray(gcn_conv_ell(x, fwd, rev))
    monkeypatch.setattr(ell_mod, "_GATHER_BUDGET_BYTES", 8192)
    got = np.asarray(jax.jit(lambda x: gcn_conv_ell(x, fwd, rev))(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
