"""Pallas kernel tests — run in interpreter mode on CPU; numerics must match
the XLA reference paths exactly."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.kernels.pallas_sigmoid_attention import (
    sigmoid_attention_pallas,
)
from difformer_tpu.ops.sigmoid_attention import (
    sigmoid_attention,
    sigmoid_attention_dense,
)


@pytest.mark.parametrize("n,l", [(64, 64), (100, 130)])
@pytest.mark.parametrize("heads", [1, 2])
def test_pallas_sigmoid_matches_dense(rng, n, l, heads):
    m, d = 8, 16
    q = rng.normal(size=(n, heads, m)).astype(np.float32)
    k = rng.normal(size=(l, heads, m)).astype(np.float32)
    v = rng.normal(size=(l, heads, d)).astype(np.float32)
    mask = np.ones(l, np.float32)
    got = sigmoid_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        interpret=True,
    )
    expect = sigmoid_attention_dense(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_pallas_sigmoid_key_mask(rng):
    n, l, m, d = 40, 96, 8, 8
    q = rng.normal(size=(n, 1, m)).astype(np.float32)
    k = rng.normal(size=(l, 1, m)).astype(np.float32)
    v = rng.normal(size=(l, 1, d)).astype(np.float32)
    mask = np.zeros(l, np.float32)
    mask[:60] = 1.0
    got = sigmoid_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        interpret=True,
    )
    expect = sigmoid_attention_dense(
        jnp.asarray(q), jnp.asarray(k[:60]), jnp.asarray(v[:60])
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_pallas_sigmoid_grads_match_dense(rng):
    n, m, d = 48, 8, 8
    q = rng.normal(size=(n, 1, m)).astype(np.float32)
    k = rng.normal(size=(n, 1, m)).astype(np.float32)
    v = rng.normal(size=(n, 1, d)).astype(np.float32)
    t = rng.normal(size=(n, 1, d)).astype(np.float32)
    mask = jnp.ones((n,), jnp.float32)

    def loss_pallas(q, k, v):
        out = sigmoid_attention_pallas(q, k, v, mask, interpret=True)
        return jnp.sum((out - t) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum((sigmoid_attention_dense(q, k, v) - t) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_pallas_sigmoid_bfloat16(rng):
    """bf16 inputs: MXU-rate path; accumulation stays f32 in scratch."""
    n, m, d = 96, 16, 16
    q = rng.normal(size=(n, 1, m)).astype(np.float32)
    k = rng.normal(size=(n, 1, m)).astype(np.float32)
    v = rng.normal(size=(n, 1, d)).astype(np.float32)
    mask = jnp.ones((n,), jnp.float32)
    got = sigmoid_attention_pallas(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), mask, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    expect = sigmoid_attention_dense(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), expect, rtol=0.05, atol=0.05)


@pytest.mark.parametrize("n,l", [(64, 64), (100, 130)])
@pytest.mark.parametrize("heads", [1, 2])
def test_pallas_bwd_matches_dense(rng, n, l, heads):
    """Pallas backward kernels (dq + dk/dv) vs autodiff through the dense
    reference — rectangular N≠L, multi-head, with key mask."""
    m, d = 8, 16
    q = jnp.asarray(rng.normal(size=(n, heads, m)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(l, heads, m)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(l, heads, d)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, heads, d)).astype(np.float32))
    mask = np.zeros(l, np.float32)
    mask[: l - 7] = 1.0
    mask = jnp.asarray(mask)

    def loss_pallas(q, k, v):
        out = sigmoid_attention_pallas(q, k, v, mask, interpret=True)
        return jnp.sum((out - t) ** 2)

    def loss_dense(q, k, v):
        out = sigmoid_attention_dense(q, k, v, key_mask=mask)
        return jnp.sum((out - t) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_pallas_bwd_matches_xla_bwd(rng):
    """The new Pallas backward and the legacy blockwise-XLA backward compute
    the same gradients (same residuals, same math)."""
    n, m, d = 72, 8, 8
    q = jnp.asarray(rng.normal(size=(n, 2, m)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, 2, m)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, 2, d)).astype(np.float32))

    def loss(q, k, v, xla_bwd):
        out = sigmoid_attention_pallas(q, k, v, None, interpret=True,
                                       xla_bwd=xla_bwd)
        return jnp.sum(out ** 2)

    gp = jax.grad(functools.partial(loss, xla_bwd=False),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(functools.partial(loss, xla_bwd=True),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pallas_bwd_bfloat16(rng):
    """bf16 backward: MXU-rate matmuls with f32 accumulation; loose tol."""
    n, m, d = 96, 16, 16
    qf = rng.normal(size=(n, 1, m)).astype(np.float32)
    kf = rng.normal(size=(n, 1, m)).astype(np.float32)
    vf = rng.normal(size=(n, 1, d)).astype(np.float32)

    def loss_p(q, k, v):
        return jnp.sum(sigmoid_attention_pallas(q, k, v, None,
                                                interpret=True) ** 2)

    def loss_d(q, k, v):
        return jnp.sum(sigmoid_attention_dense(q, k, v) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(
        jnp.asarray(qf, jnp.bfloat16), jnp.asarray(kf, jnp.bfloat16),
        jnp.asarray(vf, jnp.bfloat16))
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(
        jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf))
    for a, b in zip(gp, gd):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), b, rtol=0.1, atol=0.1)


def test_pallas_sigmoid_no_mask_fast_path(rng):
    """key_mask=None skips the mask multiply; padding is handled by the
    ones-column denominator — must match the dense reference exactly."""
    n, l, m, d = 100, 130, 8, 16
    q = rng.normal(size=(n, 2, m)).astype(np.float32)
    k = rng.normal(size=(l, 2, m)).astype(np.float32)
    v = rng.normal(size=(l, 2, d)).astype(np.float32)
    got = sigmoid_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, interpret=True)
    expect = sigmoid_attention_dense(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
    # gradients flow through the custom VJP with a None mask
    f = lambda q, k, v: jnp.sum(sigmoid_attention_pallas(
        q, k, v, None, interpret=True) ** 2)
    g = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    fd = lambda q, k, v: jnp.sum(sigmoid_attention_dense(q, k, v) ** 2)
    gd = jax.grad(fd, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(g, gd):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
