"""Pallas kernel tests — run in interpreter mode on CPU; numerics must match
the XLA reference paths exactly."""

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
