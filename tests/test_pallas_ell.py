"""Pallas ELL SpMM kernel vs the XLA gather path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.kernels.pallas_ell_spmm import (
    ell_bucket_spmm_pallas,
    ell_matvec_pallas,
)
from difformer_tpu.ops.ell import _ell_matvec, build_ell_gcn


def test_bucket_kernel_matches_dense(rng):
    n, d, nb, k = 64, 16, 24, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, n, (nb, k)).astype(np.int32)
    w = rng.normal(size=(nb, k)).astype(np.float32)
    got = ell_bucket_spmm_pallas(
        jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w), interpret=True
    )
    expect = (x[idx] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_bucket_kernel_row_padding(rng):
    """nb not a multiple of block_rows."""
    n, d, nb, k = 40, 8, 13, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, n, (nb, k)).astype(np.int32)
    w = rng.normal(size=(nb, k)).astype(np.float32)
    got = ell_bucket_spmm_pallas(
        jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w), block_rows=8,
        interpret=True,
    )
    expect = (x[idx] * w[..., None]).sum(axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_full_ell_matvec_matches_xla(rng):
    n, e = 80, 600
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.normal(size=(n, 1, 8)).astype(np.float32)
    ef, er = build_ell_gcn(s, r, n)
    expect = _ell_matvec(ef, jnp.asarray(x))
    got = ell_matvec_pallas(ef, jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)
