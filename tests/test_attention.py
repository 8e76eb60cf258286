"""Attention kernel tests: blockwise == dense, grads match, padded-batch
variants match per-graph loops, parity with the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.ops.linear_attention import (
    simple_attention,
    simple_attention_padded,
)
from difformer_tpu.ops.sigmoid_attention import (
    sigmoid_attention,
    sigmoid_attention_dense,
    sigmoid_attention_padded,
    sigmoid_attention_padded_crossgraph,
)


def numpy_simple_reference(q, k, v):
    """Transcription of node classification/difformer.py:18-39."""
    q = q / np.linalg.norm(q)
    k = k / np.linalg.norm(k)
    N = q.shape[0]
    kv = np.einsum("lhm,lhd->hmd", k, v)
    num = np.einsum("nhm,hmd->nhd", q, kv) + v.sum(0)[None]
    den = np.einsum("nhm,hm->nh", q, k.sum(0)) + N
    return num / den[..., None]


def numpy_sigmoid_reference(q, k, v):
    """Transcription of node classification/difformer.py:45-56."""
    s = 1.0 / (1.0 + np.exp(-np.einsum("nhm,lhm->nlh", q, k)))
    den = s.sum(1, keepdims=True)
    return np.einsum("nlh,lhd->nhd", s / den, v)


@pytest.mark.parametrize("heads", [1, 3])
def test_simple_attention_matches_reference(rng, heads):
    n, m, d = 40, 6, 5
    q = rng.normal(size=(n, heads, m)).astype(np.float32)
    k = rng.normal(size=(n, heads, m)).astype(np.float32)
    v = rng.normal(size=(n, heads, d)).astype(np.float32)
    got = simple_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(
        got, numpy_simple_reference(q, k, v), rtol=1e-3, atol=1e-4
    )


def test_simple_attention_output_attn_rows(rng):
    n, m, d = 12, 4, 4
    q = rng.normal(size=(n, 1, m)).astype(np.float32)
    k = rng.normal(size=(n, 1, m)).astype(np.float32)
    v = rng.normal(size=(n, 1, d)).astype(np.float32)
    out, attn = simple_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), output_attn=True
    )
    assert attn.shape == (n, n, 1)
    # attention rows applied to V (plus uniform term) reproduce the output
    recon = jnp.einsum("nlh,lhd->nhd", attn, jnp.asarray(v))
    # out = recon + (Σv)/den; check difference is rank-0 over n per head
    diff = np.asarray(out - recon)[:, 0, :]
    # each row of diff is (Σv)/den_n -> parallel to Σv
    sv = v.sum(0)[0]
    cos = diff @ sv / (np.linalg.norm(diff, axis=1) * np.linalg.norm(sv) + 1e-12)
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_sigmoid_dense_matches_reference(rng):
    n, m, d, h = 25, 5, 6, 2
    q = rng.normal(size=(n, h, m)).astype(np.float32)
    k = rng.normal(size=(n, h, m)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    got = sigmoid_attention_dense(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(
        got, numpy_sigmoid_reference(q, k, v), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("n,l", [(64, 64), (100, 130), (7, 300)])
def test_sigmoid_blockwise_matches_dense(rng, n, l):
    m, d, h = 5, 6, 2
    q = rng.normal(size=(n, h, m)).astype(np.float32)
    k = rng.normal(size=(l, h, m)).astype(np.float32)
    v = rng.normal(size=(l, h, d)).astype(np.float32)
    dense = sigmoid_attention_dense(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    blocked = sigmoid_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), block_size=64,
        use_pallas=False,
    )
    np.testing.assert_allclose(blocked, dense, rtol=1e-3, atol=1e-4)


def test_sigmoid_blockwise_grads_match_dense(rng):
    n, m, d, h = 33, 4, 5, 1
    q = rng.normal(size=(n, h, m)).astype(np.float32)
    k = rng.normal(size=(n, h, m)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    t = rng.normal(size=(n, h, d)).astype(np.float32)

    def loss_dense(q, k, v):
        return jnp.sum((sigmoid_attention_dense(q, k, v) - t) ** 2)

    def loss_blocked(q, k, v):
        return jnp.sum(
            (sigmoid_attention(q, k, v, block_size=16, use_pallas=False) - t)
            ** 2
        )

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    gb = jax.grad(loss_blocked, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(gd, gb):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_sigmoid_key_mask_equals_slicing(rng):
    n, l, m, d, h = 20, 48, 4, 4, 1
    q = rng.normal(size=(n, h, m)).astype(np.float32)
    k = rng.normal(size=(l, h, m)).astype(np.float32)
    v = rng.normal(size=(l, h, d)).astype(np.float32)
    keep = 30
    mask = np.zeros(l, bool)
    mask[:keep] = True
    got = sigmoid_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        key_mask=jnp.asarray(mask), block_size=16, use_pallas=False,
    )
    expect = sigmoid_attention_dense(
        jnp.asarray(q), jnp.asarray(k[:keep]), jnp.asarray(v[:keep])
    )
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Padded-batch (v2) variants
# ---------------------------------------------------------------------------

def _pad_batch(rng, n_nodes, h, dim):
    B, M = len(n_nodes), max(n_nodes)
    q = np.zeros((B, M, h, dim), np.float32)
    for b, n in enumerate(n_nodes):
        q[b, :n] = rng.normal(size=(n, h, dim))
    mask = np.zeros((B, M), bool)
    for b, n in enumerate(n_nodes):
        mask[b, :n] = True
    return q, mask


def test_simple_padded_matches_reference_semantics(rng):
    """Per-graph linear attention == reference v2 math
    (physical particle/difformer-v2.py:80-111): global frobenius
    normalization over the flat batch, per-graph aggregates, +n_g denom."""
    n_nodes = [5, 3, 7]
    h, dim = 2, 4
    q, mask = _pad_batch(rng, n_nodes, h, dim)
    k, _ = _pad_batch(rng, n_nodes, h, dim)
    v, _ = _pad_batch(rng, n_nodes, h, dim)

    got = simple_attention_padded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mask), jnp.asarray(n_nodes),
    )

    # reference math on flat tensors
    qf = np.concatenate([q[b, :n] for b, n in enumerate(n_nodes)])
    kf = np.concatenate([k[b, :n] for b, n in enumerate(n_nodes)])
    vf = np.concatenate([v[b, :n] for b, n in enumerate(n_nodes)])
    qf = qf / np.linalg.norm(qf)
    kf = kf / np.linalg.norm(kf)
    off = 0
    for b, n in enumerate(n_nodes):
        qg, kg, vg = qf[off:off + n], kf[off:off + n], vf[off:off + n]
        kv = np.einsum("lhm,lhd->hmd", kg, vg)
        num = np.einsum("nhm,hmd->nhd", qg, kv) + vg.sum(0)[None]
        den = np.einsum("nhm,hm->nh", qg, kg.sum(0)) + n
        expect = num / den[..., None]
        np.testing.assert_allclose(
            np.asarray(got)[b, :n], expect, rtol=1e-3, atol=1e-4
        )
        off += n


def test_sigmoid_padded_within_graph(rng):
    """Intended v2 sigmoid semantics: per-graph dense sigmoid attention."""
    n_nodes = [4, 6]
    h, dim = 1, 3
    q, mask = _pad_batch(rng, n_nodes, h, dim)
    k, _ = _pad_batch(rng, n_nodes, h, dim)
    v, _ = _pad_batch(rng, n_nodes, h, dim)
    got = sigmoid_attention_padded(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)
    )
    for b, n in enumerate(n_nodes):
        expect = numpy_sigmoid_reference(q[b, :n], k[b, :n], v[b, :n])
        np.testing.assert_allclose(
            np.asarray(got)[b, :n], expect, rtol=1e-4, atol=1e-4
        )


def test_sigmoid_crossgraph_quirk_replica(rng):
    """The quirk-compat path reproduces the reference einsum exactly
    (difformer-v2.py:124-135): slot m of graph a attends to slot m of every
    graph e."""
    B, M, h, dim = 3, 4, 1, 3
    q = rng.normal(size=(B, M, h, dim)).astype(np.float32)
    k = rng.normal(size=(B, M, h, dim)).astype(np.float32)
    v = rng.normal(size=(B, M, h, dim)).astype(np.float32)
    mask = np.ones((B, M), bool)
    got = sigmoid_attention_padded_crossgraph(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)
    )
    s = 1.0 / (1.0 + np.exp(-np.einsum("amhd,emhd->aemh", q, k)))
    den = s.sum(1, keepdims=True) + 1e-9
    expect = np.einsum("aemh,emhd->amhd", s / den, v)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_sigmoid_auto_dispatch_gates():
    """ADVICE r3: dense auto-dispatch must be gated on total score bytes
    (N·L·H), not N/L alone, and an explicit block_size opts out of dense."""
    from difformer_tpu.ops.sigmoid_attention import _auto_dispatch

    kw = dict(on_tpu=True, explicit_block=False)
    # small square, H=1: dense (measured fastest, trivial memory)
    assert _auto_dispatch(4096, 4096, 1, **kw) == "dense"
    # same N/L but H=8: 537 MB f32 scores — outside the measured envelope
    assert _auto_dispatch(4096, 4096, 8, **kw) == "pallas"
    # either side large: pallas regardless of H
    assert _auto_dispatch(8192, 4096, 1, **kw) == "pallas"
    assert _auto_dispatch(4096, 8192, 1, **kw) == "pallas"
    # explicit block_size = caller bounded memory: never dense
    assert _auto_dispatch(
        1024, 1024, 1, on_tpu=True, explicit_block=True) == "pallas"
    # non-TPU: blocked XLA path everywhere
    assert _auto_dispatch(65536, 65536, 8,
                          on_tpu=False, explicit_block=False) == "blocked"
