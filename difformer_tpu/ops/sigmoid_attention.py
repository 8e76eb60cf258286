"""DIFFormer-a sigmoid pairwise attention (O(N²)), TPU-blockwise.

Reference semantics (``node classification/difformer.py:45-56``):
``att = sigmoid(q·k) / row_sum(sigmoid(q·k))``, ``out = att @ v`` — the
reference materializes the full ``[N, L, H]`` tensor in HBM, which OOMs
beyond ~20k nodes. Here the same math runs flash-style: key blocks stream
through VMEM-sized tiles, accumulating the numerator ``Σ_l σ(q·k_l)·v_l`` and
denominator ``Σ_l σ(q·k_l)`` without ever materializing N×L. A custom VJP
recomputes the block scores in the backward pass (rematerialization: trade
FLOPs for HBM, the standard TPU recipe). No max-shift is needed for
stability — sigmoid is bounded in (0, 1).

``sigmoid_attention_dense`` keeps the explicit-matrix form for parity tests
and for the ``output_attn`` visualization path (``difformer.py:55``).

A Pallas MXU kernel for the same contraction lives in
``difformer_tpu.kernels.pallas_sigmoid_attention`` and is dispatched to on
TPU for large N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sigmoid_attention_dense(qs, ks, vs, *, key_mask=None, output_attn=False):
    """Explicit [N, L, H] attention. qs: [N,H,M], ks: [L,H,M], vs: [L,H,D]."""
    scores = jax.nn.sigmoid(jnp.einsum("nhm,lhm->nlh", qs, ks))
    if key_mask is not None:
        scores = scores * key_mask.astype(scores.dtype)[None, :, None]
    denom = jnp.sum(scores, axis=1, keepdims=True)  # [N, 1, H]
    attn = scores / denom
    out = jnp.einsum("nlh,lhd->nhd", attn, vs)
    if output_attn:
        return out, attn
    return out


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sigmoid_attention_blocked(qs, ks, vs, key_mask, block_size):
    out, _ = _blocked_fwd_impl(qs, ks, vs, key_mask, block_size)
    return out


def _blocked_fwd_impl(qs, ks, vs, key_mask, block_size):
    """Scan over key blocks; carries [N,H,D] numerator + [N,H] denominator."""
    L = ks.shape[0]
    nb = L // block_size
    ks_b = ks.reshape(nb, block_size, *ks.shape[1:])
    vs_b = vs.reshape(nb, block_size, *vs.shape[1:])
    mask_b = key_mask.reshape(nb, block_size)

    def body(carry, blk):
        num, den = carry
        k_b, v_b, m_b = blk
        s = jax.nn.sigmoid(jnp.einsum("nhm,lhm->nlh", qs, k_b))
        s = s * m_b.astype(s.dtype)[None, :, None]
        num = num + jnp.einsum("nlh,lhd->nhd", s, v_b)
        den = den + jnp.sum(s, axis=1)
        return (num, den), None

    init = (
        jnp.zeros((qs.shape[0], qs.shape[1], vs.shape[2]), dtype=jnp.float32),
        jnp.zeros((qs.shape[0], qs.shape[1]), dtype=jnp.float32),
    )
    (num, den), _ = jax.lax.scan(body, init, (ks_b, vs_b, mask_b))
    out = (num / den[..., None]).astype(qs.dtype)
    return out, (num, den)


def _blocked_fwd(qs, ks, vs, key_mask, block_size):
    out, (num, den) = _blocked_fwd_impl(qs, ks, vs, key_mask, block_size)
    return out, (qs, ks, vs, key_mask, out, den)


def _blocked_bwd(block_size, residuals, g):
    qs, ks, vs, key_mask, out, den = residuals
    g = g.astype(jnp.float32)
    out32 = out.astype(jnp.float32)
    dnum = g / den[..., None]                                   # [N, H, D]
    dden = -jnp.sum(g * out32, axis=-1) / den                   # [N, H]

    L = ks.shape[0]
    nb = L // block_size
    ks_b = ks.reshape(nb, block_size, *ks.shape[1:])
    vs_b = vs.reshape(nb, block_size, *vs.shape[1:])
    mask_b = key_mask.reshape(nb, block_size)

    def body(dq_acc, blk):
        k_b, v_b, m_b = blk
        logits = jnp.einsum("nhm,lhm->nlh", qs, k_b)
        s = jax.nn.sigmoid(logits) * m_b.astype(logits.dtype)[None, :, None]
        # dL/ds then through the sigmoid
        ds = jnp.einsum("nhd,lhd->nlh", dnum, v_b) + dden[:, None, :]
        dlogit = ds * s * (1.0 - s)
        dq_acc = dq_acc + jnp.einsum("nlh,lhm->nhm", dlogit, k_b)
        dk_b = jnp.einsum("nlh,nhm->lhm", dlogit, qs.astype(jnp.float32))
        dv_b = jnp.einsum("nlh,nhd->lhd", s, dnum)
        return dq_acc, (dk_b, dv_b)

    dq0 = jnp.zeros(qs.shape, dtype=jnp.float32)
    dq, (dk_b, dv_b) = jax.lax.scan(body, dq0, (ks_b, vs_b, mask_b))
    dk = dk_b.reshape(ks.shape).astype(ks.dtype)
    dv = dv_b.reshape(vs.shape).astype(vs.dtype)
    return dq.astype(qs.dtype), dk, dv, jnp.zeros_like(key_mask)


_sigmoid_attention_blocked.defvjp(_blocked_fwd, _blocked_bwd)


def _auto_dispatch(N, L, H, *, on_tpu, explicit_block):
    """Implementation choice for :func:`sigmoid_attention`.

    Crossover measured on-chip, fwd+bwd, bf16, H=1 (BENCH_NOTES r3
    "sigmoid dispatch crossover" + model-level bench rows): below ~8192
    every impl sits near the ~3 ms dispatch floor and XLA's fused dense
    chain is fastest (model-level: dense 8.2 ms vs flash 9.6 ms at N=4096)
    with trivial memory (≤268 MB scores); at 8192 the Pallas kernels win
    16% op-level, and from ~16k dense needs multi-GB [N, L, H] score
    tensors (OOM at 32768) while Pallas stays O(N·D) and scales to
    98.7 Gpairs/s at 65536. Pallas triggers when EITHER side is large:
    the crossover only justifies dense for small-square shapes — a
    rectangular call with one big side would materialize a multi-GB
    [N, L, H] tensor on the dense path.

    The H=1-measured dense envelope is additionally gated on total score
    elements (N·L·H ≤ 64M = 256 MB f32 — the N=L=8192 H=1 point), because
    the dense score tensor plus its backward cotangent scales linearly
    with heads; and an explicitly passed block_size opts out of dense (the
    caller asked for bounded memory). Non-TPU backends use the blocked
    XLA path (the Pallas backward kernels are TPU-Mosaic only; the legacy
    blocked backward compiles fine there).
    """
    if not on_tpu:
        return "blocked"
    if L >= 8192 or N >= 8192:
        return "pallas"
    if N * L * H > 8192 * 8192 or explicit_block:
        return "pallas"
    return "dense"


def sigmoid_attention(qs, ks, vs, *, key_mask=None, block_size=None,
                      use_pallas=None):
    """Blockwise sigmoid attention. qs: [N,H,M], ks: [L,H,M], vs: [L,H,D].

    key_mask: optional float/bool [L] marking real keys (for padded batches).
    Backward paths (blocked and Pallas) compute the sigmoid derivative from
    the *masked* score, so key_mask must be binary 0/1 — fractional mask
    values would get a slightly wrong gradient (m·σ·(1−m·σ) instead of
    m·σ·(1−σ)). Keys are padded internally to a block multiple. ``use_pallas``
    forces the Pallas TPU kernel on/off (default: auto — on for TPU backends
    with large N). An explicitly passed ``block_size`` opts out of the dense
    auto-dispatch (the caller is asking for bounded memory).
    """
    L = ks.shape[0]
    N, H = qs.shape[0], qs.shape[1]
    explicit_block = block_size is not None
    if block_size is None:
        block_size = 1024
    if use_pallas is None:
        impl = _auto_dispatch(N, L, H,
                              on_tpu=jax.default_backend() == "tpu",
                              explicit_block=explicit_block)
        if impl == "dense":
            return sigmoid_attention_dense(qs, ks, vs, key_mask=key_mask)
        use_pallas = impl == "pallas"
    if use_pallas:
        from difformer_tpu.kernels.pallas_sigmoid_attention import (
            sigmoid_attention_pallas,
        )

        # None (not all-ones) lets the kernel skip the N² mask multiply
        return sigmoid_attention_pallas(qs, ks, vs, key_mask)

    if key_mask is None:
        key_mask = jnp.ones((L,), dtype=jnp.float32)
    else:
        key_mask = key_mask.astype(jnp.float32)

    block = min(block_size, _round_up(L, 128))
    Lp = _round_up(L, block)
    if Lp != L:
        pad = [(0, Lp - L)]
        ks = jnp.pad(ks, pad + [(0, 0)] * (ks.ndim - 1))
        vs = jnp.pad(vs, pad + [(0, 0)] * (vs.ndim - 1))
        key_mask = jnp.pad(key_mask, pad)
    return _sigmoid_attention_blocked(qs, ks, vs, key_mask, block)


# ---------------------------------------------------------------------------
# Padded-batch (DIFFormer_v2) variants
# ---------------------------------------------------------------------------

def sigmoid_attention_padded(q_pad, k_pad, v_pad, node_mask, *, eps=1e-9):
    """Within-graph pairwise sigmoid attention over a padded batch.

    q/k/v: [B, M, H, D]; node_mask: bool [B, M]. This implements the
    *intended* DIFFormer_v2 sigmoid semantics — each node attends to the
    other nodes of its own graph. NOTE: the reference's einsum
    (``physical particle/difformer-v2.py:124``, "abcd,ebcd->aebc") instead
    attends padded slot m of graph a to slot m of *every* graph e — a
    cross-graph quirk we deviate from by default (documented decision per
    SURVEY.md §7.3); ``sigmoid_attention_padded_crossgraph`` reproduces the
    quirk bit-for-bit for parity testing.
    """
    m = node_mask.astype(q_pad.dtype)
    scores = jax.nn.sigmoid(jnp.einsum("bmhd,bnhd->bmnh", q_pad, k_pad))
    scores = scores * m[:, None, :, None]
    denom = jnp.sum(scores, axis=2, keepdims=True) + eps
    attn = scores / denom
    out = jnp.einsum("bmnh,bnhd->bmhd", attn, v_pad)
    return jnp.where(node_mask[..., None, None], out, 0.0)


def sigmoid_attention_padded_crossgraph(q_pad, k_pad, v_pad, node_mask,
                                        *, eps=1e-9):
    """Bit-parity replica of the reference v2 'sigmoid' kernel
    (``physical particle/difformer-v2.py:113-135``): slot m of graph a
    attends to slot m of every graph e (including padding zeros, whose
    sigmoid is 0.5 — reproduced for parity)."""
    scores = jax.nn.sigmoid(jnp.einsum("amhd,emhd->aemh", q_pad, k_pad))
    denom = jnp.sum(scores, axis=1, keepdims=True) + eps    # [B, 1, M, H]
    attn = scores / denom
    return jnp.einsum("aemh,emhd->amhd", attn, v_pad)
