"""DIFFormer-s linear global attention ("simple" kernel).

This is the O(N·d²) decomposition that makes full-graph attention feasible:
the N×L attention matrix ``(1 + q·k') / (N + q·Σk')`` is never materialized —
only the rank-d aggregates ``Σ_l k_l ⊗ v_l`` ([H, M, D]) and ``Σ_l k_l``
([H, M]) are computed, then each query is rescaled locally. Reference
semantics: ``node classification/difformer.py:10-43``.

Parity quirks reproduced deliberately (SURVEY.md §7.3):
  * q and k are each normalized by the **global Frobenius norm of the whole
    tensor** (``torch.norm(qs, p=2)`` with no dim, ``difformer.py:20-21``) —
    not per-row or per-head.
  * the numerator adds the raw ``Σ_l v_l`` term and the denominator adds
    ``N`` (the *query* count, ``difformer.py:27-29,38``) — the uniform
    all-pairs diffusion component.

Distributed form: both aggregates are plain sums over key rows, so a
node-sharded graph needs exactly two small ``psum``s per layer ([H,M] and
[H,M,D], invariant to N) — see ``difformer_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _frobenius_normalize(t, axis_name=None):
    """t / ||t||_F over the *entire* (global, if sharded) tensor.

    Under ``shard_map`` the reference's whole-tensor norm becomes a single
    scalar ``psum`` over the mesh axis — the sharded math stays bit-identical
    to the single-device math.
    """
    sumsq = jnp.sum(jnp.square(t.astype(jnp.float32)))
    if axis_name is not None:
        sumsq = jax.lax.psum(sumsq, axis_name)
    norm = jnp.sqrt(sumsq)
    return (t.astype(jnp.float32) / norm).astype(t.dtype)


def simple_attention_aggregates(ks, vs, key_mask=None):
    """The two global aggregates. ks: [L,H,M] (pre-normalized), vs: [L,H,D].

    Returns (kv [H,M,D], k_sum [H,M], v_sum [H,D], count []).
    With a key_mask, padded rows are excluded (needed for static-shape
    mini-batching); reference has no mask (always dense).
    """
    if key_mask is not None:
        m = key_mask.astype(ks.dtype)[:, None, None]
        ks = ks * m
        vs = vs * m
        count = jnp.sum(key_mask.astype(jnp.float32))
    else:
        count = jnp.float32(ks.shape[0])
    kv = jnp.einsum("lhm,lhd->hmd", ks, vs)
    k_sum = jnp.sum(ks, axis=0)
    v_sum = jnp.sum(vs, axis=0)
    return kv, k_sum, v_sum, count


def simple_attention_head_mean_factored(qs, ks, x, w, b, *, key_mask=None,
                                        num_queries=None, axis_name=None):
    """Head-mean DIFFormer-s attention with the value projection FACTORED
    through the key aggregates (round 5).

    Equivalent to ``simple_attention(qs, ks, (x @ w + b), head_mean=True)``
    up to float reassociation, but the [N, H, D] value tensor never
    exists:

        kv[h,m,d] = Σ_l k[l,h,m]·(x[l]·W_h + b_h)[d]
                  = (Σ_l k[l,h,m]·x[l,f])·W[f,h,d] + k_sum[h,m]·b[h,d]
        Σv[h,d]   = (Σ_l x[l])·W_h + count·b_h

    so the only large contractions read k and x directly ([H·M, N] @
    [N, F]) — same FLOPs as the kv einsum, two fewer [N, H, D] HBM passes
    in the forward and no [N, H, D] value cotangent in the backward. The
    Frobenius scalars fold onto the small aggregates as in
    ``simple_attention(head_mean=True)``.

    qs/ks: [N, H, M]; x: [N, F]; w: [F, H, D]; b: [H, D] or None.
    Returns [N, D] (the head-averaged output).
    """
    if key_mask is not None:
        m = key_mask.astype(qs.dtype)[:, None, None]
        ks = ks * m
        if qs.shape[0] == ks.shape[0]:
            qs = qs * m
        x = x * key_mask.astype(x.dtype)[:, None]
        count = jnp.sum(key_mask.astype(jnp.float32))
    else:
        count = jnp.float32(ks.shape[0])
    sumsq_q = jnp.sum(jnp.square(qs.astype(jnp.float32)))
    sumsq_k = jnp.sum(jnp.square(ks.astype(jnp.float32)))
    kx = jnp.einsum("lhm,lf->hmf", ks, x)             # [H, M, F]
    k_sum = jnp.sum(ks, axis=0)                       # [H, M]
    x_sum = jnp.sum(x, axis=0)                        # [F]
    if axis_name is not None:
        sumsq_q = jax.lax.psum(sumsq_q, axis_name)
        sumsq_k = jax.lax.psum(sumsq_k, axis_name)
        kx = jax.lax.psum(kx, axis_name)
        k_sum = jax.lax.psum(k_sum, axis_name)
        x_sum = jax.lax.psum(x_sum, axis_name)
        # count feeds BOTH the +N denominator default and v_sum's bias
        # term (count·b) — it must be the global key count
        count = jax.lax.psum(count, axis_name)
    if num_queries is None:
        num_queries = count if axis_name is not None else qs.shape[0]
    inv_scale = jax.lax.rsqrt(sumsq_q) * jax.lax.rsqrt(sumsq_k)

    w = w.astype(qs.dtype)
    kv = jnp.einsum("hmf,fhd->hmd", kx, w)
    v_sum = jnp.einsum("f,fhd->hd", x_sum.astype(qs.dtype), w)
    if b is not None:
        b = b.astype(qs.dtype)
        kv = kv + k_sum[..., None] * b[:, None, :]
        v_sum = v_sum + count.astype(qs.dtype) * b
    kv = (kv.astype(jnp.float32) * inv_scale).astype(qs.dtype)
    k_sum = (k_sum.astype(jnp.float32) * inv_scale).astype(qs.dtype)

    h = qs.shape[1]
    denominator = jnp.einsum("nhm,hm->nh", qs, k_sum) + jnp.asarray(
        num_queries, dtype=qs.dtype)
    inv_den = 1.0 / denominator
    q_scaled = qs * inv_den[..., None]
    return (jnp.einsum("nhm,hmd->nd", q_scaled, kv)
            + inv_den @ v_sum) / h


def simple_attention(qs, ks, vs, *, key_mask=None, num_queries=None,
                     output_attn=False, axis_name=None, head_mean=False):
    """DIFFormer-s attention. qs: [N,H,M], ks: [L,H,M], vs: [L,H,D] → [N,H,D].

    ``num_queries`` overrides the ``+N`` denominator term (the reference uses
    the query count, ``difformer.py:38``).

    ``head_mean=True`` returns the head-averaged output [N, D] directly
    (the model's ``final_output.mean(dim=1)``, difformer.py:130) WITHOUT
    materializing the [N, H, D] per-head output: each head's division by
    its own denominator is kept exactly (q is pre-scaled by 1/den per
    head), then the h and m axes contract in ONE [N, H·M] @ [H·M, D]
    matmul. Saves two full [N, H, D] HBM passes per layer at H=8 (the
    round-4 clustered-H=8 roofline gap); differs from mean-after-divide
    only by float reassociation (equivalence-tested).

    ``axis_name``: when running node-sharded under ``shard_map``, the name of
    the mesh axis nodes are sharded over. The global attention then costs
    exactly three small collectives per call — a scalar psum for each
    Frobenius norm and psums of the [H,M,D]+[H,M] aggregates — invariant to
    N; this is the TPU-native sequence-parallel analog of the O(N) kernel
    (SURVEY.md §2.6 SP row).

    With ``key_mask`` (padded graphs), masked rows are zeroed *before* the
    Frobenius norms so padding cannot perturb the normalization — the result
    is bit-equivalent to running unpadded.
    """
    if key_mask is not None:
        m = key_mask.astype(qs.dtype)[:, None, None]
        ks = ks * m
        if qs.shape[0] == ks.shape[0]:  # queries==keys in all model paths
            qs = qs * m
    if head_mean and not output_attn:
        # scalar-fold form: q/k are never materialized in normalized form
        # — the 1/(||q||_F·||k||_F) scalar rides on the SMALL aggregates
        # ([H,M,D], [H,M]) instead of two extra [N,H,M] HBM passes. Same
        # math as normalize-then-contract up to float reassociation.
        sumsq_q = jnp.sum(jnp.square(qs.astype(jnp.float32)))
        sumsq_k = jnp.sum(jnp.square(ks.astype(jnp.float32)))
        if axis_name is not None:
            sumsq_q = jax.lax.psum(sumsq_q, axis_name)
            sumsq_k = jax.lax.psum(sumsq_k, axis_name)
        inv_scale = jax.lax.rsqrt(sumsq_q) * jax.lax.rsqrt(sumsq_k)

        kv, k_sum, v_sum, count = simple_attention_aggregates(ks, vs,
                                                              key_mask)
        if axis_name is not None:
            kv = jax.lax.psum(kv, axis_name)
            k_sum = jax.lax.psum(k_sum, axis_name)
            v_sum = jax.lax.psum(v_sum, axis_name)
            if num_queries is None:
                num_queries = jax.lax.psum(count, axis_name)
        if num_queries is None:
            num_queries = qs.shape[0]
        kv = (kv.astype(jnp.float32) * inv_scale).astype(qs.dtype)
        k_sum = (k_sum.astype(jnp.float32) * inv_scale).astype(qs.dtype)

        h = qs.shape[1]
        denominator = jnp.einsum("nhm,hm->nh", qs, k_sum) + jnp.asarray(
            num_queries, dtype=qs.dtype)
        inv_den = 1.0 / denominator                       # [N, H]
        q_scaled = qs * inv_den[..., None]                # fused into the dot
        return (jnp.einsum("nhm,hmd->nd", q_scaled, kv)
                + inv_den @ v_sum) / h
    qs = _frobenius_normalize(qs, axis_name)
    ks = _frobenius_normalize(ks, axis_name)

    kv, k_sum, v_sum, count = simple_attention_aggregates(ks, vs, key_mask)
    if axis_name is not None:
        kv = jax.lax.psum(kv, axis_name)
        k_sum = jax.lax.psum(k_sum, axis_name)
        v_sum = jax.lax.psum(v_sum, axis_name)
        if num_queries is None:
            # reference adds the *query* count; queries == keys in all tracks
            num_queries = jax.lax.psum(count, axis_name)
    if num_queries is None:
        num_queries = qs.shape[0]

    denominator = jnp.einsum("nhm,hm->nh", qs, k_sum) + jnp.asarray(
        num_queries, dtype=qs.dtype
    )
    numerator = jnp.einsum("nhm,hmd->nhd", qs, kv) + v_sum[None, :, :]
    out = numerator / denominator[..., None]

    if output_attn:
        # Visualization path (reference ``get_attentions``, difformer.py:43):
        # explicit [N, L, H] — only for small graphs. Deviation: the
        # reference divides by the un-transposed [N, H, 1] normalizer, which
        # is shape-invalid for H>1 (raises — unless L happens to equal H,
        # where torch broadcasting silently misaligns); we use the intended
        # [N, 1, H] broadcast, identical at H=1 (tests/test_reference_exec
        # .py::test_v1_get_attentions_vs_reference).
        attn = jnp.einsum("nhm,lhm->nlh", qs, ks) / denominator[:, None, :]
        return out, attn
    return out


def simple_attention_padded(q_pad, k_pad, v_pad, node_mask, n_nodes):
    """Per-graph linear attention over a padded batch (DIFFormer_v2 'simple').

    q_pad/k_pad/v_pad: [B, M, H, D]; node_mask: bool [B, M]; n_nodes: [B].
    Matches ``physical particle/difformer-v2.py:80-111``: q/k are normalized
    by the Frobenius norm over the whole (flat) batch, then per-graph
    aggregates replace the global ones; the denominator adds each graph's own
    node count. Padded slots contribute zero (they are zero in *_pad).
    Returns [B, M, H, D] (padded positions hold garbage/zeros; mask out).

    The padded-dense layout is the TPU-idiomatic choice for batches of small
    graphs: every einsum below is a batched matmul on the MXU, where the
    reference used scatter_add_ + pad round-trips per layer.
    """
    mask = node_mask[..., None, None].astype(q_pad.dtype)
    q_pad = q_pad * mask
    k_pad = k_pad * mask
    v_pad = v_pad * mask
    # Scalar-folded Frobenius normalization (round 5, mirrors the node
    # track): 1/(‖q‖·‖k‖) rides the small per-graph aggregates instead of
    # materializing two normalized [B, M, H, D] copies (+ their AD
    # cotangents) — float reassociation only vs the reference order.
    inv_q = 1.0 / jnp.sqrt(jnp.sum(jnp.square(q_pad.astype(jnp.float32))))
    inv_k = 1.0 / jnp.sqrt(jnp.sum(jnp.square(k_pad.astype(jnp.float32))))
    scale = (inv_q * inv_k).astype(q_pad.dtype)

    # Per-graph aggregates.
    kv = jnp.einsum("bmhk,bmhd->bhkd", k_pad, v_pad)         # [B, H, K, D]
    k_sum = jnp.sum(k_pad, axis=1)                            # [B, H, K]
    v_sum = jnp.sum(v_pad, axis=1)                            # [B, H, D]

    numerator = jnp.einsum("bmhk,bhkd->bmhd", q_pad, kv * scale)
    numerator = numerator + v_sum[:, None, :, :]
    denominator = jnp.einsum("bmhk,bhk->bmh", q_pad, k_sum * scale)
    denominator = denominator + n_nodes.astype(q_pad.dtype)[:, None, None]
    # Padded slots/graphs would be 0/0 → NaN. The denominator must be made
    # safe BEFORE the divide (not just masked after): jnp.where keeps the
    # NaN branch in the gradient otherwise.
    mask3 = node_mask[..., None]
    denominator = jnp.where(mask3, denominator, 1.0)
    out = numerator / denominator[..., None]
    return jnp.where(mask3[..., None], out, 0.0)
