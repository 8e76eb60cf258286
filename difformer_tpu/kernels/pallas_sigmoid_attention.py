"""Pallas TPU kernel for DIFFormer-a sigmoid attention (flash-style).

Replaces the O(N²)-memory reference path (``node classification/
difformer.py:45-56``) with a tiled MXU kernel: for each (head, q-block) the
key/value blocks stream through VMEM; the [BQ, BK] sigmoid score tile lives
only in registers/VMEM; a fused [BQ, D+1] accumulator persists across the
k-grid in f32 scratch. No max-shift is needed (sigmoid is bounded), so the
kernel is a pure two-matmul pipeline per tile — both matmuls hit the MXU.

The op is VPU-bound on TPU (the N² sigmoid evaluations dominate; the two
matmuls are ~10% of the roofline), so the kernel keeps per-pair VPU work to
the sigmoid alone:

  * the denominator rides the MXU as a **ones-column appended to V** — for
    D < 128 the extra lane is free (the MXU pads lanes to 128 anyway), and
    because the column is appended *before* zero-padding keys to the block
    multiple, padded keys drop out of the denominator exactly, with no mask
    multiply;
  * the [BQ, BK] mask multiply only exists when the caller passes a real
    key mask (padded batches);
  * scores cross the second matmul in the *input* dtype (bf16 inputs →
    full-rate bf16×bf16 MXU with f32 accumulation).

Forward and backward are both Pallas. The backward rematerializes the
score tiles (standard flash recipe — 2 extra score evaluations instead of an
[N, L, H] HBM intermediate) in two kernels that mirror the forward tiling:

  * a **dq kernel** over grid (H, q-block, k-block) accumulating
    ``dq_i += dlogit_ij @ k_j`` in f32 VMEM scratch across the inner k-grid;
  * a **dk/dv kernel** over grid (H, k-block, q-block) accumulating
    ``dk_j += dlogitᵀ_ij @ q_i`` and ``dv_j += sᵀ_ij @ dnum_i`` across the
    inner q-grid,

with ``dnum = g / den`` and ``dden = -Σ_d(g·out)/den`` precomputed once in
XLA (O(N·H·D), negligible). The earlier XLA ``lax.scan``-of-einsums backward
(`ops.sigmoid_attention._blocked_bwd`) triggered a pathological >280 s XLA
compile on the TPU backend at N≥8192 (BENCH_NOTES.md round-2 entry); the
Pallas backward sidesteps the XLA scan entirely and is also what removes the
[N, block, H] f32 HBM intermediates. Gradient math identical to the blocked
path: s = σ(q·k), ds = dnum·vᵀ + dden, dlogit = ds·s·(1−s).

``key_mask`` contract: the backward computes dlogit from the already-masked
score (m·σ·(1−m·σ)), identical to m·σ·(1−σ) only for binary masks. Both the
blocked XLA backward and these kernels share that convention — key_mask must
be 0/1 (it marks padded keys, the only use in this codebase).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _out_struct(shape, dtype, *like):
    """ShapeDtypeStruct carrying the union of the operands' varying-mesh-axes
    (vma) — required when the kernel runs inside ``jax.shard_map`` with
    check_vma (the ring-sharded attention); a plain struct elsewhere."""
    try:
        vma = frozenset().union(*(jax.typeof(x).vma for x in like))
        if vma:
            return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except Exception:
        pass
    return jax.ShapeDtypeStruct(shape, dtype)


def _fwd_kernel(*refs, apply_mask, d_out, normalize=True):
    if apply_mask:
        q_ref, k_ref, v_ref, m_ref, o_ref, den_ref, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, den_ref, acc_scr = refs
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [BQ, M]
    k = k_ref[0]                       # [BK, M]
    v = v_ref[0]                       # [BK, D+1] (last col: ones ⇒ denom)
    s = jax.nn.sigmoid(
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                   # [BQ, BK]
    if apply_mask:
        s = s * m_ref[0][None, :]
    # scores cross the MXU in the *input* dtype (bf16 inputs → bf16×bf16
    # matmul at full MXU rate, f32 accumulate — the native mode); f32
    # inputs keep an exact f32 product.
    acc_scr[...] += jnp.dot(s.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        den = acc_scr[:, d_out:d_out + 1]
        if normalize:
            o_ref[0] = (acc_scr[:, :d_out] / den).astype(o_ref.dtype)
        else:
            o_ref[0] = acc_scr[:, :d_out].astype(o_ref.dtype)
        den_ref[0] = den.astype(den_ref.dtype)


def _sigmoid_attention_pallas_fwd_impl(qs, ks, vs, key_mask, *, block_q=512,
                                       block_k=512, interpret=False,
                                       normalize=True):
    """qs [N,H,M], ks [L,H,M], vs [L,H,D], key_mask [L] or None →
    (out [N,H,D], den [N,H]). ``normalize=False`` returns the raw
    numerator Σσ(qk)·v in f32 instead of num/den — the accumulable form
    for the ring-sharded attention."""
    N, H, M = qs.shape
    L, _, D = vs.shape
    apply_mask = key_mask is not None

    bq = min(block_q, _round_up(N, 8))
    bk = min(block_k, _round_up(L, 8))
    Np, Lp = _round_up(N, bq), _round_up(L, bk)

    qT = jnp.moveaxis(qs, 1, 0)          # [H, N, M]
    kT = jnp.moveaxis(ks, 1, 0)
    # ones-column BEFORE zero-padding keys: padded rows contribute exactly 0
    # to both numerator (v rows are 0) and denominator (ones column is 0).
    vT = jnp.concatenate(
        [jnp.moveaxis(vs, 1, 0), jnp.ones((H, L, 1), vs.dtype)], axis=-1)
    if Np != N:
        qT = jnp.pad(qT, ((0, 0), (0, Np - N), (0, 0)))
    if Lp != L:
        kT = jnp.pad(kT, ((0, 0), (0, Lp - L), (0, 0)))
        vT = jnp.pad(vT, ((0, 0), (0, Lp - L), (0, 0)))

    grid = (H, Np // bq, Lp // bk)
    in_specs = [
        pl.BlockSpec((1, bq, M), lambda h, i, j: (h, i, 0)),
        pl.BlockSpec((1, bk, M), lambda h, i, j: (h, j, 0)),
        pl.BlockSpec((1, bk, D + 1), lambda h, i, j: (h, j, 0)),
    ]
    operands = [qT, kT, vT]
    if apply_mask:
        mask2 = key_mask.astype(jnp.float32).reshape(1, L)
        if Lp != L:
            mask2 = jnp.pad(mask2, ((0, 0), (0, Lp - L)))
        in_specs.append(pl.BlockSpec((1, bk), lambda h, i, j: (0, j)))
        operands.append(mask2)

    out, den = pl.pallas_call(
        functools.partial(_fwd_kernel, apply_mask=apply_mask, d_out=D,
                          normalize=normalize),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, j: (h, i, 0)),
        ],
        out_shape=[
            _out_struct((H, Np, D),
                        qs.dtype if normalize else jnp.float32, qs, ks, vs),
            _out_struct((H, Np, 1), jnp.float32, qs, ks, vs),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D + 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    out = jnp.moveaxis(out[:, :N, :], 0, 1)          # [N, H, D]
    den = jnp.moveaxis(den[:, :N, 0], 0, 1)          # [N, H]
    return out, den


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(*refs, apply_mask):
    """Grid (H, i, j): dq_i = Σ_j dlogit_ij @ k_j, accumulated in f32 scratch
    across the inner j-grid. Zero-padded keys contribute zero rows of k, so
    their (nonzero) dlogit columns vanish in the product — no mask needed for
    padding, only for a caller-provided key_mask."""
    if apply_mask:
        q_ref, k_ref, v_ref, dn_ref, dd_ref, m_ref, dq_ref, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, dn_ref, dd_ref, dq_ref, acc_scr = refs
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [BQ, M]
    k = k_ref[0]                       # [BK, M]
    v = v_ref[0]                       # [BK, D]
    dn = dn_ref[0]                     # [BQ, D] f32
    dd = dd_ref[0]                     # [BQ, 1] f32
    s = jax.nn.sigmoid(
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                   # [BQ, BK]
    if apply_mask:
        s = s * m_ref[0][None, :]
    # ds = dnum·vᵀ + dden; matmuls ride the MXU in the input dtype
    # (bf16×bf16 → f32 accumulate at full rate; f32 stays exact).
    ds = jax.lax.dot_general(
        dn.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dd
    dl = ds * s * (1.0 - s)             # [BQ, BK] f32
    acc_scr[...] += jnp.dot(dl.astype(k.dtype), k,
                            preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, apply_mask):
    """Grid (H, j, i): dk_j = Σ_i dlogitᵀ_ij @ q_i and dv_j = Σ_i sᵀ_ij @
    dnum_i, accumulated across the inner i-grid. Zero-padded queries carry
    zero dnum/dden rows, so their dlogit/dnum rows vanish in both products;
    padded *key* rows of dk/dv hold garbage and are sliced off outside."""
    if apply_mask:
        (q_ref, k_ref, v_ref, dn_ref, dd_ref, m_ref,
         dk_ref, dv_ref, kacc_scr, vacc_scr) = refs
    else:
        (q_ref, k_ref, v_ref, dn_ref, dd_ref,
         dk_ref, dv_ref, kacc_scr, vacc_scr) = refs
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        kacc_scr[...] = jnp.zeros_like(kacc_scr)
        vacc_scr[...] = jnp.zeros_like(vacc_scr)

    q = q_ref[0]                       # [BQ, M]
    k = k_ref[0]                       # [BK, M]
    v = v_ref[0]                       # [BK, D]
    dn = dn_ref[0]                     # [BQ, D] f32
    dd = dd_ref[0]                     # [BQ, 1] f32
    s = jax.nn.sigmoid(
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                   # [BQ, BK]
    if apply_mask:
        s = s * m_ref[0][None, :]
    ds = jax.lax.dot_general(
        dn.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dd
    dl = ds * s * (1.0 - s)             # [BQ, BK] f32
    # contract the BQ dim of both operands (transposed matmuls, MXU-native)
    kacc_scr[...] += jax.lax.dot_general(
        dl.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vacc_scr[...] += jax.lax.dot_general(
        s.astype(v.dtype), dn.astype(v.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = kacc_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = vacc_scr[...].astype(dv_ref.dtype)


def _sigmoid_attention_pallas_bwd_impl(qs, ks, vs, key_mask, out, den, g, *,
                                       block_q=512, block_k=512,
                                       interpret=False):
    """Pallas backward of the NORMALIZED op: derive (dnum, dden) from the
    output cotangent, then run the shared kernels.

    Inputs: residuals (qs [N,H,M], ks [L,H,M], vs [L,H,D], key_mask [L]|None,
    out [N,H,D], den [N,H] f32) and cotangent g [N,H,D].
    Returns (dq, dk, dv) in the input dtypes.
    """
    g32 = g.astype(jnp.float32)
    out32 = out.astype(jnp.float32)
    dnum = g32 / den[..., None]                         # [N, H, D]
    dden = -jnp.sum(g32 * out32, axis=-1) / den         # [N, H]
    return _pallas_bwd_kernels(qs, ks, vs, key_mask, dnum, dden,
                               block_q=block_q, block_k=block_k,
                               interpret=interpret)


def _pallas_bwd_kernels(qs, ks, vs, key_mask, dnum, dden, *,
                        block_q=512, block_k=512, interpret=False):
    """Shared Pallas backward: recompute score tiles, no [N, L] HBM
    intermediates. ``dnum`` [N,H,D] f32 and ``dden`` [N,H] f32 are the
    cotangents of the raw numerator Σσ(qk)·v and denominator Σσ(qk)
    (for the normalized op they are derived from g/out/den; for the
    unnormalized op they ARE the output cotangents)."""
    N, H, M = qs.shape
    L, _, D = vs.shape
    apply_mask = key_mask is not None

    bq = min(block_q, _round_up(N, 8))
    bk = min(block_k, _round_up(L, 8))
    Np, Lp = _round_up(N, bq), _round_up(L, bk)

    qT = jnp.moveaxis(qs, 1, 0)                         # [H, N, M]
    kT = jnp.moveaxis(ks, 1, 0)
    vT = jnp.moveaxis(vs, 1, 0)
    dnT = jnp.moveaxis(dnum, 1, 0)                      # [H, N, D]
    ddT = jnp.moveaxis(dden, 1, 0)[..., None]           # [H, N, 1]
    if Np != N:
        pad = ((0, 0), (0, Np - N), (0, 0))
        qT, dnT, ddT = (jnp.pad(a, pad) for a in (qT, dnT, ddT))
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        kT, vT = (jnp.pad(a, pad) for a in (kT, vT))

    mask_ops = []
    if apply_mask:
        mask2 = key_mask.astype(jnp.float32).reshape(1, L)
        if Lp != L:
            mask2 = jnp.pad(mask2, ((0, 0), (0, Lp - L)))
        mask_ops = [mask2]

    dq_specs = [
        pl.BlockSpec((1, bq, M), lambda h, i, j: (h, i, 0)),
        pl.BlockSpec((1, bk, M), lambda h, i, j: (h, j, 0)),
        pl.BlockSpec((1, bk, D), lambda h, i, j: (h, j, 0)),
        pl.BlockSpec((1, bq, D), lambda h, i, j: (h, i, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, i, j: (h, i, 0)),
    ]
    if apply_mask:
        dq_specs.append(pl.BlockSpec((1, bk), lambda h, i, j: (0, j)))
    dqT = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, apply_mask=apply_mask),
        grid=(H, Np // bq, Lp // bk),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, bq, M), lambda h, i, j: (h, i, 0)),
        out_shape=_out_struct((H, Np, M), qs.dtype, qs, ks, vs, dnum),
        scratch_shapes=[pltpu.VMEM((bq, M), jnp.float32)],
        interpret=interpret,
    )(qT, kT, vT, dnT, ddT, *mask_ops)

    dkv_specs = [
        pl.BlockSpec((1, bq, M), lambda h, j, i: (h, i, 0)),
        pl.BlockSpec((1, bk, M), lambda h, j, i: (h, j, 0)),
        pl.BlockSpec((1, bk, D), lambda h, j, i: (h, j, 0)),
        pl.BlockSpec((1, bq, D), lambda h, j, i: (h, i, 0)),
        pl.BlockSpec((1, bq, 1), lambda h, j, i: (h, i, 0)),
    ]
    if apply_mask:
        dkv_specs.append(pl.BlockSpec((1, bk), lambda h, j, i: (0, j)))
    dkT, dvT = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, apply_mask=apply_mask),
        grid=(H, Lp // bk, Np // bq),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, bk, M), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, j, i: (h, j, 0)),
        ],
        out_shape=[
            _out_struct((H, Lp, M), ks.dtype, qs, ks, vs, dnum),
            _out_struct((H, Lp, D), vs.dtype, qs, ks, vs, dnum),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, M), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        interpret=interpret,
    )(qT, kT, vT, dnT, ddT, *mask_ops)

    dq = jnp.moveaxis(dqT[:, :N], 0, 1)
    dk = jnp.moveaxis(dkT[:, :L], 0, 1)
    dv = jnp.moveaxis(dvT[:, :L], 0, 1)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sigmoid_attention_pallas(qs, ks, vs, key_mask, interpret, xla_bwd):
    out, _ = _sigmoid_attention_pallas_fwd_impl(qs, ks, vs, key_mask,
                                                interpret=interpret)
    return out


def _fwd(qs, ks, vs, key_mask, interpret, xla_bwd):
    out, den = _sigmoid_attention_pallas_fwd_impl(qs, ks, vs, key_mask,
                                                  interpret=interpret)
    return out, (qs, ks, vs, key_mask, out, den)


def _bwd(interpret, xla_bwd, residuals, g):
    qs, ks, vs, key_mask, out, den = residuals
    if xla_bwd:
        # Legacy blockwise-XLA backward (kept for A/B benchmarking; its
        # lax.scan-of-einsums form is compile-pathological on the TPU
        # backend at N>=8192 — see BENCH_NOTES.md).
        from difformer_tpu.ops.sigmoid_attention import _blocked_bwd

        km = (jnp.ones((ks.shape[0],), jnp.float32) if key_mask is None
              else key_mask)
        L = ks.shape[0]
        block = min(1024, _round_up(L, 128))
        Lp = _round_up(L, block)
        if Lp != L:
            pad = [(0, Lp - L)]
            ks_p = jnp.pad(ks, pad + [(0, 0), (0, 0)])
            vs_p = jnp.pad(vs, pad + [(0, 0), (0, 0)])
            km_p = jnp.pad(km, (0, Lp - L))
        else:
            ks_p, vs_p, km_p = ks, vs, km
        dq, dk, dv, _ = _blocked_bwd(block, (qs, ks_p, vs_p, km_p, out, den),
                                     g)
        dq, dk, dv = dq, dk[:L], dv[:L]
    else:
        dq, dk, dv = _sigmoid_attention_pallas_bwd_impl(
            qs, ks, vs, key_mask, out, den, g, interpret=interpret)
    d_mask = None if key_mask is None else jnp.zeros_like(key_mask)
    return dq, dk, dv, d_mask


_sigmoid_attention_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sigmoid_attention_pallas_unnorm(qs, ks, vs, key_mask, interpret):
    num, den = _sigmoid_attention_pallas_fwd_impl(
        qs, ks, vs, key_mask, interpret=interpret, normalize=False)
    return num, den


def _unnorm_fwd(qs, ks, vs, key_mask, interpret):
    num, den = _sigmoid_attention_pallas_fwd_impl(
        qs, ks, vs, key_mask, interpret=interpret, normalize=False)
    return (num, den), (qs, ks, vs, key_mask)


def _unnorm_bwd(interpret, residuals, g):
    qs, ks, vs, key_mask = residuals
    g_num, g_den = g
    dq, dk, dv = _pallas_bwd_kernels(
        qs, ks, vs, key_mask,
        g_num.astype(jnp.float32), g_den.astype(jnp.float32),
        interpret=interpret)
    d_mask = None if key_mask is None else jnp.zeros_like(key_mask)
    return dq, dk, dv, d_mask


_sigmoid_attention_pallas_unnorm.defvjp(_unnorm_fwd, _unnorm_bwd)


def sigmoid_attention_pallas_unnormalized(qs, ks, vs, key_mask=None, *,
                                          interpret=False):
    """Raw (numerator, denominator) form: returns
    ``(Σ_l σ(q·k_l)·v_l [N,H,D] f32, Σ_l σ(q·k_l) [N,H] f32)`` without the
    final division — the partial sums are ACCUMULABLE across key shards,
    which is exactly what the ring-sharded attention
    (``parallel.sharded_ops.sigmoid_attention_sharded``) needs per ring
    step. Same Pallas fwd/bwd kernels as the normalized op (the backward
    takes (dnum, dden) directly instead of deriving them from g/out/den),
    so the ring path inherits the round-3 compile-time fix."""
    if key_mask is not None:
        key_mask = key_mask.astype(jnp.float32)
    return _sigmoid_attention_pallas_unnorm(qs, ks, vs, key_mask, interpret)


def sigmoid_attention_pallas(qs, ks, vs, key_mask=None, *, interpret=False,
                             xla_bwd=False):
    """Public entry: [N,H,M] × [L,H,M] × [L,H,D] (+ optional key mask [L])
    → [N,H,D]. Pass ``key_mask=None`` (not an all-ones array) when every key
    is real — the kernel then skips the N² mask multiply entirely.
    ``xla_bwd=True`` selects the legacy blockwise-XLA backward (A/B only)."""
    if key_mask is not None:
        key_mask = key_mask.astype(jnp.float32)
    return _sigmoid_attention_pallas(qs, ks, vs, key_mask, interpret, xla_bwd)
