"""Pallas TPU kernel for DIFFormer-a sigmoid attention (flash-style).

Replaces the O(N²)-memory reference path (``node classification/
difformer.py:45-56``) with a tiled MXU kernel: for each (head, q-block) the
key/value blocks stream through VMEM; the [BQ, BK] sigmoid score tile lives
only in registers/VMEM; numerator [BQ, D] and denominator [BQ, 1]
accumulate in f32 scratch that persists across the k-grid. No max-shift is
needed (sigmoid is bounded), so the kernel is a pure two-matmul pipeline per
tile — both matmuls hit the MXU.

Forward is Pallas; the backward pass reuses the blockwise XLA recompute path
(`ops.sigmoid_attention._blocked_bwd`) via custom_vjp, sharing residuals
(out, den).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, den_ref, num_scr, den_scr):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        num_scr[...] = jnp.zeros_like(num_scr)
        den_scr[...] = jnp.zeros_like(den_scr)

    q = q_ref[0]                       # [BQ, M]
    k = k_ref[0]                       # [BK, M]
    v = v_ref[0]                       # [BK, D]
    s = jax.nn.sigmoid(
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                   # [BQ, BK]
    s = s * m_ref[0][None, :]
    num_scr[...] += jnp.dot(s, v.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    den_scr[...] += jnp.sum(s, axis=1, keepdims=True)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (num_scr[...] / den_scr[...]).astype(o_ref.dtype)
        den_ref[0] = den_scr[...].astype(den_ref.dtype)


def _sigmoid_attention_pallas_fwd_impl(qs, ks, vs, key_mask, *, block_q=512,
                                       block_k=512, interpret=False):
    """qs [N,H,M], ks [L,H,M], vs [L,H,D], key_mask [L] → out [N,H,D],
    den [N,H]."""
    N, H, M = qs.shape
    L, _, D = vs.shape

    bq = min(block_q, _round_up(N, 8))
    bk = min(block_k, _round_up(L, 8))
    Np, Lp = _round_up(N, bq), _round_up(L, bk)

    qT = jnp.moveaxis(qs, 1, 0)          # [H, N, M]
    kT = jnp.moveaxis(ks, 1, 0)
    vT = jnp.moveaxis(vs, 1, 0)
    if Np != N:
        qT = jnp.pad(qT, ((0, 0), (0, Np - N), (0, 0)))
    if Lp != L:
        kT = jnp.pad(kT, ((0, 0), (0, Lp - L), (0, 0)))
        vT = jnp.pad(vT, ((0, 0), (0, Lp - L), (0, 0)))
        key_mask = jnp.pad(key_mask, (0, Lp - L))
    mask2 = key_mask.astype(jnp.float32).reshape(1, Lp)

    grid = (H, Np // bq, Lp // bk)
    out, den = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, M), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, M), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk), lambda h, i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, j: (h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Np, D), qs.dtype),
            jax.ShapeDtypeStruct((H, Np, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qT, kT, vT, mask2)

    out = jnp.moveaxis(out[:, :N, :], 0, 1)          # [N, H, D]
    den = jnp.moveaxis(den[:, :N, 0], 0, 1)          # [N, H]
    return out, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sigmoid_attention_pallas(qs, ks, vs, key_mask, interpret):
    out, _ = _sigmoid_attention_pallas_fwd_impl(qs, ks, vs, key_mask,
                                                interpret=interpret)
    return out


def _fwd(qs, ks, vs, key_mask, interpret):
    out, den = _sigmoid_attention_pallas_fwd_impl(qs, ks, vs, key_mask,
                                                  interpret=interpret)
    return out, (qs, ks, vs, key_mask, out, den)


def _bwd(interpret, residuals, g):
    from difformer_tpu.ops.sigmoid_attention import _blocked_bwd

    qs, ks, vs, key_mask, out, den = residuals
    L = ks.shape[0]
    block = min(1024, _round_up(L, 128))
    Lp = _round_up(L, block)
    if Lp != L:
        pad = [(0, Lp - L)]
        ks_p = jnp.pad(ks, pad + [(0, 0), (0, 0)])
        vs_p = jnp.pad(vs, pad + [(0, 0), (0, 0)])
        km_p = jnp.pad(key_mask, (0, Lp - L))
    else:
        ks_p, vs_p, km_p = ks, vs, key_mask
    dq, dk, dv, dm = _blocked_bwd(
        block, (qs, ks_p, vs_p, km_p, out, den), g
    )
    return dq, dk[:L], dv[:L], jnp.zeros_like(key_mask)


_sigmoid_attention_pallas.defvjp(_fwd, _bwd)


def sigmoid_attention_pallas(qs, ks, vs, key_mask, *, interpret=False):
    """Public entry: [N,H,M] × [L,H,M] × [L,H,D] (+ key mask [L]) → [N,H,D]."""
    return _sigmoid_attention_pallas(qs, ks, vs,
                                     key_mask.astype(jnp.float32), interpret)
