"""Pallas TPU kernel for the degree-bucketed ELL SpMM.

One bucket = dense ``[nb, k]`` neighbor indices + weights. The XLA path
(`ops.ell._ell_matvec`) expresses this as a big gather; this kernel instead
drives the row fetches explicitly: indices are scalar-prefetched into SMEM,
each grid step owns a block of output rows, and a software pipeline keeps a
window of row DMAs from HBM in flight while the VPU accumulates
``w[r, j] * x[idx[r, j]]`` into a VMEM accumulator. This trades XLA's
generic gather for latency-hidden explicit DMA — the win depends on the
memory system; both paths stay available and numerically identical.

Weights are applied in f32; x rows may be f32 or bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(a, m):
    return ((a + m - 1) // m) * m


def _ell_kernel(idx_ref,            # scalar-prefetch: [nb_pad * k] int32
                x_hbm,              # [N, D] in ANY/HBM
                w_ref,              # [BR, k] f32 (VMEM block)
                o_ref,              # [BR, D] output block
                scratch,            # VMEM [WINDOW, D]
                acc,                # VMEM [BR, D] f32
                sems,               # DMA sems [WINDOW]
                *, BR, K, WINDOW):
    i = pl.program_id(0)
    base = i * BR * K

    def start(j, slot):
        gid = idx_ref[base + j]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(gid, 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).start()

    acc[...] = jnp.zeros_like(acc)

    for j in range(min(WINDOW, BR * K)):
        start(j, j)

    def body(j, _):
        slot = jax.lax.rem(j, WINDOW)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(idx_ref[base + j], 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).wait()
        row = jax.lax.div(j, K)
        col = jax.lax.rem(j, K)
        contrib = scratch[slot, :].astype(jnp.float32) * w_ref[row, col]
        acc[pl.ds(row, 1), :] += contrib[None, :]

        @pl.when(j + WINDOW < BR * K)
        def _():
            start(j + WINDOW, slot)

        return 0

    jax.lax.fori_loop(0, BR * K, body, 0)
    o_ref[...] = acc[...].astype(o_ref.dtype)


def ell_bucket_spmm_pallas(x, nbr_idx, weight, *, block_rows=8, window=16,
                           interpret=False):
    """out[r] = Σ_j weight[r, j] · x[nbr_idx[r, j]]  for one ELL bucket.

    x: [N, D] (2-D; callers flatten trailing dims), nbr_idx: [nb, k] int32,
    weight: [nb, k]. Returns [nb, D] in x.dtype.
    """
    nb, k = nbr_idx.shape
    N, D = x.shape
    BR = block_rows
    nb_pad = _round_up(max(nb, 1), BR)
    if nb_pad != nb:
        nbr_idx = jnp.pad(nbr_idx, ((0, nb_pad - nb), (0, 0)))
        weight = jnp.pad(weight, ((0, nb_pad - nb), (0, 0)))

    idx_flat = nbr_idx.reshape(-1).astype(jnp.int32)
    w = weight.astype(jnp.float32)
    window = min(window, BR * k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x stays in HBM
            # weights are read one scalar at a time with dynamic (row, col) —
            # that must live in SMEM (Mosaic cannot prove dynamic lane
            # alignment for VMEM scalar loads)
            pl.BlockSpec((BR, k), lambda i, idx: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BR, D), lambda i, idx: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((window, D), x.dtype),
            pltpu.VMEM((BR, D), jnp.float32),
            pltpu.SemaphoreType.DMA((window,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ell_kernel, BR=BR, K=k, WINDOW=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad, D), x.dtype),
        interpret=interpret,
    )(idx_flat, x, w)
    return out[:nb]


def ell_matvec_pallas(ell, x, *, interpret=False):
    """Full ELL SpMM via the Pallas bucket kernel (drop-in for
    ``ops.ell._ell_matvec`` on 2-D-flattenable inputs)."""
    trailing = x.shape[1:]
    x2 = x.reshape(x.shape[0], -1)
    outs = []
    for idx, w in zip(ell.nbr_idx, ell.weight):
        if idx.shape[0] == 0:
            outs.append(jnp.zeros((0, x2.shape[1]), x2.dtype))
            continue
        outs.append(
            ell_bucket_spmm_pallas(x2, idx, w, interpret=interpret)
        )
    out_sorted = jnp.concatenate(outs, axis=0)
    out = jnp.take(out_sorted, ell.inv_perm, axis=0)
    return out.reshape((x.shape[0],) + trailing)
