"""Degree-bucketed ELL sparse format — the scatter-free SpMM path.

XLA lowers ``segment_sum`` to scatter-add (read-modify-write over HBM),
which serializes on TPU. This module reformulates the GCN conv as pure
gathers + dense reductions, which vectorize cleanly:

  1. Host-side, nodes are grouped into **degree buckets** (power-of-two
     neighbor counts). Each bucket stores a dense ``[nodes, k]`` neighbor
     index matrix and matching normalized weights (zero on padding) — the
     classic ELLPACK layout, bounded to ≤2× padding waste per bucket.
  2. On device, each bucket computes ``(x[nbr] * w).sum(axis=1)`` — a gather
     followed by a dense weighted reduction; bucket outputs are concatenated
     and inverse-permuted back to node order (another gather). No scatter
     anywhere in the forward pass.
  3. The backward pass needs the transpose operator; a second ELL built on
     the reverse direction makes it scatter-free too (custom VJP).

This replaces the CUDA SpMM the reference delegates to torch_sparse
(``node classification/difformer.py:75-77``) with a layout chosen for the
TPU memory system. Normalization weights are treated as data (the reference
never differentiates through edge weights).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flax import struct


@struct.dataclass
class EllGraph:
    """Stacked degree-bucketed neighbor lists (one direction)."""

    nbr_idx: Tuple[Any, ...]     # per bucket: int32 [nb, k] neighbor (source)
    weight: Tuple[Any, ...]      # per bucket: f32 [nb, k] (0 on padding)
    inv_perm: Any                # int32 [N]: node -> row in concat'd outputs
    num_nodes: int = struct.field(pytree_node=False, default=0)

    @property
    def bucket_sizes(self):
        return tuple(b.shape[1] for b in self.nbr_idx)


def _gcn_values(senders, receivers, num_nodes, edge_weight):
    """Reference-parity normalized edge values (difformer.py:66-74)."""
    deg = np.zeros(num_nodes, np.float64)
    np.add.at(deg, receivers, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.sqrt(1.0 / deg)
    w = np.ones(len(senders)) if edge_weight is None else np.asarray(edge_weight)
    val = w * inv[receivers] * inv[senders]
    return np.nan_to_num(val, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)


def _adaptive_ks(counts, *, min_bucket=8, max_buckets=6):
    """Degree-quantile bucket widths (round 4).

    The original geometric ladder (8, 32, 128, … — factor 4) pays up to 4×
    slot padding per bucket; on Poisson-degree graphs (mean ≈ 32, the
    uniform headline) that executed ~10M gather slots for 4.2M edges
    (~26% average fill in the k=128 bucket). Quantile-placed widths bound
    the waste by the quantile spacing instead: ≤ max_buckets widths at the
    degree distribution's quantiles, rounded up to multiples of 8
    (lane-friendly), last width covering the max degree. Bucket count
    stays small (compile time scales with the number of unrolled gather
    kernels)."""
    pos = counts[counts > 0]
    if pos.size == 0:
        return [min_bucket]
    # quantize widths to multiples of 8 (lane-friendly) — unless a caller
    # asks for narrower buckets, in which case min_bucket is the quantum
    # (the BSR residual passes min_bucket=8 since the round-4 on-chip A/B:
    # a 4-quantum costs +10% conv time for no slot savings; the <8 branch
    # stays for callers that want sub-8 quanta on tiny/sparse tails)
    mult = 8 if min_bucket >= 8 else max(min_bucket, 1)
    qs = np.linspace(0.0, 1.0, max_buckets + 1)[1:]
    ks = {max(min_bucket, int(np.quantile(pos, q))) for q in qs}
    ks = sorted({-(-k // mult) * mult for k in ks})
    max_deg = int(pos.max())
    if ks[-1] < max_deg:
        ks[-1] = -(-max_deg // mult) * mult
    # densify: bound per-row padding waste at 2x. A quantile ladder alone
    # stretches its top rung to the max degree, which on heavy-tailed
    # degree distributions at ogbn-proteins density (p99 ≈ 5x median, max
    # ≈ 150x) pads O(10%) of rows to the max width — measured ~8x slot
    # blow-up (296M slots for 35M edges) and an HBM OOM (round 5). With
    # geometric midpoints no adjacent widths differ by more than 2x, so
    # slots ≤ 2 x edges for every distribution; the extra bucket count is
    # logarithmic in the degree spread.
    dense = [ks[0]]
    for k in ks[1:]:
        while k > 2 * dense[-1]:
            dense.append(-(-(2 * dense[-1]) // mult) * mult)
        dense.append(k)
    return sorted(set(dense))


def _build_direction(point_to, owner, values, num_nodes, *, min_bucket=8):
    """ELL for: out[owner] = Σ values * x[point_to], grouped by owner."""
    from difformer_tpu import native

    if native.available() and point_to.shape[0] > 0:
        order, indptr = native.sort_edges_by_receiver(
            owner.astype(np.int32), num_nodes
        )
    else:
        order = np.argsort(owner, kind="stable")
        counts0 = np.zeros(num_nodes + 1, np.int64)
        np.add.at(counts0, owner + 1, 1)
        indptr = np.cumsum(counts0)
    point_s = point_to[order].astype(np.int32)
    val_s = values[order].astype(np.float32)
    if point_s.shape[0] == 0:  # edgeless graph
        point_s = np.zeros(1, np.int32)
        val_s = np.zeros(1, np.float32)
    counts = np.diff(indptr)

    ks = _adaptive_ks(counts, min_bucket=min_bucket)
    bucket_of = np.searchsorted(np.asarray(ks), np.maximum(counts, 1))
    nbr_idx, weights, node_lists = [], [], []
    e_total = max(len(point_s), 1)
    for bi, kb in enumerate(ks):
        nodes = np.where(bucket_of == bi)[0]
        node_lists.append(nodes)
        if nodes.shape[0] == 0:
            nbr_idx.append(jnp.zeros((0, kb), jnp.int32))
            weights.append(jnp.zeros((0, kb), jnp.float32))
            continue
        if native.available():
            idx, w = native.ell_fill(nodes, kb, indptr, point_s, val_s)
        else:
            starts = indptr[nodes]
            lens = counts[nodes]
            cols = np.arange(kb)[None, :]
            mask = cols < lens[:, None]
            pos = np.minimum(starts[:, None] + cols, e_total - 1)
            idx = np.where(mask, point_s[pos], 0).astype(np.int32)
            w = np.where(mask, val_s[pos], 0.0).astype(np.float32)
        # sort each row's neighbors by index: ascending addresses within a
        # row give the gather engine what locality the graph has to offer
        order2 = np.argsort(idx, axis=1, kind="stable")
        idx = np.take_along_axis(idx, order2, axis=1)
        w = np.take_along_axis(w, order2, axis=1)
        nbr_idx.append(jnp.asarray(idx))
        weights.append(jnp.asarray(w))

    concat_order = np.concatenate(node_lists) if node_lists else np.zeros(0)
    inv_perm = np.empty(num_nodes, np.int64)
    inv_perm[concat_order.astype(np.int64)] = np.arange(num_nodes)
    return EllGraph(
        nbr_idx=tuple(nbr_idx),
        weight=tuple(weights),
        inv_perm=jnp.asarray(inv_perm, jnp.int32),
        num_nodes=num_nodes,
    )


def build_ell_gcn(senders, receivers, num_nodes, edge_weight=None):
    """Build forward (receiver-owned) and reverse (sender-owned) ELL graphs
    with reference-normalized GCN weights. Returns (ell_fwd, ell_rev)."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    val = _gcn_values(senders, receivers, num_nodes, edge_weight)
    ell_fwd = _build_direction(senders, receivers, val, num_nodes)
    ell_rev = _build_direction(receivers, senders, val, num_nodes)
    return ell_fwd, ell_rev


# peak bytes the gathered [slots, f_chunk] intermediate may occupy; wide
# trailing dims (e.g. H=8 heads -> F=512) otherwise materialize multi-GB
# per-slot tensors and blow HBM (observed: 23 GB at E=4.2M, H=8)
_GATHER_BUDGET_BYTES = 1 << 30


def _ell_matvec(ell: EllGraph, x):
    """out[n] = Σ_k w[n,k] · x[idx[n,k]] — gathers and dense sums only.

    Buckets whose gathered [rows, k, F] intermediate would exceed
    ``_GATHER_BUDGET_BYTES`` are accumulated over k-CHUNKS inside a
    ``lax.scan`` (footprint rows × kc × F, every slot still gathered
    exactly once). An earlier design chunked the FEATURE dim instead,
    re-gathering every slot once per chunk — at ogbn-proteins edge
    density (50M slots × F=64 → 7 chunks) that multiplied the per-row
    base cost 7× and read 17 ns/slot against the 3.3 ns calibrated floor
    (round-5 measurement); k-chunking removes the re-gathers."""
    trailing = x.shape[1:]
    F = int(np.prod(trailing)) if trailing else 1
    x2 = x.reshape(x.shape[0], F)
    itemsize = x.dtype.itemsize

    def bucket_sum(idx, w, xc):
        nb, k = idx.shape
        g = jnp.take(xc, idx.reshape(-1), axis=0).reshape(nb, k, xc.shape[1])
        return jnp.sum(g * w[..., None].astype(xc.dtype), axis=1)

    outs = []
    for idx, w in zip(ell.nbr_idx, ell.weight):
        nb, k = idx.shape
        if nb == 0:
            outs.append(jnp.zeros((0, F), x2.dtype))
            continue
        if nb * k * F * itemsize <= _GATHER_BUDGET_BYTES:
            outs.append(bucket_sum(idx, w, x2))
            continue
        kc = int(_GATHER_BUDGET_BYTES // max(1, nb * F * itemsize))
        kc = min(max(8, kc // 8 * 8), k)
        nkc = -(-k // kc)
        pad = nkc * kc - k
        # padded slots gather row 0 with weight 0 (≤ kc−1 per row)
        idx3 = jnp.moveaxis(
            jnp.pad(idx, ((0, 0), (0, pad))).reshape(nb, nkc, kc), 1, 0)
        w3 = jnp.moveaxis(
            jnp.pad(w, ((0, 0), (0, pad))).reshape(nb, nkc, kc), 1, 0)
        out_b, _ = jax.lax.scan(
            lambda acc, iw: (acc + bucket_sum(iw[0], iw[1], x2), None),
            jnp.zeros((nb, F), x2.dtype), (idx3, w3))
        outs.append(out_b)
    out_sorted = jnp.concatenate(outs, axis=0)
    out = jnp.take(out_sorted, ell.inv_perm, axis=0)
    return out.reshape((x.shape[0],) + trailing)


@jax.custom_vjp
def ell_spmm(ell_fwd: EllGraph, ell_rev: EllGraph, x):
    """Â @ x via ELL gathers; backward uses the reverse-direction ELL so the
    whole train step stays scatter-free."""
    return _ell_matvec(ell_fwd, x)


def _spmm_fwd(ell_fwd, ell_rev, x):
    return _ell_matvec(ell_fwd, x), (ell_fwd, ell_rev)


def _spmm_bwd(res, g):
    ell_fwd, ell_rev = res
    dx = _ell_matvec(ell_rev, g)
    zero = lambda ell: jax.tree_util.tree_map(jnp.zeros_like, ell)
    return zero(ell_fwd), zero(ell_rev), dx


ell_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def gcn_conv_ell(x, ell_fwd, ell_rev):
    """Drop-in for ``ops.graph_ops.gcn_conv`` given prebuilt scatter-free
    operators — degree-bucketed :class:`EllGraph` pairs or the block-sparse
    hybrid (``ops/bsr.py``). x: [N, ...] (heads/channels in trailing dims)."""
    if hasattr(ell_fwd, "res_point"):
        from difformer_tpu.ops.bsr import bsr_spmm_sharded

        return bsr_spmm_sharded(ell_fwd, ell_rev, x)
    if hasattr(ell_fwd, "row_tiles"):
        from difformer_tpu.ops.bsr import bsr_bucketed_spmm

        return bsr_bucketed_spmm(ell_fwd, ell_rev, x)
    if hasattr(ell_fwd, "blocks"):
        from difformer_tpu.ops.bsr import bsr_spmm

        return bsr_spmm(ell_fwd, ell_rev, x)
    return ell_spmm(ell_fwd, ell_rev, x)
