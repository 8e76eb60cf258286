"""Block-sparse (BSR) hybrid SpMM — the MXU path for clustered graphs.

Measured on TPU v5e (scripts/bench_gather_locality.py): row gathers cost
~3.7 ns/row + bytes/30 GB/s **regardless of index locality** — the per-edge
gather ELL path (ops/ell.py) is therefore a hard floor of ~8 ns/edge for
128 B rows. But adjacency *tiles* that hold enough edges can instead be
materialized as dense ``[T, T]`` blocks and multiplied on the MXU:

  * the ``x`` operand is fetched per *tile* (``T·D`` ≈ 32 KB) — a wide
    gather that streams at full HBM bandwidth instead of paying the
    per-row toll;
  * the block values stream sequentially;
  * the reduction is a batched matmul — pure MXU, no scatter.

Host preprocessing splits edges by tile occupancy: tiles with
``count ≥ min_edges`` (from the measured cost model) become dense blocks in
a **tile-level ELL** layout (``[Nt, Kb]`` block-columns per block-row, so
the forward pass is scatter-free); the long tail of sparse tiles stays on
the per-edge ELL path. On community-structured graphs (optionally after
:func:`difformer_tpu.data.transforms.locality_reorder`) most edges land in
dense blocks; on a uniform-random graph nothing qualifies and this degrades
gracefully to plain ELL.

Replaces torch_sparse CUDA SpMM (reference ``difformer.py:75-77``) like
ops/ell.py, but with a layout chosen for the MXU rather than the gather
engine. Backward uses a transpose-direction build (custom VJP), so the
whole train step stays scatter-free.
"""

from __future__ import annotations

import sys

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from difformer_tpu.ops.ell import (
    EllGraph,
    _build_direction,
    _ell_matvec,
    _gcn_values,
)

# measured gather cost per edge expressed as streaming-equivalent bytes:
# ~8 ns/edge at ~800 GB/s HBM  →  ~6.5 KB/edge (BENCH_NOTES.md cost model)
_EDGE_EQUIV_BYTES = 6500.0


def default_min_edges(tile: int, feat_bytes: int = 128,
                      block_elem_bytes: int = 4) -> int:
    """Edges a tile must hold before the dense-block path beats per-edge
    gathers: block bytes (A tile + x tile fetch) / gather-equivalent bytes.
    bf16 blocks (``block_elem_bytes=2``) stream half the bytes, so the
    threshold halves and more tiles qualify for the MXU path."""
    block_bytes = tile * tile * block_elem_bytes + tile * feat_bytes
    return max(8, int(block_bytes / _EDGE_EQUIV_BYTES) + 1)


@struct.dataclass
class BsrDirection:
    """One direction (owner ← point_to) of the hybrid operator."""

    blocks: Any                  # f32 [Nt, Kb, T, T]; zero on padding
    block_col: Any               # int32 [Nt, Kb] col-tile ids; 0 on padding
    residual: Optional[EllGraph]  # sparse-tile edges (per-edge ELL path)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    tile: int = struct.field(pytree_node=False, default=256)

    @property
    def n_blocks(self):
        return int(np.prod(self.block_col.shape))


def _dense_tiles(point_to, owner, values, num_rows, num_cols, *, tile,
                 min_edges, block_dtype=np.float32,
                 max_blocks_per_row=None, fill_ones=False):
    """Select tiles with ≥min_edges edges and materialize them as a
    tile-level ELL: returns ``(blocks [Ntr,Kb,T,T], block_col [Ntr,Kb],
    dense_edge_mask [E])``. Accumulation is always f32; ``block_dtype``
    converts on the host so the device transfer already streams the
    narrow type. ``fill_ones=True`` stores int8 EDGE COUNTS instead of
    values (the rank-1 scaled-count format, see :class:`BsrBuckets`);
    raises :class:`_Int8CountOverflow` if any (row, col) pair holds >127
    parallel edges.

    ``max_blocks_per_row`` caps Kb: a block-row keeps only its
    ``max_blocks_per_row`` densest tiles, the rest of its edges spill to
    the residual ELL. Without a cap, one hub row-tile referencing every
    column tile (power-law graphs after hub clustering) forces
    Kb ≈ Ntc for ALL rows and the padded [Ntr, Kb, T, T] array exceeds
    HBM (observed: 32 GB on a Pareto-α2 graph at tile=256)."""
    ntr = -(-num_rows // tile)
    ntc = -(-num_cols // tile)
    tr = owner // tile
    tc = point_to // tile
    key = tr.astype(np.int64) * ntc + tc
    nkeys = ntr * ntc
    if nkeys <= (1 << 26):
        # tile-key space is small: O(E) histogram beats np.unique's sort
        counts = np.bincount(key, minlength=nkeys)
        dense_edge = counts[key] >= min_edges
        dkeys = np.flatnonzero(counts >= min_edges).astype(np.int64)
        dcounts = counts[dkeys]
        slot_lookup = np.zeros(nkeys, np.int64)
        edge_key = key
    else:
        uniq, inv, counts = np.unique(key, return_inverse=True,
                                      return_counts=True)
        dense_mask_u = counts >= min_edges
        dense_edge = dense_mask_u[inv]
        dkeys = uniq[dense_mask_u]
        dcounts = counts[dense_mask_u]
        slot_lookup = np.zeros(uniq.size, np.int64)
        edge_key = inv

    dtr = (dkeys // ntc).astype(np.int64)
    if (max_blocks_per_row is not None and dkeys.size
            and np.bincount(dtr, minlength=ntr).max() > max_blocks_per_row):
        # keep the densest ``max_blocks_per_row`` tiles of each block-row
        order = np.lexsort((-dcounts, dtr))          # rows asc, count desc
        dtr_sorted = dtr[order]
        row_first = np.searchsorted(dtr_sorted, dtr_sorted)
        keep = (np.arange(order.size) - row_first) < max_blocks_per_row
        kept_keys = np.sort(dkeys[order[keep]])
        if nkeys <= (1 << 26):
            kmask = np.zeros(nkeys, bool)
            kmask[kept_keys] = True
            dense_edge = kmask[key]
            dkeys = kept_keys
        else:
            kmask = np.isin(uniq, kept_keys)
            dense_edge = kmask[inv]
            dense_mask_u = kmask
            dkeys = uniq[kmask]
        dtr = (dkeys // ntc).astype(np.int64)

    dtc = (dkeys % ntc).astype(np.int64)
    per_row = np.bincount(dtr, minlength=ntr)
    kb = int(per_row.max()) if dkeys.size else 0
    kb1 = max(kb, 1)
    out_dtype = np.int8 if fill_ones else block_dtype
    block_col = np.zeros((ntr, kb1), np.int32)
    if not dkeys.size:
        blocks = np.zeros((ntr, kb1, tile, tile), out_dtype)
        return blocks, block_col, dense_edge
    # slot of each dense tile within its block-row (dkeys sorted by tr)
    row_start = np.zeros(ntr + 1, np.int64)
    np.add.at(row_start, dtr + 1, 1)
    row_start = np.cumsum(row_start)
    slot = np.arange(dkeys.size) - row_start[dtr]
    block_col[dtr, slot] = dtc.astype(np.int32)
    # map each dense edge to its (block-row, slot) and fill values/counts
    if nkeys <= (1 << 26):
        slot_lookup[dkeys] = slot
    else:
        slot_lookup[dense_mask_u] = slot
    e = dense_edge
    flat = ((tr[e].astype(np.int64) * kb1 + slot_lookup[edge_key[e]]) * tile
            + owner[e] % tile) * tile + point_to[e] % tile
    blocks = _fill_blocks_flat(
        flat, None if fill_ones else values[e],
        ntr * kb1 * tile * tile, out_dtype,
    ).reshape(ntr, kb1, tile, tile)
    return blocks, block_col, dense_edge


def _build_bsr_direction(point_to, owner, values, num_nodes, *, tile,
                         min_edges, block_dtype=np.float32,
                         residual_kwargs=None, max_blocks_per_row=None):
    """out[owner] = Σ values · x[point_to], owner-tiled."""
    blocks, block_col, dense_edge = _dense_tiles(
        point_to, owner, values, num_nodes, num_nodes,
        tile=tile, min_edges=min_edges, block_dtype=block_dtype,
        max_blocks_per_row=max_blocks_per_row)

    # ---- residual part: per-edge ELL -------------------------------------
    r = ~dense_edge
    residual = None
    if r.any():
        residual = _build_direction(point_to[r], owner[r], values[r],
                                    num_nodes, **(residual_kwargs or {}))
    return BsrDirection(
        blocks=jnp.asarray(blocks),
        block_col=jnp.asarray(block_col),
        residual=residual,
        num_nodes=num_nodes,
        tile=tile,
    )


def build_bsr_gcn(senders, receivers, num_nodes, edge_weight=None, *,
                  tile=256, min_edges=None, verbose=False,
                  block_dtype=np.float32, residual_kwargs=None,
                  block_budget_bytes=1.5 * 2 ** 30):
    """Build forward/reverse hybrid operators with reference-parity GCN
    normalization (``difformer.py:66-74``). Returns ``(fwd, rev)`` for
    :func:`bsr_spmm`.

    ``block_dtype``: storage dtype of the dense tiles (np.float32 default;
    ``jnp.bfloat16`` halves the block stream — GCN weights are O(0.01-1)
    so bf16's 8-bit mantissa costs ~1e-2 relative error on the branch).
    ``residual_kwargs``: forwarded to the residual ELL build; defaults to
    degree-quantile adaptive widths with min_bucket=8 (on-chip A/B: the 4-quantum
    variant adds a bucket kernel without saving slots, +10% conv time) — the sparse tail
    is low-degree so padding waste, not compile time, dominates there
    (measured: 1.65M → 1.12M slots, 39.2 → 31.6 ms/step on the SBM
    bench graph).
    ``block_budget_bytes``: HBM cap per direction for the padded block
    array; translates to a per-block-row tile cap (hub row-tiles on
    power-law graphs otherwise inflate Kb to the full column-tile count,
    see :func:`_dense_tiles`)."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    if min_edges is None:
        min_edges = default_min_edges(
            tile, block_elem_bytes=np.dtype(block_dtype).itemsize)
    if residual_kwargs is None:
        residual_kwargs = dict(min_bucket=8)
    ntr = -(-num_nodes // tile)
    kb_cap = None
    if block_budget_bytes:
        per_slice = ntr * tile * tile * np.dtype(block_dtype).itemsize
        kb_cap = max(1, int(block_budget_bytes // per_slice))
    val = _gcn_values(senders, receivers, num_nodes, edge_weight)
    # block_dtype reaches the host build so the device transfer streams the
    # narrow type (bf16 halves the dominant host->device copy)
    fwd = _build_bsr_direction(senders, receivers, val, num_nodes,
                               tile=tile, min_edges=min_edges,
                               block_dtype=block_dtype,
                               residual_kwargs=residual_kwargs,
                               max_blocks_per_row=kb_cap)
    rev = _build_bsr_direction(receivers, senders, val, num_nodes,
                               tile=tile, min_edges=min_edges,
                               block_dtype=block_dtype,
                               residual_kwargs=residual_kwargs,
                               max_blocks_per_row=kb_cap)
    if verbose:
        for name, d in (("fwd", fwd), ("rev", rev)):
            res = d.residual
            res_e = (sum(int(i.shape[0] * i.shape[1]) for i in res.nbr_idx)
                     if res is not None else 0)
            print(f"# bsr[{name}]: tiles={d.block_col.shape} "
                  f"({d.blocks.nbytes / 1e6:.0f} MB), residual ELL slots "
                  f"≈{res_e}", file=sys.stderr, flush=True)
    return fwd, rev


def _bsr_matvec(d: BsrDirection, x):
    trailing = x.shape[1:]
    nt, t = d.block_col.shape[0], d.tile
    pad = nt * t - d.num_nodes
    xt = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    xt = xt.reshape((nt, t) + trailing)
    g = jnp.take(xt, d.block_col.reshape(-1), axis=0)
    g = g.reshape((nt, d.block_col.shape[1], t) + trailing)
    out = jnp.einsum("nkrc,nkc...->nr...", d.blocks.astype(x.dtype), g)
    out = out.reshape((nt * t,) + trailing)[: d.num_nodes]
    if d.residual is not None:
        out = out + _ell_matvec(d.residual, x)
    return out


@jax.custom_vjp
def bsr_spmm(fwd: BsrDirection, rev: BsrDirection, x):
    """Â @ x via the hybrid dense-block + residual-ELL operator; backward
    applies the reverse-direction operator (scatter-free throughout)."""
    return _bsr_matvec(fwd, x)


def _spmm_fwd(fwd, rev, x):
    return _bsr_matvec(fwd, x), (fwd, rev)


def _spmm_bwd(res, g):
    fwd, rev = res
    dx = _bsr_matvec(rev, g)
    zero = lambda d: jax.tree_util.tree_map(jnp.zeros_like, d)
    return zero(fwd), zero(rev), dx


bsr_spmm.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Kb-bucketed layout: ragged block-rows without hub-cap padding
# ---------------------------------------------------------------------------

# bucket ladder for per-row-tile block counts; each row-tile pads its block
# list up to the next rung. Rungs step by ~1.5x (power-of-two midpoints
# inserted, round 5): worst-case padding < 1.5x, measured ~15% on the
# proteins-density hub rows vs ~38% with the old power-of-two ladder —
# at a fixed HBM block residency that difference is coverage (the binding
# constraint at ogbn-proteins density, BENCH_NOTES r5). ~2x the bucket
# count means ~2x the (tiny) per-bucket gather+einsum kernels per matvec;
# the blocks they stream shrink by the same ratio.
_KB_LADDER = (4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384,
              512, 768, 1024, 1536, 2048)


class _Int8CountOverflow(Exception):
    """A dense tile held >127 parallel edges — int8 counts would wrap."""


# peak bytes the gathered [m, kb, T, F] tile operand of one bucket may
# occupy; hub buckets beyond it accumulate over kb-chunks in a lax.scan
# (cf. ops/ell._GATHER_BUDGET_BYTES — same failure mode, tile-level)
_BSR_GATHER_BUDGET_BYTES = 1 << 30


def _fill_blocks_flat(flat, values, size, block_dtype):
    """Scatter-accumulate ``values`` (or edge counts when ``values is
    None``) at int64 ``flat`` indices into a fresh [size] array of
    ``block_dtype``.

    Replaces ``np.add.at`` (round 5): sorting the flat indices first turns
    the random scatter into duplicate-free ascending writes
    (sort + ``add.reduceat`` + one sorted fancy assignment), and the
    target array is allocated in the FINAL dtype — no f32 staging pass,
    no whole-array ``astype``/``max`` sweep. At ogbn-proteins density the
    f32-staging ``np.add.at`` build took ~7 min host-side; this path is
    dominated by one 15M-element argsort (~seconds)."""
    if flat.size == 0:
        return np.zeros(size, block_dtype)
    order = np.argsort(flat, kind="stable")
    fs = flat[order]
    starts = np.flatnonzero(np.concatenate(([True], fs[1:] != fs[:-1])))
    uniq = fs[starts]
    if values is None:
        sums = np.diff(np.append(starts, fs.size))
        if sums.size and sums.max() > 127:
            raise _Int8CountOverflow(">127 parallel edges in a dense tile")
    else:
        sums = np.add.reduceat(values[order], starts)
    out = np.zeros(size, block_dtype)
    out[uniq] = sums.astype(block_dtype)
    return out


@struct.dataclass
class BsrBuckets:
    """One direction of the hybrid with **Kb-bucketed** dense blocks.

    The padded ``BsrDirection`` layout stores ``[Ntr, Kb_max]`` block slots,
    so after hub-clustering (:func:`degree_sorted_order`) a handful of hub
    row-tiles holding hundreds of blocks force either a huge padded array
    (observed 32 GB on a Pareto-α2 graph) or a per-row cap that demotes
    profitable tiles to the gather path (the round-2 capped build kept only
    0.22 edge coverage of an available 0.47). Here row-tiles are grouped by
    their dense-block count into ladder buckets (4, 6, 8, 12, …): each bucket
    is a small tile-level ELL ``[m_b, kb_b, T, T]`` whose output tiles
    scatter disjointly into the row space — hub rows pay hub cost, tail
    rows pay tail cost, and the byte budget buys ~2× the coverage of the
    capped layout at equal HBM.
    """

    blocks: Any        # tuple of [m_b, kb_b, T, T] per bucket
    block_col: Any     # tuple of int32 [m_b, kb_b]; 0 on padding
    row_tiles: Any     # tuple of int32 [m_b] owning row-tile ids (disjoint)
    residual: Optional[EllGraph]   # sparse-tile edges (per-edge ELL path)
    # int8 scaled-count format (round 5, unweighted graphs only): GCN tile
    # values are rank-1 — val[s→r] = inv√deg[r]·inv√deg[s] — so dense blocks
    # store exact int8 edge COUNTS and the degree scaling rides two O(N)
    # vector multiplies per matvec (x·inv before, out·inv after). Blocks
    # stream HALF the bf16 bytes, so a fixed HBM budget buys ~2× the tile
    # coverage; counts are exact where bf16 values quantized. ``inv_scale``
    # is the sanitized [N] inv-sqrt-degree vector (None → blocks hold real
    # values and no scaling is applied).
    inv_scale: Optional[Any] = None
    num_nodes: int = struct.field(pytree_node=False, default=0)
    tile: int = struct.field(pytree_node=False, default=256)


def _build_bucketed_direction(point_to, owner, values, num_nodes, *, tile,
                              min_edges, block_dtype=np.float32,
                              residual_kwargs=None, budget_bytes=None,
                              inv_scale=None):
    """out[owner] = Σ values · x[point_to] with Kb-bucketed dense tiles.

    ``budget_bytes`` caps the *raw content* bytes of kept blocks (per
    direction); tiles are kept densest-first, so the budget demotes the
    least profitable tiles globally instead of per-row (contrast
    ``max_blocks_per_row`` in :func:`_dense_tiles`).

    ``inv_scale``: [N] float array → int8 scaled-count blocks (see
    :class:`BsrBuckets`): dense tiles store exact edge counts as int8 and
    the rank-1 GCN scaling applies at matvec time. Requires every kept
    tile's per-(row, col) multi-edge count ≤ 127 (falls back to
    ``block_dtype`` values if exceeded); the residual ELL always stores
    fully-scaled values, so only the dense part changes representation."""
    use_int8 = inv_scale is not None
    elem_bytes = 1 if use_int8 else np.dtype(block_dtype).itemsize
    ntr = -(-num_nodes // tile)
    tr = (owner // tile).astype(np.int64)
    tc = (point_to // tile).astype(np.int64)
    key = tr * ntr + tc
    counts = np.bincount(key, minlength=ntr * ntr)
    dkeys = np.flatnonzero(counts >= min_edges).astype(np.int64)
    if budget_bytes is not None and dkeys.size:
        per_tile = tile * tile * elem_bytes
        max_tiles = max(int(budget_bytes // per_tile), 0)
        if dkeys.size > max_tiles:
            keep = np.argsort(-counts[dkeys], kind="stable")[:max_tiles]
            dkeys = np.sort(dkeys[keep])
    kmask = np.zeros(ntr * ntr, bool)
    kmask[dkeys] = True
    dense_edge = kmask[key]

    buckets = []
    if dkeys.size:
        dtr = dkeys // ntr
        dtc = dkeys % ntr
        per_row = np.bincount(dtr, minlength=ntr)
        # ladder rung per non-empty row-tile; the ladder is capped at ntr
        # (a row-tile can never hold more blocks than there are column
        # tiles) so every per_row value lands on a rung — a static ladder
        # would silently drop rows wider than its top rung on graphs with
        # more than _KB_LADDER[-1] column tiles
        ladder = tuple(l for l in _KB_LADDER if l < ntr) + (ntr,)
        rung = np.searchsorted(ladder, per_row, side="left")
        # slot of each dense tile within its row (dkeys sorted by (tr, tc))
        row_start = np.zeros(ntr + 1, np.int64)
        np.add.at(row_start, dtr + 1, 1)
        row_start = np.cumsum(row_start)
        slot_of = np.arange(dkeys.size) - row_start[dtr]
        slot_lookup = np.zeros(ntr * ntr, np.int64)
        slot_lookup[dkeys] = slot_of
        # per-edge destination (dense edges only)
        e = np.flatnonzero(dense_edge)
        e_tr = tr[e]
        e_slot = slot_lookup[key[e]]
        for li, kb in enumerate(ladder):
            rows = np.flatnonzero((rung == li) & (per_row > 0))
            if rows.size == 0:
                continue
            kb = int(min(kb, ntr))
            m = rows.size
            pos_of_row = np.full(ntr, -1, np.int64)
            pos_of_row[rows] = np.arange(m)
            bcol = np.zeros((m, kb), np.int32)
            sel = (rung[dtr] == li)
            bcol[pos_of_row[dtr[sel]], slot_of[sel]] = dtc[sel].astype(
                np.int32)
            esel = rung[e_tr] == li
            eb = e[esel]
            flat = ((pos_of_row[e_tr[esel]].astype(np.int64) * kb
                     + e_slot[esel]) * tile
                    + owner[eb] % tile) * tile + point_to[eb] % tile
            blocks = _fill_blocks_flat(
                flat, None if use_int8 else values[eb],
                m * kb * tile * tile,
                np.int8 if use_int8 else block_dtype,
            ).reshape(m, kb, tile, tile)
            buckets.append((jnp.asarray(blocks), jnp.asarray(bcol),
                            jnp.asarray(rows.astype(np.int32))))

    r = ~dense_edge
    residual = None
    if r.any():
        residual = _build_direction(point_to[r], owner[r], values[r],
                                    num_nodes, **(residual_kwargs or {}))
    return BsrBuckets(
        blocks=tuple(b[0] for b in buckets),
        block_col=tuple(b[1] for b in buckets),
        row_tiles=tuple(b[2] for b in buckets),
        residual=residual,
        inv_scale=(jnp.asarray(inv_scale, jnp.float32)
                   if use_int8 else None),
        num_nodes=num_nodes,
        tile=tile,
    ), dense_edge


# measured calibration (TPU v5e, 2026-08-20, powerlaw N=131k E=4.2M full
# train step): dense blocks stream well below the peak-HBM rate the cost
# model assumes, so the on-chip breakeven sits ~2.5x default_min_edges —
# min_edges sweep at tile=256 bf16: 26→142.4 ms, 64→100.0 ms (best),
# 96→100.5 ms, padded+cap baseline 115.4 ms. See BENCH_NOTES.md.
_BUCKETED_BREAKEVEN_SCALE = 2.5


def bucketed_min_edges(tile: int, block_elem_bytes: int = 4) -> int:
    """On-chip-calibrated occupancy threshold for the bucketed layout."""
    return int(default_min_edges(tile, block_elem_bytes=block_elem_bytes)
               * _BUCKETED_BREAKEVEN_SCALE)


def build_bsr_bucketed_gcn(senders, receivers, num_nodes, edge_weight=None,
                           *, tile=256, min_edges=None, verbose=False,
                           block_dtype=np.float32, residual_kwargs=None,
                           budget_bytes=2.5 * 2 ** 30, scaled_int8="auto"):
    """GCN-normalized Â as a Kb-bucketed hybrid (see :class:`BsrBuckets`).

    Same contract as :func:`build_bsr_gcn` (returns ``(fwd, rev)`` for
    :func:`bsr_bucketed_spmm` / ``gcn_conv_ell``); preferred for
    heavy-tailed graphs after :func:`degree_sorted_order` where the padded
    layout's hub cap binds. ``budget_bytes`` is raw kept-block content per
    direction (no padding waste to subtract — bucketing keeps waste under
    the next ladder rung).

    ``scaled_int8``: ``'auto'`` (default) stores dense tiles as **int8 edge
    counts** when the graph is unweighted — the rank-1 GCN normalization
    ``val = inv√deg[r]·inv√deg[s]`` rides two O(N) vector multiplies at
    matvec time instead of per-entry values (:class:`BsrBuckets`). Halves
    the block HBM stream vs bf16 AND doubles the tile coverage a fixed
    ``budget_bytes`` buys (the binding constraint at ogbn-proteins density,
    BENCH_NOTES r5); counts are exact where bf16 values rounded. Weighted
    graphs (``edge_weight`` given) keep per-entry values — their tiles are
    not rank-1. ``True`` forces (raises on weighted graphs), ``False``
    disables."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    if scaled_int8 == "auto":
        scaled_int8 = edge_weight is None
    elif scaled_int8 and edge_weight is not None:
        raise ValueError("scaled_int8 requires an unweighted graph "
                         "(weighted tiles are not rank-1)")
    elem = 1 if scaled_int8 else np.dtype(block_dtype).itemsize
    if min_edges is None:
        min_edges = bucketed_min_edges(tile, block_elem_bytes=elem)
    if residual_kwargs is None:
        residual_kwargs = dict(min_bucket=8)
    val = _gcn_values(senders, receivers, num_nodes, edge_weight)
    inv = None
    if scaled_int8:
        deg = np.bincount(receivers, minlength=num_nodes).astype(np.float64)
        with np.errstate(divide="ignore"):
            inv = np.sqrt(1.0 / deg)
        # zero-in-degree nodes: every incident edge value is nan→0 in
        # _gcn_values; inv=0 reproduces that exactly
        inv = np.nan_to_num(inv, nan=0.0, posinf=0.0).astype(np.float32)

    def build(p, o):
        nonlocal min_edges
        try:
            return _build_bucketed_direction(
                p, o, val, num_nodes, tile=tile, min_edges=min_edges,
                block_dtype=block_dtype, residual_kwargs=residual_kwargs,
                budget_bytes=budget_bytes, inv_scale=inv)
        except _Int8CountOverflow:
            # >127 parallel edges somewhere — rare multigraph; rebuild with
            # per-entry values (and the value-bytes occupancy threshold)
            min_edges = bucketed_min_edges(
                tile, block_elem_bytes=np.dtype(block_dtype).itemsize)
            return _build_bucketed_direction(
                p, o, val, num_nodes, tile=tile, min_edges=min_edges,
                block_dtype=block_dtype, residual_kwargs=residual_kwargs,
                budget_bytes=budget_bytes)

    fwd, de_f = build(senders, receivers)
    rev, de_r = build(receivers, senders)
    if verbose:
        for name, d, de in (("fwd", fwd, de_f), ("rev", rev, de_r)):
            nb = sum(int(np.prod(b.shape[:2])) for b in d.blocks)
            mb = sum(b.nbytes for b in d.blocks) / 1e6
            shapes = [tuple(b.shape[:2]) for b in d.blocks]
            fmt = "int8-count" if d.inv_scale is not None else str(
                np.dtype(block_dtype))
            print(f"# bsr-bucketed[{name}]: slots={nb} ({mb:.0f} MB, {fmt}) "
                  f"buckets={shapes} coverage={de.mean():.3f}",
                  file=sys.stderr, flush=True)
    return fwd, rev


def _bsr_bucketed_matvec(d: BsrBuckets, x):
    trailing = x.shape[1:]
    t = d.tile
    ntr = -(-d.num_nodes // t)
    pad = ntr * t - d.num_nodes
    xs = x
    if d.inv_scale is not None:
        # int8 count blocks: rank-1 GCN scaling as two O(N) vector
        # multiplies (x·inv√deg before the blocks, out·inv√deg after);
        # the residual ELL below runs on the RAW x — its values are
        # fully scaled at build time
        s = d.inv_scale.astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        xs = x * s
    xt = jnp.pad(xs, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    xt = xt.reshape((ntr, t) + trailing)
    out_t = jnp.zeros((ntr, t) + trailing, x.dtype)
    F = int(np.prod(trailing)) if trailing else 1
    for blocks, bcol, rows in zip(d.blocks, d.block_col, d.row_tiles):
        m, kb = bcol.shape

        def bucket_apply(blocks, bcol):
            g = jnp.take(xt, bcol.reshape(-1), axis=0)
            g = g.reshape(bcol.shape + (t,) + trailing)
            # int8 blocks convert on the fly inside the dot (the HBM
            # read stays 1 byte/entry); f32/bf16 blocks cast as before
            return jnp.einsum("mkrc,mkc...->mr...",
                              blocks.astype(x.dtype), g)

        if m * kb * t * F * x.dtype.itemsize <= _BSR_GATHER_BUDGET_BYTES:
            ob = bucket_apply(blocks, bcol)
        else:
            # hub buckets: the gathered [m, kb, T, F] operand exceeds the
            # transient budget (observed: 3.5 GB/direction at tile=128 on
            # the proteins-density graph — an HBM OOM on a 16 GB chip).
            # Accumulate over kb-CHUNKS inside a lax.scan: footprint
            # m × kc × T × F, every tile still gathered exactly once
            # (the ops/ell.py k-chunking pattern).
            kc = int(_BSR_GATHER_BUDGET_BYTES
                     // max(1, m * t * F * x.dtype.itemsize))
            kc = min(max(1, kc), kb)
            nkc = -(-kb // kc)
            pk = nkc * kc - kb
            # padded slots gather col-tile 0 with zero blocks
            b3 = jnp.moveaxis(
                jnp.pad(blocks, ((0, 0), (0, pk), (0, 0), (0, 0)))
                .reshape(m, nkc, kc, t, t), 1, 0)
            c3 = jnp.moveaxis(
                jnp.pad(bcol, ((0, 0), (0, pk))).reshape(m, nkc, kc), 1, 0)
            ob, _ = jax.lax.scan(
                lambda acc, bc: (acc + bucket_apply(bc[0], bc[1]), None),
                jnp.zeros((m, t) + trailing, x.dtype), (b3, c3))
        out_t = out_t.at[rows].add(ob, indices_are_sorted=True,
                                   unique_indices=True)
    out = out_t.reshape((ntr * t,) + trailing)[: d.num_nodes]
    if d.inv_scale is not None:
        out = out * s
    if d.residual is not None:
        out = out + _ell_matvec(d.residual, x)
    return out


@jax.custom_vjp
def bsr_bucketed_spmm(fwd: BsrBuckets, rev: BsrBuckets, x):
    """Â @ x via the Kb-bucketed hybrid; backward applies the
    reverse-direction operator (scatter-free across the node dimension —
    the only scatter is the ~Ntr-index disjoint tile write)."""
    return _bsr_bucketed_matvec(fwd, x)


def _bspmm_fwd(fwd, rev, x):
    return _bsr_bucketed_matvec(fwd, x), (fwd, rev)


def _bspmm_bwd(res, g):
    fwd, rev = res
    dx = _bsr_bucketed_matvec(rev, g)
    zero = lambda d: jax.tree_util.tree_map(jnp.zeros_like, d)
    return zero(fwd), zero(rev), dx


bsr_bucketed_spmm.defvjp(_bspmm_fwd, _bspmm_bwd)


# ---------------------------------------------------------------------------
# Node-sharded hybrid: block rows partitioned across a mesh axis
# ---------------------------------------------------------------------------

@struct.dataclass
class BsrShard:
    """Per-device slice of one direction: this shard owns ``num_rows``
    output rows; ``block_col``/``res_point`` index the *global* (padded)
    node space, so the operand arrives via one tiled ``all_gather`` over
    the mesh axis (the graph analog of sequence-parallel attention,
    SURVEY.md §2.6). All leaves have identical shapes across shards, as
    shard_map requires."""

    blocks: Any       # f32/int8 [Ntr_loc, Kb, T, T]
    block_col: Any    # int32 [Ntr_loc, Kb] global col-tile ids
    res_point: Any    # int32 [Er] global sender ids (0 on padding)
    res_owner: Any    # int32 [Er] local receiver ids, sorted (0 on padding)
    res_val: Any      # f32 [Er] (0 on padding)
    # int8 scaled-count format (round 5, unweighted graphs; see
    # :class:`BsrBuckets`): blocks hold exact int8 edge counts and the
    # rank-1 GCN scaling applies at matvec time. ``inv_rows`` is this
    # shard's inv√deg slice [rows_per]; ``inv_cols`` the full padded
    # vector [pad_n] (replicated per shard — 4 B/node, cheaper than an
    # extra all_gather in the conv's critical path and invisible to the
    # comm-volume accounting). Both None → blocks hold real values.
    inv_rows: Optional[Any] = None
    inv_cols: Optional[Any] = None
    num_rows: int = struct.field(pytree_node=False, default=0)
    num_cols: int = struct.field(pytree_node=False, default=0)
    tile: int = struct.field(pytree_node=False, default=256)
    axis_name: str = struct.field(pytree_node=False, default="graph")


def build_bsr_gcn_sharded(senders, receivers, num_nodes, n_shards, *,
                          tile=256, min_edges=None, edge_weight=None,
                          axis_name="graph", scaled_int8="auto"):
    """Partition the hybrid operator into ``n_shards`` row slices.

    Returns ``(fwd, rev, rows_per_shard)`` where fwd/rev are
    :class:`BsrShard` pytrees whose leaves carry a leading ``n_shards``
    axis — pass through ``shard_map`` with ``P('graph')`` in_specs and call
    :func:`bsr_spmm_sharded` inside. Nodes are padded to
    ``n_shards · rows_per_shard`` (rows_per_shard is tile-aligned);
    features must be sharded with the same padding
    (``x_padded.reshape(n_shards, rows_per, F)``).

    ``scaled_int8``: same contract as :func:`build_bsr_bucketed_gcn` —
    ``'auto'`` stores int8 count blocks on unweighted graphs (half the
    per-shard block HBM, same math via the rank-1 degree scaling).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    if scaled_int8 == "auto":
        scaled_int8 = edge_weight is None
    elif scaled_int8 and edge_weight is not None:
        raise ValueError("scaled_int8 requires an unweighted graph")
    if min_edges is None:
        min_edges = default_min_edges(
            tile, block_elem_bytes=1 if scaled_int8 else 4)
    val = _gcn_values(senders, receivers, num_nodes, edge_weight)

    rows_per = -(-num_nodes // (n_shards * tile)) * tile
    pad_n = rows_per * n_shards

    inv_pad = None
    if scaled_int8:
        deg = np.bincount(receivers, minlength=num_nodes).astype(np.float64)
        with np.errstate(divide="ignore"):
            inv = np.sqrt(1.0 / deg)
        inv = np.nan_to_num(inv, nan=0.0, posinf=0.0).astype(np.float32)
        inv_pad = np.zeros(pad_n, np.float32)
        inv_pad[:num_nodes] = inv

    def build_dir(point_to, owner):
        shards, n_res = [], []
        for s in range(n_shards):
            m = (owner // rows_per) == s
            blocks, block_col, dense_edge = _dense_tiles(
                point_to[m], owner[m] - s * rows_per, val[m],
                rows_per, pad_n, tile=tile, min_edges=min_edges,
                fill_ones=scaled_int8)
            r = ~dense_edge
            shards.append((blocks, block_col, point_to[m][r],
                           (owner[m] - s * rows_per)[r], val[m][r]))
            n_res.append(int(r.sum()))
        kb = max(sh[1].shape[1] for sh in shards)
        er = max(max(n_res), 1)
        out = []
        for blocks, block_col, rp, ro, rv in shards:
            pk = kb - block_col.shape[1]
            if pk:
                blocks = np.pad(blocks, ((0, 0), (0, pk), (0, 0), (0, 0)))
                block_col = np.pad(block_col, ((0, 0), (0, pk)))
            order = np.argsort(ro, kind="stable")
            rp, ro, rv = rp[order], ro[order], rv[order]
            pe = er - rp.shape[0]
            rp = np.pad(rp.astype(np.int32), (0, pe))
            ro = np.pad(ro.astype(np.int32), (0, pe),
                        constant_values=rows_per - 1)
            rv = np.pad(rv.astype(np.float32), (0, pe))
            out.append((blocks, block_col, rp, ro, rv))
        stack = [np.stack([o[i] for o in out]) for i in range(5)]
        inv_kw = {}
        if scaled_int8:
            inv_kw = dict(
                inv_rows=jnp.asarray(inv_pad.reshape(n_shards, rows_per)),
                inv_cols=jnp.asarray(
                    np.broadcast_to(inv_pad, (n_shards, pad_n)).copy()),
            )
        return BsrShard(
            blocks=jnp.asarray(stack[0]), block_col=jnp.asarray(stack[1]),
            res_point=jnp.asarray(stack[2]), res_owner=jnp.asarray(stack[3]),
            res_val=jnp.asarray(stack[4]), **inv_kw,
            num_rows=rows_per, num_cols=pad_n, tile=tile,
            axis_name=axis_name,
        )

    try:
        fwd = build_dir(senders, receivers)
        rev = build_dir(receivers, senders)
    except _Int8CountOverflow:
        # rare multigraph (>127 parallel edges in one tile): value blocks
        return build_bsr_gcn_sharded(
            senders, receivers, num_nodes, n_shards, tile=tile,
            min_edges=None, edge_weight=edge_weight, axis_name=axis_name,
            scaled_int8=False)
    return fwd, rev, rows_per


def _bsr_shard_apply(d: BsrShard, x_full):
    """Apply this shard's rows to the gathered global operand."""
    trailing = x_full.shape[1:]
    t = d.tile
    ntc = d.num_cols // t
    kb = d.block_col.shape[1]
    xb = x_full
    if d.inv_cols is not None:
        # int8 count blocks: rank-1 GCN scaling — scale the gathered
        # operand by inv√deg (cols), the block output by this shard's
        # inv√deg slice (rows); the residual below runs on the RAW
        # operand (its values are fully scaled at build time)
        xb = x_full * d.inv_cols.reshape(
            (-1,) + (1,) * len(trailing)).astype(x_full.dtype)
    xt = xb.reshape((ntc, t) + trailing)
    g = jnp.take(xt, d.block_col.reshape(-1), axis=0)
    g = g.reshape((d.num_rows // t, kb, t) + trailing)
    out = jnp.einsum("nkrc,nkc...->nr...", d.blocks.astype(x_full.dtype), g)
    out = out.reshape((d.num_rows,) + trailing)
    if d.inv_rows is not None:
        out = out * d.inv_rows.reshape(
            (-1,) + (1,) * len(trailing)).astype(x_full.dtype)
    # residual: wide-row gather + sorted local segment-sum
    from difformer_tpu.ops.segment import segment_sum

    gre = jnp.take(x_full, d.res_point, axis=0)
    wv = d.res_val.reshape((-1,) + (1,) * len(trailing)).astype(x_full.dtype)
    out = out + segment_sum(gre * wv, d.res_owner, d.num_rows,
                            indices_are_sorted=True)
    return out


@jax.custom_vjp
def bsr_spmm_sharded(fwd: BsrShard, rev: BsrShard, x):
    """Distributed Â @ x: one tiled all_gather of the operand over the mesh
    axis (named by ``fwd.axis_name``), then local MXU blocks + local
    residual. x: [rows_per, ...] local; returns local rows. Backward
    all_gathers the cotangent and applies the reverse-direction shard —
    scatter-free across devices."""
    x_full = jax.lax.all_gather(x, fwd.axis_name, axis=0, tiled=True)
    return _bsr_shard_apply(fwd, x_full)


def _sh_fwd(fwd, rev, x):
    return bsr_spmm_sharded(fwd, rev, x), (fwd, rev)


def _sh_bwd(res, g):
    fwd, rev = res
    g_full = jax.lax.all_gather(g, rev.axis_name, axis=0, tiled=True)
    dx = _bsr_shard_apply(rev, g_full)
    zero = lambda d: jax.tree_util.tree_map(jnp.zeros_like, d)
    return zero(fwd), zero(rev), dx


bsr_spmm_sharded.defvjp(_sh_fwd, _sh_bwd)


def _tile_stats(senders, receivers, num_nodes, *, tile=256, min_edges=None):
    """(edge coverage, qualifying-tile count) of the dense-tile partition."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    if senders.size == 0:
        return 0.0, 0
    if min_edges is None:
        min_edges = default_min_edges(tile)
    nt = -(-num_nodes // tile)
    key = (receivers // tile).astype(np.int64) * nt + senders // tile
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    keep = counts >= min_edges
    return float(keep[inv].mean()), int(keep.sum())


def dense_coverage(senders, receivers, num_nodes, *, tile=256,
                   min_edges=None):
    """Fraction of edges that would land in dense tiles — cheap host-side
    probe (unique+counts only) for auto-selecting the SpMM implementation:
    community graphs score high, uniform-random graphs ~0."""
    return _tile_stats(senders, receivers, num_nodes, tile=tile,
                       min_edges=min_edges)[0]


def degree_sorted_order(senders, receivers, num_nodes):
    """Node relabeling that clusters hubs: position of node g =
    rank of g by descending total degree. On heavy-tailed (power-law)
    graphs this concentrates hub↔hub edges into the leading tiles,
    turning a coverage-0 graph into a BSR-viable one (measured: Pareto-α2
    graph at E/N=32 goes 0.01 → 0.31 dense coverage at tile=256) — the
    standard hub-clustering trick for power-law SpMM.

    Returns ``perm`` with ``perm[g] = new position of node g``. Apply as
    ``x_new[perm[g]] = x[g]`` (i.e. ``x_new = x[inverse]``) and relabel
    edges as ``perm[senders], perm[receivers]``.
    """
    from difformer_tpu.data.transforms import locality_reorder

    ei = np.stack([np.asarray(senders), np.asarray(receivers)])
    return locality_reorder(ei, num_nodes, method="degree")


def choose_spmm(senders, receivers, num_nodes, *, tile=256,
                coverage_threshold=0.3, try_degree_sort=True,
                budget_bytes=2.5 * 2 ** 30, block_elem_bytes=1):
    """'bsr' when enough of the graph is tile-dense to pay for the blocks;
    'bsr-sorted' when it only becomes so after hub-clustering relabeling
    (:func:`degree_sorted_order`); else 'ell'.

    Coverage alone is not sufficient: at ogbn-proteins edge density
    (mean degree ~300) EVERY 256-tile holds ≥ min_edges, so coverage
    reads 1.0 — but materializing all ~260k tiles would take ~17 GB even
    as int8 counts (``block_elem_bytes=1``, the round-5 scaled-count
    default for unweighted graphs), far over ``budget_bytes``. In that
    capped regime the natural
    node order wastes the budget on merely-average tiles; hub-clustering
    first concentrates the kept blocks on the densest region (round-5
    on-chip ladder at N=131072, E=39.5M: pure ELL 1496 ms/step, capped
    unsorted hybrid 1337, capped hub-sorted hybrid 851) — so over-budget
    coverage elects 'bsr-sorted', in-budget coverage plain 'bsr' (natural
    community structure is already block-aligned; relabeling would break
    it)."""
    cov, n_tiles = _tile_stats(senders, receivers, num_nodes, tile=tile)
    blocks_bytes = n_tiles * tile * tile * block_elem_bytes
    if cov >= coverage_threshold:
        if blocks_bytes <= budget_bytes or not try_degree_sort:
            return "bsr", cov
        return "bsr-sorted", cov
    if try_degree_sort:
        perm = degree_sorted_order(senders, receivers, num_nodes)
        cov_sorted, _ = _tile_stats(
            perm[np.asarray(senders)], perm[np.asarray(receivers)],
            num_nodes, tile=tile)
        if cov_sorted >= coverage_threshold:
            return "bsr-sorted", cov_sorted
    return "ell", cov
