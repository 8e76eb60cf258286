"""Collective-augmented graph ops for node-sharded execution under shard_map.

Each op here is the distributed twin of a single-device op in
``difformer_tpu.ops`` and is bit-compatible with it on an unsharded input:

* ``gcn_conv_sharded`` — receiver-owned edge partition: degrees are local
  (every edge of a local receiver is local), sender features and the global
  degree vector arrive via ``all_gather`` over the mesh axis (tiled, rides
  ICI). The scatter itself stays local. [Round-1 design: full gather; the
  boundary-only all-to-all + Pallas-overlap variant is the planned upgrade.]
* ``sigmoid_attention_sharded`` — ring attention over node shards: key/value
  shards rotate around the ring via ``ppermute`` while each shard accumulates
  its queries' numerator/denominator; N×N is never materialized and peak
  memory is one remote shard. The backward differentiates through the ring.
* linear 'simple' attention needs no op here — its distributed form is two
  psums inside ``difformer_tpu.ops.linear_attention.simple_attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from difformer_tpu.ops.segment import segment_sum


def _axis_size(axis_name):
    return jax.lax.psum(1, axis_name)


def gcn_conv_sharded(x, senders_global, receivers_local, edge_weight=None,
                     *, edge_mask=None, axis_name="graph"):
    """Distributed symmetric-normalized conv.

    x: local node features [N_loc, ...]; senders_global: [E_loc] global
    (padded) node ids; receivers_local: [E_loc] local ids; edge_mask zeroes
    padded edges. Matches ``ops.graph_ops.gcn_conv`` semantics globally.
    """
    n_loc = x.shape[0]
    ones = (
        edge_mask.astype(jnp.float32)
        if edge_mask is not None
        else jnp.ones(senders_global.shape, jnp.float32)
    )
    deg_local = segment_sum(ones, receivers_local, n_loc)
    deg_full = jax.lax.all_gather(deg_local, axis_name, tiled=True)  # [N_glob]
    x_full = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)

    shard = jax.lax.axis_index(axis_name)
    recv_global = receivers_local + shard * n_loc

    inv_sqrt = jnp.sqrt(1.0 / deg_full)
    value = inv_sqrt[recv_global] * inv_sqrt[senders_global]
    if edge_weight is not None:
        value = edge_weight * value
    value = jnp.where(jnp.isfinite(value), value, 0.0) * ones

    msg = jnp.take(x_full, senders_global, axis=0) * value.reshape(
        (-1,) + (1,) * (x.ndim - 1)
    ).astype(x.dtype)
    return segment_sum(msg, receivers_local, n_loc, indices_are_sorted=True)


def gcn_conv_halo(x, senders_table, receivers_local, edge_value, send_idx,
                  send_mask, *, axis_name="graph"):
    """Boundary-only distributed conv: each shard ships exactly the owned
    rows its peers reference (host-precomputed plan, ``partition._build_
    halo_plan``) through ONE ``all_to_all`` over the mesh axis, then runs a
    purely local gather + sorted segment-sum against the ``[own || halo]``
    table with host-prenormalized edge values. Communication volume is the
    boundary set, not the full feature matrix (vs ``gcn_conv_sharded``'s
    all_gather)."""
    n_loc = x.shape[0]
    send_buf = jnp.take(x, send_idx, axis=0)           # [S, B, ...]
    send_buf = send_buf * send_mask.reshape(
        send_mask.shape + (1,) * (x.ndim - 1)
    ).astype(x.dtype)
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0)
    table = jnp.concatenate(
        [x, recv.reshape((-1,) + x.shape[1:])], axis=0
    )
    msg = jnp.take(table, senders_table, axis=0) * edge_value.reshape(
        (-1,) + (1,) * (x.ndim - 1)
    ).astype(x.dtype)
    return segment_sum(msg, receivers_local, n_loc, indices_are_sorted=True)


def gcn_conv_halo_overlap(x, plan, *, axis_name="graph"):
    """Halo conv with communication/compute overlap.

    ``plan`` (dict, per-shard local arrays) splits edges into internal
    (sender local) and boundary (sender remote) sets. The all_to_all of
    boundary rows has no data dependency on the internal-edge aggregation,
    so XLA's latency-hiding scheduler runs them concurrently — the manual
    analog of overlapping the NCCL halo exchange with local SpMM.
    """
    n_loc = x.shape[0]
    trail = (1,) * (x.ndim - 1)

    send_buf = jnp.take(x, plan["send_idx"], axis=0)
    send_buf = send_buf * plan["send_mask"].reshape(
        plan["send_mask"].shape + trail
    ).astype(x.dtype)
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0)

    internal = segment_sum(
        jnp.take(x, plan["int_senders"], axis=0)
        * plan["int_value"].reshape((-1,) + trail).astype(x.dtype),
        plan["int_receivers"], n_loc, indices_are_sorted=True,
    )
    halo = recv.reshape((-1,) + x.shape[1:])
    boundary = segment_sum(
        jnp.take(halo, plan["bnd_senders"], axis=0)
        * plan["bnd_value"].reshape((-1,) + trail).astype(x.dtype),
        plan["bnd_receivers"], n_loc, indices_are_sorted=True,
    )
    return internal + boundary


def collective_bytes_per_layer(sg, *, feat_dim, num_heads=1,
                               dtype_bytes=4):
    """Analytic collective wire traffic of ONE DIFFormerConv layer for each
    boundary-exchange strategy on a partitioned graph (host-side, from the
    plan shapes — a regression guard for the ≥80% scaling-efficiency target,
    BASELINE.md north star; exact counts, no profiler needed).

    Returns a dict (whole-mesh bytes moved per layer, forward pass):

    * ``halo_wire`` — the all_to_all buffer actually shipped by
      ``gcn_conv_halo(_overlap)``: padded send slots x feature row.
    * ``halo_real`` — the useful (non-padding) boundary rows inside it.
    * ``allgather`` — what ``gcn_conv_sharded``'s full feature all_gather
      ships for the same layer: every shard's rows to every other shard.
    * ``attn_psum`` — the two 'simple'-attention reductions ([H,M] kv-sums
      and [H,M,D] outer products are mesh-wide psums; payload independent
      of N — the reason the linear kernel scales).
    """
    import numpy as np

    F = int(feat_dim) * int(num_heads)
    S = int(sg.node_feat.shape[0])
    n_loc = int(sg.node_feat.shape[1])
    out = {}
    if sg.send_idx is not None:
        send_slots = int(np.prod(np.asarray(sg.send_idx).shape[1:]))
        real_rows = int(np.asarray(sg.send_mask).sum())
        # each shard ships (S-1)/S of its buffer off-chip (the self block
        # of an all_to_all stays local)
        out["halo_wire"] = send_slots * (S - 1) * F * dtype_bytes
        # the plan's self-pair blocks are empty (partition.py skips j==s),
        # so every real row crosses the wire
        out["halo_real"] = real_rows * F * dtype_bytes
    out["allgather"] = S * (S - 1) * n_loc * F * dtype_bytes
    # Σk [H, M] + Σ(k v^T) [H, M, D]: ring all-reduce ≈ 2·payload per shard
    out["attn_psum"] = (
        2 * (num_heads * feat_dim + num_heads * feat_dim * feat_dim)
        * dtype_bytes * 2 * max(S - 1, 0)
    )
    return out


def _varying(x, axis_name):
    """Mark a zero-filled / constant array device-varying so scan carry
    types match under shard_map's vma tracking (constants start
    'unvarying'; after one ppermute the carried value is varying)."""
    if hasattr(jax.lax, "pcast"):
        try:
            return jax.lax.pcast(x, (axis_name,), to="varying")
        except ValueError:
            return x  # already varying
    return x


def sigmoid_attention_sharded(qs, ks, vs, *, key_mask=None, axis_name="graph",
                              use_pallas=None, interpret=False):
    """Ring sigmoid attention: qs/ks/vs are local shards [N_loc, H, M/D].

    Globally equivalent to ``ops.sigmoid_attention.sigmoid_attention`` on the
    concatenated tensors. Each of the S ring steps computes the local queries
    against one rotating key/value shard; ``ppermute`` moves shards around
    the ring (ICI neighbor exchange), overlapping naturally under XLA's
    latency-hiding scheduler.

    Per-step score math dispatches like the single-chip op: on TPU at
    N_loc ≥ 4096 each ring step runs the Pallas flash kernels in their
    UNNORMALIZED form (``sigmoid_attention_pallas_unnormalized`` — raw
    numerator/denominator partial sums, accumulable across shards), which
    also carries the round-3 Pallas backward: differentiating the XLA
    einsum form below through the ring scan reproduces the scan-of-einsums
    compile pathology at scale (BENCH_NOTES r2/r3). The XLA form stays the
    small-shard / CPU path; like the Pallas kernel it rides the denominator
    as a ones-column of V and only multiplies a mask when one is passed.
    """
    use_mask = key_mask is not None
    if use_mask:
        key_mask = key_mask.astype(jnp.float32)
    n_shards = _axis_size(axis_name)
    d_out = vs.shape[2]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and qs.shape[0] >= 4096 and ks.shape[0] >= 4096)
    if use_pallas:
        from difformer_tpu.kernels.pallas_sigmoid_attention import (
            sigmoid_attention_pallas_unnormalized,
        )

        def step_p(carry, _):
            if use_mask:
                num, den, k_c, v_c, m_c = carry
            else:
                num, den, k_c, v_c = carry
            num_p, den_p = sigmoid_attention_pallas_unnormalized(
                qs, k_c, v_c, m_c if use_mask else None,
                interpret=interpret)
            num = num + num_p
            den = den + den_p
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            k_c = jax.lax.ppermute(k_c, axis_name, perm)
            v_c = jax.lax.ppermute(v_c, axis_name, perm)
            if use_mask:
                m_c = jax.lax.ppermute(m_c, axis_name, perm)
                return (num, den, k_c, v_c, m_c), None
            return (num, den, k_c, v_c), None

        num0 = _varying(
            jnp.zeros((qs.shape[0], qs.shape[1], d_out), jnp.float32),
            axis_name)
        den0 = _varying(
            jnp.zeros((qs.shape[0], qs.shape[1]), jnp.float32), axis_name)
        init = ((num0, den0, ks, vs, _varying(key_mask, axis_name))
                if use_mask else (num0, den0, ks, vs))
        carry, _ = jax.lax.scan(step_p, init, None, length=n_shards)
        num, den = carry[0], carry[1]
        return (num / den[..., None]).astype(qs.dtype)
    # ones column: Σ_l s_l rides the second matmul as output column d_out
    vs = jnp.concatenate(
        [vs, jnp.ones(vs.shape[:2] + (1,), vs.dtype)], axis=-1)

    def step(carry, _):
        if use_mask:
            num, k_c, v_c, m_c = carry
        else:
            num, k_c, v_c = carry
        s = jax.nn.sigmoid(jnp.einsum("nhm,lhm->nlh", qs, k_c,
                                      preferred_element_type=jnp.float32))
        if use_mask:
            s = s * m_c[None, :, None]
        num = num + jnp.einsum("nlh,lhd->nhd", s.astype(v_c.dtype), v_c,
                               preferred_element_type=jnp.float32)
        perm = [
            (i, (i + 1) % n_shards) for i in range(n_shards)
        ]
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        if use_mask:
            m_c = jax.lax.ppermute(m_c, axis_name, perm)
            return (num, k_c, v_c, m_c), None
        return (num, k_c, v_c), None

    acc0 = _varying(
        jnp.zeros((qs.shape[0], qs.shape[1], d_out + 1), jnp.float32),
        axis_name)
    if use_mask:
        init = (acc0, ks, vs, _varying(key_mask, axis_name))
    else:
        init = (acc0, ks, vs)
    carry, _ = jax.lax.scan(step, init, None, length=n_shards)
    num = carry[0]
    return (num[..., :d_out] / num[..., d_out:]).astype(qs.dtype)
