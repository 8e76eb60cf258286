"""DIFFormer_v2: the batched-graphs variant (graph-level prediction).

Reference: ``physical particle/difformer-v2.py:48-223`` + the ``GraphGNN``
pooling head (``physical particle/models.py:13-36``). The reference keeps a
flat node tensor and round-trips through ``scatter_add_`` / pad-to-max every
layer; here the whole model runs natively on a **padded dense batch layout**
``[B, M, ...]`` (B graphs, M = padded max nodes) so every per-graph attention
contraction is a batched MXU matmul and shapes stay static under jit. The
GCN branch runs on the padded-flat block-diagonal edge list
(indices in ``b*M + slot`` space, padded edges masked).

Layer-ordering parity notes (SURVEY.md §7.3): v2 applies an *extra ReLU
after LayerNorm* inside each layer (``difformer-v2.py:217``) and dropout on
the output head (``:222``) — both reproduced.

The reference v2 'sigmoid' kernel has a cross-graph quirk
(``difformer-v2.py:124``); we default to the intended within-graph semantics
(``sigmoid_attention_padded``) with a ``crossgraph_quirk`` escape hatch.

Note the reference ``GraphGNN.forward`` signature cannot actually be invoked
by its own trainer (``models.py:28`` vs ``main.py:85``, SURVEY.md §2.1);
``GraphLevelModel`` implements the intended behavior: encode → pool → linear.
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp

from difformer_tpu.nn.common import TorchLayerNorm, TorchLinear
from difformer_tpu.ops.graph_ops import gcn_conv
from difformer_tpu.ops.linear_attention import simple_attention_padded
from difformer_tpu.ops.sigmoid_attention import (
    sigmoid_attention_padded,
    sigmoid_attention_padded_crossgraph,
)


class TransConvV2(nn.Module):
    """One batched DIFFormer layer (reference ``TransConv``,
    difformer-v2.py:48-163)."""

    out_channels: int
    num_heads: int = 1
    kernel: str = "simple"
    use_graph: bool = True
    use_weight: bool = True
    graph_weight: float = -1.0
    crossgraph_quirk: bool = False

    @nn.compact
    def __call__(
        self,
        x_pad,                 # [B, M, F]
        node_mask,             # bool [B, M]
        n_nodes,               # [B]
        senders=None,          # [E] padded-flat indices (b*M + slot)
        receivers=None,
        edge_weight=None,
        edge_mask=None,
        indices_are_sorted=False,
        knn_table=None,        # (idx [B*M, k], w [B*M, k]) scatter-free plan
        dense_adj=None,        # [B, M, M] per-graph normalized adjacency
    ):
        B, M = x_pad.shape[:2]
        H, D = self.num_heads, self.out_channels
        query = TorchLinear(D * H, name="Wq")(x_pad).reshape(B, M, H, D)
        key = TorchLinear(D * H, name="Wk")(x_pad).reshape(B, M, H, D)
        if self.use_weight:
            value = TorchLinear(D * H, name="Wv")(x_pad).reshape(B, M, H, D)
        else:
            value = x_pad.reshape(B, M, 1, D)

        mask4 = node_mask[..., None, None].astype(x_pad.dtype)
        value = value * mask4

        if self.kernel == "simple":
            attention_output = simple_attention_padded(
                query * mask4, key * mask4, value, node_mask, n_nodes
            )
        elif self.kernel == "sigmoid":
            if self.crossgraph_quirk:
                # reference to_pad (difformer-v2.py:23-28) leaves exact zeros
                # at padded slots (sigmoid(0)=0.5 enters the normalizer) —
                # mask q/k here to reproduce that, not the Linear bias
                attention_output = sigmoid_attention_padded_crossgraph(
                    query * mask4, key * mask4, value, node_mask
                )
            else:
                attention_output = sigmoid_attention_padded(
                    query, key, value, node_mask
                )
        else:
            raise ValueError(f"unknown kernel {self.kernel!r}")

        if self.use_graph:
            if dense_adj is not None:
                # block-dense plan (data/batching.dense_adj): tiny per-graph
                # adjacencies make the conv one batched MXU matmul in each
                # direction (backward = A^T @ dg via plain AD) — no gathers,
                # no scatters; ~45x cheaper than the gather plans at the
                # actstrack shape (BENCH_NOTES r5)
                graph_output = jnp.einsum(
                    "bmn,bnhd->bmhd", dense_adj.astype(value.dtype), value)
            else:
                graph_output = self._edge_conv(
                    value, senders, receivers, edge_weight, edge_mask,
                    indices_are_sorted, knn_table, B, M, D)
            if self.graph_weight > 0:
                final_output = (
                    (1 - self.graph_weight) * attention_output
                    + self.graph_weight * graph_output
                )
            else:
                final_output = attention_output + graph_output
        else:
            final_output = attention_output

        return final_output.mean(axis=2)  # mean over heads → [B, M, D]

    def _edge_conv(self, value, senders, receivers, edge_weight, edge_mask,
                   indices_are_sorted, knn_table, B, M, D):
        v_flat = value.reshape(B * M, value.shape[2], D)
        if knn_table is not None:
            # k-in-regular plan (data/batching.regular_knn_table):
            # dense [B*M, k] gather + reduce — no scatter in the
            # forward; with the transposed table the BACKWARD is a
            # dense gather too (ops.graph_ops.knn_table_conv custom
            # VJP, round 5) instead of the take-VJP scatter
            idx, w, ridx, rw = (knn_table if len(knn_table) == 4
                                else (*knn_table, None, None))
            if ridx is not None:
                from difformer_tpu.ops.graph_ops import knn_table_conv

                g_flat = knn_table_conv(v_flat, idx, w, ridx, rw)
            else:
                g_flat = jnp.einsum(
                    "rk,rkhd->rhd", w.astype(v_flat.dtype),
                    jnp.take(v_flat, idx, axis=0))
        else:
            g_flat = gcn_conv(
                v_flat, senders, receivers, edge_weight,
                num_nodes=B * M, edge_mask=edge_mask,
                indices_are_sorted=indices_are_sorted,
            )
        return g_flat.reshape(B, M, value.shape[2], D)


class DIFFormerV2(nn.Module):
    """Batched DIFFormer encoder (reference ``DIFFormer_v2``,
    difformer-v2.py:165-223). Returns padded node embeddings [B, M, C]."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    num_heads: int = 1
    kernel: str = "simple"
    alpha: float = 0.5
    dropout: float = 0.5
    use_bn: bool = True
    use_residual: bool = True
    use_weight: bool = True
    use_graph: bool = True
    graph_weight: float = -1.0
    crossgraph_quirk: bool = False
    compute_dtype: str = ""          # e.g. 'bfloat16'; params stay f32

    @nn.compact
    def __call__(
        self,
        x_pad,
        node_mask,
        n_nodes,
        senders=None,
        receivers=None,
        edge_weight=None,
        edge_mask=None,
        *,
        train=False,
        indices_are_sorted=False,
        knn_table=None,
        dense_adj=None,
    ):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)

        if self.compute_dtype:
            x_pad = x_pad.astype(self.compute_dtype)
        x = TorchLinear(self.hidden_channels, name="fc_in")(x_pad)
        if self.use_bn:
            x = TorchLayerNorm(name="ln_0")(x)
        x = nn.relu(x)
        x = drop(x)

        prev = x
        for i in range(self.num_layers):
            x = TransConvV2(
                out_channels=self.hidden_channels,
                num_heads=self.num_heads,
                kernel=self.kernel,
                use_graph=self.use_graph,
                use_weight=self.use_weight,
                graph_weight=self.graph_weight,
                crossgraph_quirk=self.crossgraph_quirk,
                name=f"conv_{i}",
            )(x, node_mask, n_nodes, senders, receivers, edge_weight,
              edge_mask, indices_are_sorted, knn_table, dense_adj)
            if self.use_residual:
                x = self.alpha * x + (1 - self.alpha) * prev
            if self.use_bn:
                x = TorchLayerNorm(name=f"ln_{i + 1}")(x)
            x = drop(x)
            x = nn.relu(x)           # v2 extra activation (difformer-v2.py:217)
            prev = x

        x_out = TorchLinear(self.out_channels, name="fc_out")(x)
        x_out = drop(x_out)          # v2 output dropout (difformer-v2.py:222)
        if self.compute_dtype:
            x_out = x_out.astype(jnp.float32)
        return x_out


class GraphLevelModel(nn.Module):
    """Encode → pool → linear head (intended ``GraphGNN`` behavior,
    ``physical particle/models.py:13-36``)."""

    encoder: nn.Module
    out_channels: int = 1
    graph_pooling: str = "mean"      # 'sum' | 'mean' | 'max'

    @nn.compact
    def __call__(self, x_pad, node_mask, n_nodes, senders=None, receivers=None,
                 edge_weight=None, edge_mask=None, *, train=False,
                 indices_are_sorted=False, knn_table=None, dense_adj=None):
        h = self.encoder(
            x_pad, node_mask, n_nodes, senders, receivers, edge_weight,
            edge_mask, train=train, indices_are_sorted=indices_are_sorted,
            knn_table=knn_table, dense_adj=dense_adj,
        )                                            # [B, M, C]
        m = node_mask[..., None].astype(h.dtype)
        if self.graph_pooling == "sum":
            pooled = jnp.sum(h * m, axis=1)
        elif self.graph_pooling == "mean":
            pooled = jnp.sum(h * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        elif self.graph_pooling == "max":
            # large-negative (not -inf) fill keeps gradients NaN-free
            neg = jnp.where(node_mask[..., None], h, jnp.float32(-1e30))
            pooled = jnp.max(neg, axis=1)
            pooled = jnp.where(pooled <= -1e29, 0.0, pooled)
        else:
            raise ValueError(self.graph_pooling)
        return TorchLinear(self.out_channels, name="lin")(pooled)
