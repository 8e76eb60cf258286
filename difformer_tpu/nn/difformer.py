"""DIFFormer (v1): energy-constrained diffusion transformer for one graph.

Reference: ``node classification/difformer.py:81-226`` (superset variant with
``graph_weight`` and ``use_source``; the image-text / spatial-temporal copies
are the same module minus those two flags). Architecture per layer:

    q, k, v = Wq(x), Wk(x), Wv(x)          # [N, H, D]
    a = global_attention(q, k, v)          # 'simple' (O(N)) or 'sigmoid' (O(N²))
    g = gcn_conv(v, edge_index)            # optional graph branch
    h = a + g   |   (1-w)·a + w·g          # graph_weight blend
    h = mean over heads [+ x_0]            # use_source adds layer-0 features
    x = α·h + (1-α)·x_prev                 # residual vs *previous* layer
    x = LayerNorm(x); dropout

Parity notes (SURVEY.md §7.3): the residual mixes with the previous layer,
not x₀ (``difformer.py:199-201``); ``use_bn`` means LayerNorm; input block is
Linear → LayerNorm → ReLU → dropout (``difformer.py:188-192``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from difformer_tpu.nn.common import TorchLayerNorm, TorchLinear
from difformer_tpu.ops.graph_ops import gcn_conv
from difformer_tpu.ops.linear_attention import simple_attention
from difformer_tpu.ops.sigmoid_attention import (
    sigmoid_attention,
    sigmoid_attention_dense,
)


class DIFFormerConv(nn.Module):
    """One DIFFormer layer (reference ``DIFFormerConv``, difformer.py:81-145)."""

    out_channels: int
    num_heads: int = 1
    kernel: str = "simple"          # 'simple' | 'sigmoid'
    use_graph: bool = True
    use_weight: bool = True
    graph_weight: float = -1.0
    use_source: bool = False
    axis_name: Optional[str] = None  # mesh axis for node-sharded execution
    remat: bool = False              # jax.checkpoint the branch computations
    # fuse_head_mean: compute the layer's mean-over-heads output [N, D]
    # WITHOUT materializing the [N, H, D] per-head branch outputs (round 5,
    # VERDICT r4 weak 1: ~30 ms of [N, H, D] activation streaming at the
    # clustered H=8 headline). The mean commutes with every op involved —
    # attention (per-head division kept exactly, h+m contracted in one
    # matmul: ops/linear_attention.simple_attention(head_mean=True)), the
    # linear GCN branch (conv of the head-averaged value, or the
    # head-averaged Wv under spmm_first), and the graph_weight blend — so
    # the deviation is float reassociation only (equivalence-tested).
    # False keeps the exact reference order (mean after stacking heads,
    # difformer.py:130); "auto" (default) fuses for H > 1 simple-kernel
    # paths without output_attn.
    fuse_head_mean: object = "auto"  # False | True | "auto"
    # spmm_first: compute the GCN branch as (Â·X)·Wv instead of Â·(X·Wv).
    # SpMM commutes with the right-matmul (the bias term is corrected via a
    # ones column: Â(XW + 1bᵀ) = (ÂX)W + (Â1)bᵀ), so the per-edge gather
    # width drops from H·D to F+1 — an ~8× gather-byte cut at H=8, on the
    # op that is the measured step bottleneck (BENCH_NOTES roofline: H=8
    # rows are gather-byte-bound). False (library default) keeps exact
    # reference operation order (difformer.py:130 applies gcn_conv to the
    # value projections); True forces the rewrite; "auto" (the Config/CLI
    # default) enables it when H·D ≥ 2·(F+1) — i.e. when the rewrite cuts
    # gather bytes ≥2×, safely above the measured H=1 parity point and on
    # for every measured win (BENCH_NOTES r3 "spmm_first": 2.9–4.0× at
    # H=8). Results differ from reference order only by float
    # reassociation.
    spmm_first: object = False      # False | True | "auto"

    @nn.compact
    def __call__(
        self,
        query_input,
        source_input,
        senders=None,
        receivers=None,
        edge_weight=None,
        x_0=None,
        *,
        node_mask=None,
        edge_mask=None,
        num_nodes_global=None,
        indices_are_sorted=False,
        output_attn=False,
        ell=None,
        halo=None,
        edge_chunk_size=None,
    ):
        H, D = self.num_heads, self.out_channels

        # head-mean fusion policy (see field comment): both branches emit
        # [N, D] directly and the final mean-over-heads disappears
        fuse_mean = self.fuse_head_mean
        if fuse_mean == "auto":
            fuse_mean = H > 1
        fuse_mean = (
            bool(fuse_mean) and self.kernel == "simple" and not output_attn
            and (self.use_weight or H == 1)
        )
        # under fusion with a value projection, Wv is FACTORED through the
        # key aggregates (simple_attention_head_mean_factored) and through
        # the head-averaged kernel in the graph branch — the [N, H, D]
        # value tensor never exists
        factored = fuse_mean and self.use_weight

        query = TorchLinear(D * H, name="Wq")(query_input).reshape(-1, H, D)
        key = TorchLinear(D * H, name="Wk")(source_input).reshape(-1, H, D)
        value = None
        if self.use_weight:
            wv = TorchLinear(D * H, name="Wv")
            if factored:
                wv(source_input[:1])    # create params; output DCE'd
            else:
                value = wv(source_input).reshape(-1, H, D)
        else:
            # reference difformer.py:120 — raw features as a single head
            value = source_input.reshape(-1, 1, D)
        if factored:
            p_wv = self.variables["params"]["Wv"]
            wv_k3 = p_wv["kernel"].reshape(-1, H, D)       # [F, H, D]
            wv_b2 = p_wv["bias"].reshape(H, D)             # [H, D]

        # optional rematerialization: recompute branch activations in the
        # backward pass instead of storing [N/E, H, D] intermediates
        ckpt = jax.checkpoint if self.remat else (lambda f: f)

        attn = None
        if self.kernel == "simple":
            if output_attn:
                result = simple_attention(
                    query, key, value, key_mask=node_mask,
                    num_queries=num_nodes_global, output_attn=True,
                    axis_name=self.axis_name,
                )
                attention_output, attn = result
            elif factored:
                from difformer_tpu.ops.linear_attention import (
                    simple_attention_head_mean_factored,
                )

                attention_output = ckpt(
                    lambda q, k, xx: simple_attention_head_mean_factored(
                        q, k, xx, wv_k3, wv_b2, key_mask=node_mask,
                        num_queries=num_nodes_global,
                        axis_name=self.axis_name,
                    )
                )(query, key, source_input)
            else:
                attention_output = ckpt(
                    lambda q, k, v: simple_attention(
                        q, k, v, key_mask=node_mask,
                        num_queries=num_nodes_global,
                        axis_name=self.axis_name,
                        head_mean=fuse_mean,
                    )
                )(query, key, value)
        elif self.kernel == "sigmoid":
            if output_attn:
                attention_output, attn = sigmoid_attention_dense(
                    query, key, value, key_mask=node_mask, output_attn=True
                )
            elif self.axis_name is not None:
                from difformer_tpu.parallel.sharded_ops import (
                    sigmoid_attention_sharded,
                )

                attention_output = sigmoid_attention_sharded(
                    query, key, value, key_mask=node_mask,
                    axis_name=self.axis_name,
                )
            else:
                attention_output = sigmoid_attention(
                    query, key, value, key_mask=node_mask
                )
        else:
            raise ValueError(f"unknown kernel {self.kernel!r}")

        # spmm_first applies where the branch input is a linear projection
        # of source_input; every operator path handles arbitrary trailing
        # width, and on the sharded paths the win doubles: the halo
        # all_to_all / all_gather ships F+1-wide feature rows instead of
        # H·D-wide value rows (8× less ICI wire at H=8)
        spmm_first = self.spmm_first
        if spmm_first == "auto":
            # enable when the per-edge gather-byte cut is ≥2× (see the
            # field comment); at H=1 with D=F the rewrite is measured
            # parity-to-slightly-worse, so auto keeps reference order there
            spmm_first = H * D >= 2 * (source_input.shape[-1] + 1)
        spmm_first = (
            bool(spmm_first) and self.use_graph and self.use_weight
            and not output_attn
        )

        if self.use_graph:
            if spmm_first:
                ones = jnp.ones((source_input.shape[0], 1),
                                dtype=source_input.dtype)
                x_aug = jnp.concatenate([source_input, ones],
                                        axis=-1)[:, None, :]   # [N, 1, F+1]

                def spmm(x_aug):
                    if ell is not None:
                        from difformer_tpu.ops.ell import gcn_conv_ell

                        return gcn_conv_ell(x_aug, ell[0], ell[1])
                    if self.axis_name is not None and halo is not None:
                        from difformer_tpu.parallel import sharded_ops as so

                        if isinstance(halo, dict):
                            return so.gcn_conv_halo_overlap(
                                x_aug, halo, axis_name=self.axis_name)
                        send_idx, send_mask, edge_value = halo
                        return so.gcn_conv_halo(
                            x_aug, senders, receivers, edge_value,
                            send_idx, send_mask, axis_name=self.axis_name)
                    if self.axis_name is not None:
                        from difformer_tpu.parallel.sharded_ops import (
                            gcn_conv_sharded,
                        )

                        return gcn_conv_sharded(
                            x_aug, senders, receivers, edge_weight,
                            edge_mask=edge_mask, axis_name=self.axis_name)
                    return gcn_conv(
                        x_aug, senders, receivers, edge_weight,
                        edge_mask=edge_mask,
                        indices_are_sorted=indices_are_sorted,
                        edge_chunk_size=edge_chunk_size,
                    )

                if fuse_mean:
                    # head-mean folded into the projection: the branch is
                    # linear in Wv, so mean_h((ÂX)W_h + r·b_h) =
                    # (ÂX)·W̄ + r·b̄ — [N, D] out, H× fewer matmul FLOPs,
                    # and no [N, H, D] graph tensor ever exists
                    p_wv = self.variables["params"]["Wv"]
                    k_mean = p_wv["kernel"].reshape(-1, H, D).mean(axis=1)
                    b_mean = p_wv["bias"].reshape(H, D).mean(axis=0)

                    def branch(x_aug):
                        u = spmm(x_aug)[:, 0]         # [N, F+1]
                        u_x, rowsum = u[:, :-1], u[:, -1:]
                        # unfused: wv(u_x) + (r−1)·b = u_x·W + r·b per head
                        return (u_x @ k_mean.astype(u.dtype)
                                + rowsum * b_mean.astype(u.dtype))
                else:
                    def branch(x_aug):
                        u = spmm(x_aug)[:, 0]         # [N, F+1]
                        u_x, rowsum = u[:, :-1], u[:, -1:]
                        # (ÂX)W + (Â1)bᵀ: wv(u_x) carries +b, correct by
                        # (r−1)b
                        bias = wv(jnp.zeros((1,) + source_input.shape[1:],
                                            source_input.dtype))
                        return (wv(u_x)
                                + (rowsum - 1.0) * bias).reshape(-1, H, D)

                graph_output = ckpt(branch)(x_aug)
            else:
                # the conv is linear per (head, channel), so the head mean
                # commutes with it: conv the head-AVERAGED value ([N, 1, D]
                # — H× fewer gather bytes AND no [N, H, D] graph output);
                # under the factored path the head-averaged value comes
                # straight from the head-averaged projection
                if factored:
                    conv_in = (source_input @ wv_k3.mean(axis=1).astype(
                        source_input.dtype) + wv_b2.mean(axis=0).astype(
                        source_input.dtype))[:, None, :]
                elif fuse_mean:
                    conv_in = value.mean(axis=1, keepdims=True)
                else:
                    conv_in = value
                if ell is not None:
                    # scatter-free degree-bucketed ELL path (ops/ell.py)
                    from difformer_tpu.ops.ell import gcn_conv_ell

                    graph_output = gcn_conv_ell(conv_in, ell[0], ell[1])
                elif self.axis_name is not None and halo is not None:
                    # boundary-only all_to_all exchange
                    # (parallel/sharded_ops)
                    if isinstance(halo, dict):
                        from difformer_tpu.parallel.sharded_ops import (
                            gcn_conv_halo_overlap,
                        )

                        graph_output = gcn_conv_halo_overlap(
                            conv_in, halo, axis_name=self.axis_name
                        )
                    else:
                        from difformer_tpu.parallel.sharded_ops import (
                            gcn_conv_halo,
                        )

                        send_idx, send_mask, edge_value = halo
                        graph_output = gcn_conv_halo(
                            conv_in, senders, receivers, edge_value,
                            send_idx, send_mask, axis_name=self.axis_name,
                        )
                elif self.axis_name is not None:
                    from difformer_tpu.parallel.sharded_ops import (
                        gcn_conv_sharded,
                    )

                    graph_output = gcn_conv_sharded(
                        conv_in, senders, receivers, edge_weight,
                        edge_mask=edge_mask, axis_name=self.axis_name,
                    )
                else:
                    graph_output = ckpt(
                        lambda v: gcn_conv(
                            v, senders, receivers, edge_weight,
                            edge_mask=edge_mask,
                            indices_are_sorted=indices_are_sorted,
                            edge_chunk_size=edge_chunk_size,
                        )
                    )(conv_in)
                if fuse_mean:
                    graph_output = graph_output[:, 0]       # [N, D]
            if self.graph_weight > 0:
                final_output = (
                    (1 - self.graph_weight) * attention_output
                    + self.graph_weight * graph_output
                )
            else:
                final_output = attention_output + graph_output
        else:
            final_output = attention_output

        if not fuse_mean:
            final_output = final_output.mean(axis=1)

        if self.use_source:
            final_output = final_output + x_0

        if output_attn:
            return final_output, attn
        return final_output


class DIFFormer(nn.Module):
    """Full DIFFormer model (reference ``DIFFormer``, difformer.py:147-226)."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    num_heads: int = 1
    kernel: str = "simple"
    alpha: float = 0.5
    dropout: float = 0.5
    use_bn: bool = True             # LayerNorm (reference naming)
    use_residual: bool = True
    use_weight: bool = True
    use_graph: bool = True
    graph_weight: float = -1.0
    use_source: bool = False
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None   # e.g. 'bfloat16'; params stay f32
    remat: bool = False
    spmm_first: object = False      # False | True | "auto" — see DIFFormerConv
    fuse_head_mean: object = "auto"  # False | True | "auto" — see DIFFormerConv

    def _conv(self, i):
        return DIFFormerConv(
            out_channels=self.hidden_channels,
            num_heads=self.num_heads,
            kernel=self.kernel,
            use_graph=self.use_graph,
            use_weight=self.use_weight,
            graph_weight=self.graph_weight,
            use_source=self.use_source,
            axis_name=self.axis_name,
            remat=self.remat,
            spmm_first=self.spmm_first,
            fuse_head_mean=self.fuse_head_mean,
            name=f"conv_{i}",
        )

    @nn.compact
    def __call__(
        self,
        x,
        senders=None,
        receivers=None,
        edge_weight=None,
        *,
        node_mask=None,
        edge_mask=None,
        num_nodes_global=None,
        indices_are_sorted=False,
        train=False,
        output_attn=False,
        ell=None,
        halo=None,
        edge_chunk_size=None,
    ):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)

        if self.compute_dtype is not None:
            # bf16 activations keep the MXU fed; reductions that need f32
            # (Frobenius norms, attention denominators, LayerNorm stats)
            # already upcast internally.
            x = x.astype(self.compute_dtype)

        # input MLP block (difformer.py:188-192)
        x = TorchLinear(self.hidden_channels, name="fc_in")(x)
        if self.use_bn:
            x = TorchLayerNorm(name="ln_0")(x)
        x = nn.relu(x)
        x = drop(x)

        x_0 = x
        prev = x
        attentions = []
        for i in range(self.num_layers):
            out = self._conv(i)(
                x, x, senders, receivers, edge_weight, x_0,
                node_mask=node_mask,
                edge_mask=edge_mask,
                num_nodes_global=num_nodes_global,
                indices_are_sorted=indices_are_sorted,
                output_attn=output_attn,
                ell=ell,
                halo=halo,
                edge_chunk_size=edge_chunk_size,
            )
            if output_attn:
                x, attn = out
                attentions.append(attn)
            else:
                x = out
            if self.use_residual:
                x = self.alpha * x + (1 - self.alpha) * prev
            if self.use_bn:
                x = TorchLayerNorm(name=f"ln_{i + 1}")(x)
            x = drop(x)
            prev = x

        x_out = TorchLinear(self.out_channels, name="fc_out")(x)
        if self.compute_dtype is not None:
            x_out = x_out.astype(jnp.float32)   # logits/loss in f32
        if output_attn:
            return x_out, jnp.stack(attentions, axis=0)
        return x_out
