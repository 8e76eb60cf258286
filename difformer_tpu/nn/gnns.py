"""Baseline GNN zoo — capability parity with the reference's model layer
(``node classification/gnns.py``; graph-level variants
``physical particle/models.py``). All message passing is expressed on the
framework's single kernel layer (``ops.graph_ops.spmm`` / segment ops) —
where the reference pulls in PyG's C++ scatter kernels, every model here is
one fused gather/scatter under XLA (SURVEY.md §2.4/§2.5).

Calling convention matches DIFFormer: ``model.apply(vars, x, senders,
receivers, edge_weight=None, train=False, rngs=...)``. Models using
BatchNorm carry a ``batch_stats`` collection (torch ``BatchNorm1d`` parity).
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from difformer_tpu.nn.common import TorchLinear
from difformer_tpu.nn.init import make_torch_bias_init, torch_linear_kernel_init
from difformer_tpu.ops.graph_ops import gcn_norm, spmm
from difformer_tpu.ops.segment import segment_softmax, segment_sum


class _BN(nn.Module):
    """torch BatchNorm1d parity: eps 1e-5, momentum 0.1 (flax momentum 0.9)."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)


def _drop(x, rate, train, deterministic=None):
    return nn.Dropout(rate, deterministic=not train)(x)


class LINK(nn.Module):
    """Logistic regression on adjacency rows (``gnns.py:10-28``):
    logits = A @ W^T + b, where A is the (dense-viewed) adjacency. Computed
    sparsely: row i of A@W is the sum of W columns at i's neighbors."""

    num_nodes: int
    out_channels: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        n = self.num_nodes
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (n, self.out_channels)
        )
        bias = self.param(
            "bias", make_torch_bias_init(n), (self.out_channels,)
        )
        # A[row, col] = 1 → logits[row] = Σ_col W[col]; reference builds the
        # SparseTensor with (row, col) directly (gnns.py:23-27)
        vals = jnp.ones(senders.shape, jnp.float32)
        logits = spmm(vals, receivers, senders, kernel, num_nodes=n)
        return logits + bias


class MLP(nn.Module):
    """``gnns.py:31-64``: Linear → ReLU → BN → dropout stack."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, senders=None, receivers=None, edge_weight=None, *,
                 train=False, **kw):
        if self.num_layers == 1:
            return TorchLinear(self.out_channels)(x)
        for i in range(self.num_layers - 1):
            x = TorchLinear(self.hidden_channels, name=f"lin_{i}")(x)
            x = nn.relu(x)
            x = _BN(name=f"bn_{i}")(x, train)
            x = _drop(x, self.dropout, train)
        return TorchLinear(self.out_channels, name="lin_out")(x)


class SGC(nn.Module):
    """``gnns.py:66-115`` (SGCMem formulation — multiply weights first,
    then propagate K hops of gcn_norm'd adjacency; same math as SGConv)."""

    out_channels: int
    hops: int = 2
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        n = x.shape[0]
        x = TorchLinear(self.out_channels)(x)
        s, r, w = gcn_norm(senders, receivers, n, edge_weight,
                           add_self_loops=self.add_self_loops)
        for _ in range(self.hops):
            x = spmm(w, s, r, x, num_nodes=n)
        return x


class GCNLayer(nn.Module):
    """One GCNConv (gcn_norm + W; PyG semantics with self-loops)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None):
        n = x.shape[0]
        x = TorchLinear(self.out_channels, use_bias=False)(x)
        s, r, w = gcn_norm(senders, receivers, n, edge_weight)
        out = spmm(w, s, r, x, num_nodes=n)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,)
        )
        return out + bias


class GCN(nn.Module):
    """``gnns.py:118-161``: GCNConv → BN → relu → dropout stack."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        for i in range(self.num_layers - 1):
            x = GCNLayer(self.hidden_channels, name=f"conv_{i}")(
                x, senders, receivers, edge_weight
            )
            if self.use_bn:
                x = _BN(name=f"bn_{i}")(x, train)
            x = nn.relu(x)
            x = _drop(x, self.dropout, train)
        return GCNLayer(self.out_channels, name="conv_out")(
            x, senders, receivers, edge_weight
        )


class GATLayer(nn.Module):
    """GATConv parity (``gnns.py:163-201`` uses PyG GATConv): per-head
    additive attention with LeakyReLU(0.2), segment softmax over incoming
    edges, self-loops added, attention dropout."""

    out_channels: int
    heads: int = 2
    concat: bool = True
    dropout: float = 0.0
    negative_slope: float = 0.2
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, *, train=False):
        n, H, D = x.shape[0], self.heads, self.out_channels
        feat = TorchLinear(H * D, use_bias=False, name="lin")(x)
        feat = feat.reshape(n, H, D)
        a_src = self.param("att_src", nn.initializers.glorot_uniform(),
                           (1, H, D))
        a_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                           (1, H, D))
        alpha_src = jnp.sum(feat * a_src, axis=-1)   # [N, H]
        alpha_dst = jnp.sum(feat * a_dst, axis=-1)

        if self.add_self_loops:
            loop = jnp.arange(n, dtype=senders.dtype)
            senders = jnp.concatenate([senders, loop])
            receivers = jnp.concatenate([receivers, loop])

        e = alpha_src[senders] + alpha_dst[receivers]          # [E, H]
        e = nn.leaky_relu(e, negative_slope=self.negative_slope)
        att = segment_softmax(e, receivers, n)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        msg = feat[senders] * att[..., None]
        out = segment_sum(msg, receivers, n)                    # [N, H, D]
        bias_dim = H * D if self.concat else D
        bias = self.param("bias", nn.initializers.zeros, (bias_dim,))
        if self.concat:
            return out.reshape(n, H * D) + bias
        return out.mean(axis=1) + bias


class GAT(nn.Module):
    """``gnns.py:163-201``: GATConv stack with elu."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = False
    heads: int = 2
    out_heads: int = 1

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        for i in range(self.num_layers - 1):
            x = GATLayer(self.hidden_channels, heads=self.heads, concat=True,
                         dropout=self.dropout, name=f"conv_{i}")(
                x, senders, receivers, train=train
            )
            if self.use_bn:
                x = _BN(name=f"bn_{i}")(x, train)
            x = nn.elu(x)
            x = _drop(x, self.dropout, train)
        return GATLayer(self.out_channels, heads=self.out_heads, concat=False,
                        dropout=self.dropout, name="conv_out")(
            x, senders, receivers, train=train
        )


def multi_lp(senders, receivers, label, train_idx, num_nodes, out_channels,
             *, alpha=0.9, hops=1, num_iters=50, mult_bin=False,
             edge_weight=None):
    """Label propagation (``gnns.py:203-253``): iterate
    ``result = α·Â^h·result + (1−α)·y``. Functional (no params)."""
    s, r, w = gcn_norm(
        jnp.asarray(senders), jnp.asarray(receivers), num_nodes,
        edge_weight, add_self_loops=False,
    )
    label = np.asarray(label)
    train_mask = np.zeros(num_nodes, bool)
    train_mask[np.asarray(train_idx)] = True
    if label.ndim == 1 or label.shape[-1] == 1:
        flat = label.reshape(-1).astype(np.int64)
        y = np.zeros((num_nodes, out_channels), np.float32)
        sel = train_mask & (flat >= 0)
        y[sel, flat[sel]] = 1.0
    elif mult_bin:
        t = label.shape[1]
        y = np.zeros((num_nodes, 2 * t), np.float32)
        for task in range(t):
            sel = train_mask
            y[sel, 2 * task + label[sel, task].astype(np.int64)] = 1.0
    else:
        y = np.zeros((num_nodes, out_channels), np.float32)
        y[train_mask] = label[train_mask]
    y = jnp.asarray(y)

    def body(result, _):
        for _ in range(hops):
            result = spmm(w, s, r, result, num_nodes=num_nodes)
        result = alpha * result + (1 - alpha) * y
        return result, None

    result, _ = jax.lax.scan(body, y, None, length=num_iters)
    if mult_bin:
        t = label.shape[1]
        result = result.reshape(num_nodes, t, 2)[:, :, 1]
    return result


class MixHopLayer(nn.Module):
    """``gnns.py:256-278``: concat of per-power projections Â^j X W_j."""

    out_channels: int
    hops: int = 2

    @nn.compact
    def __call__(self, x, s, r, w):
        n = x.shape[0]
        xs = [TorchLinear(self.out_channels, name="lin_0")(x)]
        for j in range(1, self.hops + 1):
            x_j = TorchLinear(self.out_channels, name=f"lin_{j}")(x)
            for _ in range(j):
                x_j = spmm(w, s, r, x_j, num_nodes=n)
            xs.append(x_j)
        return jnp.concatenate(xs, axis=1)


class MixHop(nn.Module):
    """``gnns.py:280-341``: MixHop layers (adjacency powers 0..hops,
    gcn_norm WITHOUT self-loops) + final linear projection."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    hops: int = 2

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        n = x.shape[0]
        s, r, w = gcn_norm(senders, receivers, n, edge_weight,
                           add_self_loops=False)
        for i in range(self.num_layers - 1):
            x = MixHopLayer(self.hidden_channels, hops=self.hops,
                            name=f"conv_{i}")(x, s, r, w)
            x = _BN(name=f"bn_{i}")(x, train)
            x = nn.relu(x)
            x = _drop(x, self.dropout, train)
        x = MixHopLayer(self.out_channels, hops=self.hops, name="conv_out")(
            x, s, r, w
        )
        return TorchLinear(self.out_channels, name="final_project")(x)


class _JK(nn.Module):
    """JumpingKnowledge 'max' | 'cat' | 'lstm' (PyG parity: bi-LSTM over the
    layer sequence, scalar attention scores, softmax-weighted sum)."""

    mode: str = "max"

    @nn.compact
    def __call__(self, xs):
        if self.mode == "max":
            return jnp.max(jnp.stack(xs, axis=0), axis=0)
        if self.mode == "cat":
            return jnp.concatenate(xs, axis=-1)
        if self.mode == "lstm":
            seq = jnp.stack(xs, axis=0)              # [L, N, C]
            L, n, c = seq.shape
            hid = c  # PyG uses channels as the LSTM hidden size

            def run(cell, s):
                carry = cell.initialize_carry(jax.random.PRNGKey(0), (n, c))
                ys = []
                for t in range(s.shape[0]):
                    carry, y = cell(carry, s[t])
                    ys.append(y)
                return jnp.stack(ys, axis=0)

            fwd = run(nn.OptimizedLSTMCell(hid, name="lstm_fwd"), seq)
            bwd = run(nn.OptimizedLSTMCell(hid, name="lstm_bwd"),
                      seq[::-1])[::-1]
            h = jnp.concatenate([fwd, bwd], axis=-1)  # [L, N, 2C]
            score = TorchLinear(1, name="att")(h)[..., 0]      # [L, N]
            alpha = jax.nn.softmax(score, axis=0)
            return jnp.sum(seq * alpha[..., None], axis=0)
        raise NotImplementedError(f"JK mode {self.mode!r}")


class GCNJK(nn.Module):
    """``gnns.py:343-390``: GCN stack with jumping knowledge."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    jk_type: str = "max"

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        xs = []
        for i in range(self.num_layers - 1):
            x = GCNLayer(self.hidden_channels, name=f"conv_{i}")(
                x, senders, receivers, edge_weight
            )
            x = _BN(name=f"bn_{i}")(x, train)
            x = nn.relu(x)
            xs.append(x)
            x = _drop(x, self.dropout, train)
        x = GCNLayer(self.hidden_channels, name="conv_out")(
            x, senders, receivers, edge_weight
        )
        xs.append(x)
        x = _JK(self.jk_type)(xs)
        return TorchLinear(self.out_channels, name="final_project")(x)


class GATJK(nn.Module):
    """``gnns.py:392-443``: GAT stack with jumping knowledge, elu."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    heads: int = 2
    jk_type: str = "max"

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        xs = []
        for i in range(self.num_layers - 1):
            x = GATLayer(self.hidden_channels, heads=self.heads, concat=True,
                         name=f"conv_{i}")(x, senders, receivers, train=train)
            x = _BN(name=f"bn_{i}")(x, train)
            x = nn.elu(x)
            xs.append(x)
            x = _drop(x, self.dropout, train)
        x = GATLayer(self.hidden_channels, heads=self.heads, concat=True,
                     name="conv_out")(x, senders, receivers, train=train)
        xs.append(x)
        x = _JK(self.jk_type)(xs)
        return TorchLinear(self.out_channels, name="final_project")(x)


class H2GCN(nn.Module):
    """H2GCN-style model: ego/1-hop/2-hop separation
    (``gnns.py:445-456`` defines only the conv; the full model is referenced
    but missing in the reference — ``image and text/parse.py:58-62`` dead
    path. Implemented here as: embed → K rounds of [Â·x ‖ Â²·x] → concat all
    rounds → final projection, per the H2GCN paper's design)."""

    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        n = x.shape[0]
        # 1-hop: no self loops (H2GCN removes them); 2-hop via double prop
        s, r, w = gcn_norm(senders, receivers, n, edge_weight,
                           add_self_loops=False)
        x = nn.relu(TorchLinear(self.hidden_channels, name="embed")(x))
        xs = [x]
        h = x
        for i in range(self.num_layers):
            h1 = spmm(w, s, r, h, num_nodes=n)
            h2 = spmm(w, s, r, h1, num_nodes=n)
            h = jnp.concatenate([h1, h2], axis=1)
            xs.append(h)
        out = jnp.concatenate(xs, axis=1)
        out = _drop(out, self.dropout, train)
        return TorchLinear(self.out_channels, name="final_project")(out)


class APPNPNet(nn.Module):
    """``gnns.py:459-477``: MLP + personalized-pagerank propagation
    (PyG APPNP: K iterations of x ← (1−α)·Â·x + α·x₀)."""

    hidden_channels: int
    out_channels: int
    dropout: float = 0.5
    K: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        n = x.shape[0]
        x = _drop(x, self.dropout, train)
        x = nn.relu(TorchLinear(self.hidden_channels, name="lin1")(x))
        x = _drop(x, self.dropout, train)
        x = TorchLinear(self.out_channels, name="lin2")(x)
        s, r, w = gcn_norm(senders, receivers, n, edge_weight)
        x0 = x
        for _ in range(self.K):
            x = (1 - self.alpha) * spmm(w, s, r, x, num_nodes=n) \
                + self.alpha * x0
        return x


class GPRGNN(nn.Module):
    """``gnns.py:479-580``: MLP + learnable generalized-pagerank filter
    (γ_k coefficients, PPR init)."""

    hidden_channels: int
    out_channels: int
    dropout: float = 0.5
    dprate: float = 0.5
    K: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        n = x.shape[0]
        x = _drop(x, self.dropout, train)
        x = nn.relu(TorchLinear(self.hidden_channels, name="lin1")(x))
        x = _drop(x, self.dropout, train)
        x = TorchLinear(self.out_channels, name="lin2")(x)

        def ppr_init(key, shape, dtype=jnp.float32):
            k = np.arange(self.K + 1)
            temp = self.alpha * (1 - self.alpha) ** k
            temp[-1] = (1 - self.alpha) ** self.K
            return jnp.asarray(temp, dtype)

        gamma = self.param("temp", ppr_init, (self.K + 1,))
        x = _drop(x, self.dprate, train)
        s, r, w = gcn_norm(senders, receivers, n, edge_weight)
        hidden = x * gamma[0]
        for k in range(self.K):
            x = spmm(w, s, r, x, num_nodes=n)
            hidden = hidden + gamma[k + 1] * x
        return hidden
