"""Temporal baselines: DCRNN (diffusion-convolutional GRU) and MPNN-LSTM.

Reference: ``spatial-temporal/gnns.py:15-362``. Notes on deviations
(documented per SURVEY.md §7.3 policy):

* The reference ``DConv`` densifies the adjacency every call
  (``to_dense_adj``, ``gnns.py:63``) — O(N²) memory — and indexes the
  in-degree at the *forward* source (``deg_in_inv[row]``, ``gnns.py:79``)
  while propagating over edges re-sorted by ``dense_to_sparse``, a known
  misalignment vs the published DCRNN operator. We implement the *intended*
  operator (as in torch_geometric_temporal's DConv): dual-direction
  random-walk diffusion with Chebyshev recurrence, fully sparse.
* Reference's Chebyshev state update (``gnns.py:109-117``) never advances
  ``Tx_1``; we use the standard recurrence.
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from difformer_tpu.nn.common import TorchLinear
from difformer_tpu.ops.graph_ops import spmm
from difformer_tpu.ops.segment import segment_sum


class DConv(nn.Module):
    """Diffusion convolution (DCRNN): Σ_dir Σ_k T_k(P_dir) X W[dir,k].

    P_fwd = D_O^{-1}A walked backwards (out[i] = Σ_j A[j,i] x[j]/deg_out[j]),
    P_rev the transpose analog with in-degrees. K = number of Chebyshev
    terms (reference weight shape [2, K, in, out], ``gnns.py:32``).
    """

    out_channels: int
    K: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None):
        n, fin = x.shape
        if edge_weight is None:
            edge_weight = jnp.ones(senders.shape, jnp.float32)
        weight = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (2, self.K, fin, self.out_channels),
        )

        deg_out = segment_sum(edge_weight, senders, n)
        deg_in = segment_sum(edge_weight, receivers, n)
        inv = lambda d: jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        w_fwd = edge_weight * inv(deg_out)[senders]      # j→i weight/deg_out[j]
        w_rev = edge_weight * inv(deg_in)[receivers]     # i←j weight/deg_in[j]

        def p_fwd(h):
            return spmm(w_fwd, senders, receivers, h, num_nodes=n)

        def p_rev(h):
            return spmm(w_rev, receivers, senders, h, num_nodes=n)

        H = x @ weight[0, 0] + x @ weight[1, 0]
        if self.K > 1:
            tx1_o, tx1_i = p_fwd(x), p_rev(x)
            H = H + tx1_o @ weight[0, 1] + tx1_i @ weight[1, 1]
            tx0_o = tx0_i = x
            for k in range(2, self.K):
                tx2_o = 2.0 * p_fwd(tx1_o) - tx0_o
                tx2_i = 2.0 * p_rev(tx1_i) - tx0_i
                H = H + tx2_o @ weight[0, k] + tx2_i @ weight[1, k]
                tx0_o, tx1_o = tx1_o, tx2_o
                tx0_i, tx1_i = tx1_i, tx2_i
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,))
            H = H + bias
        return H


class DCRNN(nn.Module):
    """Diffusion-convolutional GRU cell + output head (reference ``DC_RNN``,
    ``gnns.py:126-247``): gates z/r/h̃ are DConvs over [X ‖ H]."""

    hidden_channels: int
    out_channels: int
    K: int = 2

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, h=None, *,
                 train=False, return_state=False, **kw):
        if h is None:
            h = jnp.zeros((x.shape[0], self.hidden_channels), x.dtype)
        z = nn.sigmoid(
            DConv(self.hidden_channels, self.K, name="conv_x_z")(
                jnp.concatenate([x, h], axis=1), senders, receivers,
                edge_weight,
            )
        )
        r = nn.sigmoid(
            DConv(self.hidden_channels, self.K, name="conv_x_r")(
                jnp.concatenate([x, h], axis=1), senders, receivers,
                edge_weight,
            )
        )
        h_tilde = nn.tanh(
            DConv(self.hidden_channels, self.K, name="conv_x_h")(
                jnp.concatenate([x, h * r], axis=1), senders, receivers,
                edge_weight,
            )
        )
        h_new = z * h + (1 - z) * h_tilde
        out = TorchLinear(self.out_channels, name="output_linear")(h_new)
        if return_state:
            return out, h_new
        return out


class MPNNLSTM(nn.Module):
    """MPNN-LSTM (reference ``MPNN_LSTM``, ``gnns.py:250-362``): input is a
    window of snapshots stacked on the node axis [window·N, F]; two
    GCN+BN+dropout blocks, two stacked LSTMs over the window, head on
    [h_lstm1 ‖ h_lstm2 ‖ skip] → scalar per node."""

    hidden_channels: int
    out_channels: int
    num_nodes: int
    window: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, senders, receivers, edge_weight=None, *,
                 train=False, **kw):
        from difformer_tpu.nn.gnns import GCNLayer, _BN

        W, n, fin = self.window, self.num_nodes, x.shape[-1]

        # skip connection: step-0 features ⊕ last feature of later steps
        s = x.reshape(W, n, fin).transpose(1, 0, 2)        # [n, W, F]
        skip = jnp.concatenate(
            [s[:, 0, :]] + [s[:, l, fin - 1:fin] for l in range(1, W)], axis=1
        )                                                   # [n, F + W - 1]

        h = x
        rs = []
        for i in range(2):
            h = nn.relu(
                GCNLayer(self.hidden_channels, name=f"conv_{i + 1}")(
                    h, senders, receivers, edge_weight
                )
            )
            h = _BN(name=f"bn_{i + 1}")(h, train)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            rs.append(h)
        h = jnp.concatenate(rs, axis=1)                     # [W·n, 2·hid]

        seq = h.reshape(W, n, 2 * self.hidden_channels)     # time-major

        def run_lstm(seq, feat, name):
            # window is small (≤14); unrolled loop keeps flax module calls
            # out of lax.scan (param sharing across steps, XLA unrolls fine)
            cell = nn.OptimizedLSTMCell(self.hidden_channels, name=name)
            carry = cell.initialize_carry(
                jax.random.PRNGKey(0), (seq.shape[1], feat)
            )
            ys = []
            for t in range(seq.shape[0]):
                carry, yt = cell(carry, seq[t])
                ys.append(yt)
            (c_f, h_f) = carry
            return h_f, jnp.stack(ys, axis=0)

        h1, ys1 = run_lstm(seq, 2 * self.hidden_channels, "lstm_1")
        h2, _ = run_lstm(ys1, self.hidden_channels, "lstm_2")

        out = jnp.concatenate([h1, h2, skip], axis=1)
        return TorchLinear(self.out_channels, name="head")(out).reshape(-1)
