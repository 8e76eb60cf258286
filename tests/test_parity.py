"""Whole-model activation parity: the flax DIFFormer with given parameters
must match a direct numpy transcription of the reference forward pass
(``node classification/difformer.py:184-209``) to fp32 tolerance — the
BASELINE.md 'per-layer activations allclose' requirement, with the torch
reference replaced by an independent numpy implementation of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difformer_tpu.nn import DIFFormer


def np_layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_linear(x, kernel, bias):
    return x @ kernel + bias


def np_gcn_conv(x, senders, receivers, n):
    d = np.zeros(n)
    np.add.at(d, receivers, 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.sqrt(1.0 / d)
    val = np.nan_to_num(inv[receivers] * inv[senders], nan=0.0, posinf=0.0,
                        neginf=0.0)
    out = np.zeros_like(x)
    np.add.at(out, receivers,
              val.reshape(-1, *([1] * (x.ndim - 1))) * x[senders])
    return out


def np_simple_attention(q, k, v):
    q = q / np.linalg.norm(q)
    k = k / np.linalg.norm(k)
    kv = np.einsum("lhm,lhd->hmd", k, v)
    num = np.einsum("nhm,hmd->nhd", q, kv) + v.sum(0)[None]
    den = np.einsum("nhm,hm->nh", q, k.sum(0)) + q.shape[0]
    return num / den[..., None]


def np_sigmoid_attention(q, k, v):
    s = 1.0 / (1.0 + np.exp(-np.einsum("nhm,lhm->nlh", q, k)))
    return np.einsum("nlh,lhd->nhd", s / s.sum(1, keepdims=True), v)


def reference_forward(params, x, senders, receivers, *, num_layers, heads,
                      hidden, kernel, alpha, use_graph=True,
                      graph_weight=-1.0, use_source=False,
                      use_residual=True, use_bn=True):
    """Numpy transcription of DIFFormer.forward (difformer.py:184-209)."""
    n = x.shape[0]
    p = params
    x = np_linear(x, p["fc_in"]["kernel"], p["fc_in"]["bias"])
    if use_bn:
        ln = p["ln_0"]["LayerNorm_0"]
        x = np_layernorm(x, ln["scale"], ln["bias"])
    x = np.maximum(x, 0.0)
    x0 = x
    prev = x
    for i in range(num_layers):
        c = p[f"conv_{i}"]
        q = np_linear(x, c["Wq"]["kernel"], c["Wq"]["bias"]).reshape(
            n, heads, hidden
        )
        k = np_linear(x, c["Wk"]["kernel"], c["Wk"]["bias"]).reshape(
            n, heads, hidden
        )
        v = np_linear(x, c["Wv"]["kernel"], c["Wv"]["bias"]).reshape(
            n, heads, hidden
        )
        if kernel == "simple":
            att = np_simple_attention(q, k, v)
        else:
            att = np_sigmoid_attention(q, k, v)
        if use_graph:
            g = np_gcn_conv(v, senders, receivers, n)
            if graph_weight > 0:
                out = (1 - graph_weight) * att + graph_weight * g
            else:
                out = att + g
        else:
            out = att
        out = out.mean(axis=1)
        if use_source:
            out = out + x0
        x = out
        if use_residual:
            x = alpha * x + (1 - alpha) * prev
        if use_bn:
            ln = p[f"ln_{i + 1}"]["LayerNorm_0"]
            x = np_layernorm(x, ln["scale"], ln["bias"])
        prev = x
    return np_linear(x, p["fc_out"]["kernel"], p["fc_out"]["bias"])


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
@pytest.mark.parametrize(
    "flags",
    [
        dict(),
        dict(graph_weight=0.7),
        dict(use_source=True),
        dict(use_graph=False),
        dict(use_residual=False, use_bn=False),
    ],
)
def test_model_forward_parity(rng, kernel, flags):
    n, e, f, c, h, heads, L = 60, 240, 10, 4, 12, 2, 3
    x = rng.normal(size=(n, f)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)

    model = DIFFormer(hidden_channels=h, out_channels=c, num_layers=L,
                      num_heads=heads, kernel=kernel, dropout=0.0, **flags)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(senders),
        jnp.asarray(receivers), train=False,
    )
    out_flax = np.asarray(model.apply(
        variables, jnp.asarray(x), jnp.asarray(senders),
        jnp.asarray(receivers), train=False,
    ))

    params_np = jax.tree_util.tree_map(np.asarray, variables["params"])
    out_ref = reference_forward(
        params_np, x, senders, receivers, num_layers=L, heads=heads,
        hidden=h, kernel=kernel, alpha=0.5,
        use_graph=flags.get("use_graph", True),
        graph_weight=flags.get("graph_weight", -1.0),
        use_source=flags.get("use_source", False),
        use_residual=flags.get("use_residual", True),
        use_bn=flags.get("use_bn", True),
    )
    np.testing.assert_allclose(out_flax, out_ref, rtol=2e-3, atol=2e-4)
