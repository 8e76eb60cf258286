"""True reference-executed parity: run the ACTUAL reference PyTorch model
files (imported via tests/ref_exec.py with 2-symbol stubs) and assert our
flax models match them — per-layer activations and a 10-step Adam training
trajectory — across the full flag grid. This replaces transcription-based
parity as the ground truth (BASELINE.md: 'per-layer activations vs PyTorch
reference: allclose'; reference ``node classification/difformer.py:10-226``,
``physical particle/difformer-v2.py:8-223``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from difformer_tpu.data.batching import pad_graph_batch            # noqa: E402
from difformer_tpu.nn import DIFFormer                             # noqa: E402
from difformer_tpu.nn.difformer_v2 import DIFFormerV2              # noqa: E402
from difformer_tpu.train.optim import torch_adam                   # noqa: E402
from difformer_tpu.utils.torch_import import (                     # noqa: E402
    params_from_torch_state_dict,
)
from tests.ref_exec import (                                       # noqa: E402
    reference_difformer_v1,
    reference_difformer_v2,
)

torch.manual_seed(0)
torch.set_default_dtype(torch.float32)


def _graph(rng, n=50, e=220, f=12):
    x = rng.normal(size=(n, f)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int64)
    receivers = rng.integers(0, n, e).astype(np.int64)
    return x, senders, receivers


V1_FLAG_GRID = [
    dict(),
    dict(num_heads=2),
    dict(graph_weight=0.7),
    dict(use_source=True),
    dict(use_graph=False),
    dict(use_weight=False),
    dict(num_heads=3, graph_weight=0.8, use_source=True),
    dict(use_residual=False, use_bn=False),
]


def _build_v1_pair(kernel, flags, *, f=12, h=16, c=4, L=2, seed=0):
    """Same-weights (torch reference model, flax model) pair."""
    ref = reference_difformer_v1()
    torch.manual_seed(seed)
    tmodel = ref.DIFFormer(
        f, h, c, num_layers=L, kernel=kernel, dropout=0.0,
        num_heads=flags.get("num_heads", 1),
        use_bn=flags.get("use_bn", True),
        use_residual=flags.get("use_residual", True),
        use_weight=flags.get("use_weight", True),
        use_graph=flags.get("use_graph", True),
        graph_weight=flags.get("graph_weight", -1),
        use_source=flags.get("use_source", False),
    )
    jmodel = DIFFormer(hidden_channels=h, out_channels=c, num_layers=L,
                       kernel=kernel, dropout=0.0, **flags)
    params = params_from_torch_state_dict(tmodel.state_dict())
    return tmodel, jmodel, params


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
@pytest.mark.parametrize("flags", V1_FLAG_GRID,
                         ids=lambda d: "-".join(f"{k}={v}" for k, v in
                                                d.items()) or "default")
def test_v1_forward_parity_vs_reference(rng, kernel, flags):
    x, senders, receivers = _graph(rng)
    tmodel, jmodel, params = _build_v1_pair(kernel, flags)

    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(
            torch.tensor(x),
            torch.tensor(np.stack([senders, receivers])),
        ).numpy()

    out_j = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        train=False,
    ))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_v1_per_layer_activations_vs_reference(rng, kernel):
    """Every DIFFormerConv output and post-LayerNorm activation matches the
    reference layer by layer, not just the final logits."""
    x, senders, receivers = _graph(rng)
    flags = dict(num_heads=2, graph_weight=0.7, use_source=True)
    tmodel, jmodel, params = _build_v1_pair(kernel, flags, L=3)

    captured = {}

    def hook(name):
        def fn(_mod, _inp, out):
            captured[name] = (out[0] if isinstance(out, tuple)
                              else out).detach().numpy()
        return fn

    for i, conv in enumerate(tmodel.convs):
        conv.register_forward_hook(hook(f"conv_{i}"))
    for i, bn in enumerate(tmodel.bns):
        bn.register_forward_hook(hook(f"ln_{i}"))

    tmodel.eval()
    with torch.no_grad():
        tmodel(torch.tensor(x), torch.tensor(np.stack([senders, receivers])))

    _, state = jmodel.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        train=False, capture_intermediates=True, mutable=["intermediates"],
    )
    inter = state["intermediates"]
    for i in range(3):
        got = np.asarray(inter[f"conv_{i}"]["__call__"][0])
        np.testing.assert_allclose(got, captured[f"conv_{i}"],
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"conv_{i} mismatch")
    for i in range(4):
        got = np.asarray(inter[f"ln_{i}"]["__call__"][0])
        np.testing.assert_allclose(got, captured[f"ln_{i}"],
                                   rtol=2e-4, atol=1e-4,
                                   err_msg=f"ln_{i} mismatch")


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_v1_training_trajectory_vs_reference(rng, kernel):
    """10 full-batch Adam steps (lr 1e-2, coupled wd 5e-4, NLL loss) from
    identical initialization track the reference's losses and final logits."""
    x, senders, receivers = _graph(rng)
    n, c = x.shape[0], 4
    y = rng.integers(0, c, n).astype(np.int64)
    train_idx = np.arange(0, n, 2)
    tmodel, jmodel, params = _build_v1_pair(kernel, dict(num_heads=2), L=2)

    lr, wd = 1e-2, 5e-4
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr, weight_decay=wd)
    tmodel.train()
    x_t = torch.tensor(x)
    ei_t = torch.tensor(np.stack([senders, receivers]))
    y_t = torch.tensor(y[train_idx])
    losses_t = []
    for _ in range(10):
        opt.zero_grad()
        out = tmodel(x_t, ei_t)
        loss = torch.nn.functional.nll_loss(
            torch.nn.functional.log_softmax(out[train_idx], dim=1), y_t)
        loss.backward()
        opt.step()
        losses_t.append(float(loss))
    with torch.no_grad():
        tmodel.eval()
        final_t = tmodel(x_t, ei_t).numpy()

    tx = torch_adam(lr, wd)
    opt_state = tx.init(params)
    xs = jnp.asarray(x)
    s = jnp.asarray(senders, jnp.int32)
    r = jnp.asarray(receivers, jnp.int32)
    yj = jnp.asarray(y[train_idx])
    idx = jnp.asarray(train_idx)

    @jax.jit
    def step(params, opt_state):
        def objective(p):
            logits = jmodel.apply({"params": p}, xs, s, r, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(0)})
            logp = jax.nn.log_softmax(logits[idx], axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, yj[:, None], axis=-1))
        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    losses_j = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        losses_j.append(float(loss))
    final_j = np.asarray(jmodel.apply({"params": params}, xs, s, r,
                                      train=False))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(final_j, final_t, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_v1_edge_weight_parity_vs_reference(rng, kernel):
    """Weighted-graph forward (the temporal track's edge_attr -> edge_weight
    path, spatial-temporal/main.py:105, gcn_conv value=w*deg_norm at
    difformer.py:70-73) matches the executed reference."""
    x, senders, receivers = _graph(rng)
    w = rng.uniform(0.1, 2.0, senders.shape[0]).astype(np.float32)
    tmodel, jmodel, params = _build_v1_pair(kernel, dict(num_heads=2))

    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(
            torch.tensor(x),
            torch.tensor(np.stack([senders, receivers])),
            torch.tensor(w),
        ).numpy()

    out_j = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        jnp.asarray(w), train=False,
    ))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kernel", ["simple", "sigmoid"])
def test_v1_get_attentions_vs_reference(rng, kernel):
    """The visualization path (``DIFFormer.get_attentions``,
    difformer.py:211-226) matches the reference's stacked per-layer
    attention tensors. The reference calls ``conv(x, x, output_attn=True)``
    with no edge_index, so only ``use_graph=False`` models can run it —
    which makes it equivalent to our ``output_attn=True`` eval forward.

    Reference quirk: the simple-kernel visualization divides [N,L,H] scores
    by the UN-transposed [N,H,1] normalizer (difformer.py:43), which only
    broadcasts when num_heads == 1 — for H>1 the reference itself raises.
    We therefore check simple at H=1 (where reference semantics are defined)
    and sigmoid at H=2; our implementation uses the intended [N,1,H]
    broadcast, which coincides at H=1."""
    x, senders, receivers = _graph(rng)
    heads = 1 if kernel == "simple" else 2
    flags = dict(num_heads=heads, use_graph=False)
    tmodel, jmodel, params = _build_v1_pair(kernel, flags, L=3)

    tmodel.eval()
    with torch.no_grad():
        attn_t = tmodel.get_attentions(torch.tensor(x)).numpy()

    _, attn_j = jmodel.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        train=False, output_attn=True,
    )
    attn_j = np.asarray(attn_j)
    assert attn_j.shape == attn_t.shape  # [layers, N, L, H]
    np.testing.assert_allclose(attn_j, attn_t, rtol=2e-4, atol=2e-5)
    # each query's attention over keys normalizes consistently with the
    # aggregation (sigmoid rows sum to 1; simple rows are den-normalized)
    if kernel == "sigmoid":
        np.testing.assert_allclose(attn_j.sum(axis=2),
                                   np.ones(attn_j.sum(axis=2).shape),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# v2 (batched graphs)
# ---------------------------------------------------------------------------

def _graph_list(rng, sizes=(7, 5, 9), f=6):
    feats, eis = [], []
    off = 0
    flat_x, flat_ei = [], []
    for n in sizes:
        xg = rng.normal(size=(n, f)).astype(np.float32)
        e = 4 * n
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
        feats.append(xg)
        eis.append(ei.astype(np.int64))
        flat_x.append(xg)
        flat_ei.append(ei + off)
        off += n
    return (feats, eis,
            np.concatenate(flat_x), np.concatenate(flat_ei, axis=1))


V2_FLAG_GRID = [
    ("simple", dict()),
    ("simple", dict(graph_weight=0.6)),
    ("simple", dict(use_graph=False)),
    ("sigmoid", dict(crossgraph_quirk=True)),
    ("sigmoid", dict(crossgraph_quirk=True, use_graph=False)),
]


def _build_v2_pair(kernel, flags, *, f=6, h=12, c=3, L=2, seed=1):
    ref = reference_difformer_v2()
    torch.manual_seed(seed)
    tflags = {k: v for k, v in flags.items() if k != "crossgraph_quirk"}
    tmodel = ref.DIFFormer_v2(
        f, h, c, num_layers=L, kernel=kernel, dropout=0.0,
        use_bn=tflags.get("use_bn", True),
        use_residual=tflags.get("use_residual", True),
        use_weight=tflags.get("use_weight", True),
        use_graph=tflags.get("use_graph", True),
        graph_weight=tflags.get("graph_weight", -1),
    )
    jmodel = DIFFormerV2(hidden_channels=h, out_channels=c, num_layers=L,
                         kernel=kernel, dropout=0.0, **flags)
    params = params_from_torch_state_dict(tmodel.state_dict())
    return tmodel, jmodel, params


@pytest.mark.parametrize("kernel,flags", V2_FLAG_GRID,
                         ids=lambda v: str(v))
def test_v2_forward_parity_vs_reference(rng, kernel, flags):
    """The padded-batch flax v2 matches the reference's flat scatter/pad
    implementation node for node (cross-graph sigmoid quirk included)."""
    feats, eis, flat_x, flat_ei = _graph_list(rng)
    sizes = [f.shape[0] for f in feats]
    tmodel, jmodel, params = _build_v2_pair(kernel, flags)

    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(torch.tensor(flat_x), torch.tensor(flat_ei),
                       torch.tensor(sizes)).numpy()

    batch = pad_graph_batch(feats, eis)
    out_pad = jmodel.apply(
        {"params": params}, jnp.asarray(batch.node_feat),
        jnp.asarray(batch.node_mask), jnp.asarray(batch.n_nodes),
        jnp.asarray(batch.senders), jnp.asarray(batch.receivers),
        None, jnp.asarray(batch.edge_mask), train=False,
    )
    out_j = np.asarray(out_pad)[np.asarray(batch.node_mask)]
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


def test_v2_training_trajectory_vs_reference(rng):
    """10 Adam steps on a node-level MSE objective through the reference v2
    model match ours (gradients through pad/scatter vs padded-dense paths)."""
    feats, eis, flat_x, flat_ei = _graph_list(rng)
    sizes = [f.shape[0] for f in feats]
    tmodel, jmodel, params = _build_v2_pair("simple", dict())
    tgt = rng.normal(size=(flat_x.shape[0], 3)).astype(np.float32)

    lr, wd = 5e-3, 1e-4
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr, weight_decay=wd)
    tmodel.train()
    losses_t = []
    for _ in range(10):
        opt.zero_grad()
        out = tmodel(torch.tensor(flat_x), torch.tensor(flat_ei),
                     torch.tensor(sizes))
        loss = torch.nn.functional.mse_loss(out, torch.tensor(tgt))
        loss.backward()
        opt.step()
        losses_t.append(float(loss))

    batch = pad_graph_batch(feats, eis)
    mask = jnp.asarray(batch.node_mask)
    tgt_pad = np.zeros(batch.node_feat.shape[:2] + (3,), np.float32)
    tgt_pad[np.asarray(batch.node_mask)] = tgt
    tgt_pad = jnp.asarray(tgt_pad)
    n_real = float(flat_x.shape[0] * 3)

    tx = torch_adam(lr, wd)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def objective(p):
            out = jmodel.apply(
                {"params": p}, jnp.asarray(batch.node_feat), mask,
                jnp.asarray(batch.n_nodes), jnp.asarray(batch.senders),
                jnp.asarray(batch.receivers), None,
                jnp.asarray(batch.edge_mask), train=False,
            )
            err = jnp.where(mask[..., None], out - tgt_pad, 0.0)
            return jnp.sum(err * err) / n_real
        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    losses_j = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state)
        losses_j.append(float(loss))
    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# checkpoint interop round-trip (the 'reproduce large-graph results' path,
# reference ``node classification/test_large_dataset.py:85-98``)
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip_reference_to_flax(rng, tmp_path):
    """A reference-format .pkl checkpoint (torch.save of the real reference
    model's state_dict, as main-batch.py:154-155 writes) loads via
    load_torch_checkpoint and evaluates identically in flax."""
    from difformer_tpu.utils.torch_import import load_torch_checkpoint

    x, senders, receivers = _graph(rng)
    tmodel, jmodel, _ = _build_v1_pair("simple", dict(num_heads=2), seed=7)
    ckpt = str(tmp_path / "cora-difformer.pkl")
    torch.save(tmodel.state_dict(), ckpt)

    params = load_torch_checkpoint(ckpt)
    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(torch.tensor(x),
                       torch.tensor(np.stack([senders, receivers]))).numpy()
    out_j = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        train=False,
    ))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


def test_checkpoint_roundtrip_flax_to_reference(rng):
    """The export direction: flax params -> reference state_dict loads into
    the real reference model (strict key/shape check) and evaluates
    identically — users can move trained models back."""
    from difformer_tpu.utils.torch_import import torch_state_dict_from_params

    x, senders, receivers = _graph(rng)
    tmodel, jmodel, _ = _build_v1_pair("simple", dict(num_heads=2), seed=3)

    variables = jmodel.init(
        jax.random.PRNGKey(11), jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = {k: torch.tensor(v) for k, v in
          torch_state_dict_from_params(params).items()}
    tmodel.load_state_dict(sd, strict=True)

    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(torch.tensor(x),
                       torch.tensor(np.stack([senders, receivers]))).numpy()
    out_j = np.asarray(jmodel.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(senders, jnp.int32), jnp.asarray(receivers, jnp.int32),
        train=False,
    ))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)
