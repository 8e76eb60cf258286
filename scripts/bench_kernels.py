"""Microbenchmarks for the Pallas kernels vs their XLA twins on TPU.

Run standalone (one TPU process at a time!):
  python scripts/bench_kernels.py sigmoid   # flash sigmoid attention
  python scripts/bench_kernels.py ell       # ELL SpMM bucket kernel
"""

import os
import sys
import time

import numpy as np

# make the repo importable without touching PYTHONPATH (overriding it breaks
# the axon TPU plugin, which is injected via /root/.axon_site on PYTHONPATH)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    jax.block_until_ready(x)
    # force a real host sync through the tunnel
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def bench_sigmoid():
    """Unrolled-chain methodology (BENCH_NOTES.md caveat: per-call dispatch
    through the remote tunnel is 20-40 ms with spikes — ops must be chained
    inside ONE program and timed min-over-calls)."""
    import jax
    import jax.numpy as jnp

    from difformer_tpu.kernels.pallas_sigmoid_attention import (
        sigmoid_attention_pallas,
    )
    from difformer_tpu.ops.sigmoid_attention import sigmoid_attention

    N = int(os.environ.get("SIG_N", 16384))
    DT = jnp.bfloat16 if os.environ.get("SIG_DTYPE") == "bfloat16" \
        else jnp.float32
    H, M, D = 1, 64, 64
    STEPS = 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, H, M)).astype(np.float32), dtype=DT)
    k = jnp.asarray(rng.normal(size=(N, H, M)).astype(np.float32), dtype=DT)
    v = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32), dtype=DT)
    mask = jnp.ones((N,), jnp.float32)
    print(f"# sigmoid bench dtype={DT.__name__}", flush=True)

    def chain(f):
        @jax.jit
        def g(q, k, v):
            for _ in range(STEPS):
                q = f(q, k, v) * 0.1  # output feeds next queries (M == D)
            return q
        return g

    f_xla = chain(lambda q, k, v: sigmoid_attention(q, k, v,
                                                    use_pallas=False))
    use_mask = os.environ.get("SIG_MASK") == "1"
    f_pal = chain(lambda q, k, v: sigmoid_attention_pallas(
        q, k, v, mask if use_mask else None))

    for name, f in [("xla-blockwise", f_xla), ("pallas", f_pal)]:
        t0 = time.perf_counter()
        sync(f(q, k, v))
        print(f"# {name}: compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(q, k, v)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / STEPS)
        pairs = N * N * H
        print(f"{name}: N={N} {best * 1e3:.2f} ms/apply  "
              f"({pairs / best / 1e9:.2f} Gpairs/s)", flush=True)


def bench_ell():
    """XLA-gather roofline probe on the dominant ELL bucket.

    (A Pallas windowed-DMA comparison kernel lived here until round 2; it
    was retired — per-row DMAs are latency-bound and current Mosaic rejects
    D<128 VMEM slices. See BENCH_NOTES.md "Pallas ELL kernel: retired".)
    """
    import jax
    import jax.numpy as jnp

    from difformer_tpu.ops.ell import build_ell_gcn

    N, E, D = 131072, 4 * 1024 * 1024, 64
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, E).astype(np.int32)
    r = rng.integers(0, N, E).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    ell, _ = build_ell_gcn(s, r, N)
    # largest bucket only (dominant cost)
    bi = int(np.argmax([w.shape[0] * w.shape[1] for w in ell.weight]))
    idx, w = ell.nbr_idx[bi], ell.weight[bi]
    print(f"# bucket {bi}: {idx.shape}", flush=True)

    def xla_ref(x, idx, w):
        g = jnp.take(x, idx.reshape(-1), axis=0).reshape(idx.shape + (D,))
        return jnp.sum(g * w[..., None], axis=1)

    f_xla = jax.jit(xla_ref)
    rows = idx.shape[0] * idx.shape[1]
    for name, f in [("xla-gather", f_xla)]:
        t0 = time.perf_counter()
        out = f(x, idx, w)
        sync(out)
        print(f"# {name}: compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(x, idx, w)
        sync(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt * 1e3:.1f} ms  ({rows / dt / 1e6:.1f}M rows/s)",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sigmoid"
    {"sigmoid": bench_sigmoid, "ell": bench_ell}[which]()
