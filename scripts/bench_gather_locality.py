"""How much does gather-index locality matter on TPU?

The DIFFormer train step is bound by HBM row gathers (BENCH_NOTES.md). This
measures the dominant ELL-bucket op — gather [R,K] rows of x[N,D] and
weighted-reduce over K — with the SAME shapes but different index locality:

  uniform    indices ~ U[0,N)                (bench.py's worst case)
  windowed   row i's K neighbors within ±W of i (what RCM reordering of a
             community graph produces)       W swept over several sizes
  sorted     globally sorted indices         (upper bound)

Run: python scripts/bench_gather_locality.py  (one TPU process at a time)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, R, K, D = 131072, 59510, 128, 64
REPS = 10


def sync(x):
    import jax

    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), dtype)
    w = jnp.asarray(rng.uniform(size=(R, K)).astype(np.float32), dtype)

    @jax.jit
    def spmm(x, idx, w):
        g = jnp.take(x, idx, axis=0)            # [R, K, D] row gather
        return jnp.einsum("rk,rkd->rd", w, g)

    def make_idx(kind, window=None):
        if kind == "uniform":
            idx = rng.integers(0, N, (R, K))
        elif kind == "windowed":
            centers = (np.arange(R) * (N // R))[:, None]
            off = rng.integers(-window, window, (R, K))
            idx = np.clip(centers + off, 0, N - 1)
        elif kind == "sorted":
            idx = np.sort(rng.integers(0, N, (R, K)), axis=None).reshape(R, K)
        # within-row sort (ops/ell.py does this too)
        return jnp.asarray(np.sort(idx, axis=1).astype(np.int32))

    cases = [("uniform", None), ("windowed", 8192), ("windowed", 1024),
             ("windowed", 128), ("sorted", None)]
    # warm up / compile once
    sync(spmm(x, make_idx("uniform"), w))
    for kind, win in cases:
        idx = make_idx(kind, win)
        sync(spmm(x, idx, w))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = spmm(x, idx, w)
        sync(out)
        dt = (time.perf_counter() - t0) / REPS
        label = kind if win is None else f"{kind}±{win}"
        gb = R * K * D * x.dtype.itemsize / 1e9
        print(f"{label:>16}: {dt * 1e3:7.2f} ms   {R * K / dt / 1e6:8.1f} Mrows/s"
              f"   {gb / dt:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
