"""On-chip crossover sweep for the DIFFormer-a sigmoid attention dispatch.

Measures fwd+bwd (the training cost) of the three implementations at a
ladder of N, op-level, bf16, H=1 (the reference's sigmoid configs are
single-head at h=64, ``node classification/run.sh:47-77``):

  * dense     — reference structure: materialize [N, L, H] scores
                (``ops.sigmoid_attention_dense``); OOMs / thrashes at large N
  * xla       — blockwise lax.scan custom-VJP (``ops._sigmoid_attention_blocked``)
  * pallas    — flash fwd + Pallas bwd kernels (production TPU path)

Protocol: each measurement is a jitted 8-step ``lax.scan`` where the carry
is q updated by a small multiple of dq (so steps can't be collapsed), min
over 3 calls — same anti-dispatch-noise recipe as bench.py. Compile time is
reported per point (the round-2 pathology was *compile*, not run, time).

Output: a markdown table on stdout for BENCH_NOTES.md, plus a JSON line.
Usage: python scripts/bench_sigmoid_crossover.py [Nmin Nmax]
Env: CROSS_IMPLS=dense,xla,pallas  CROSS_STEPS=8  CROSS_DTYPE=bfloat16
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from difformer_tpu.kernels.pallas_sigmoid_attention import (
        sigmoid_attention_pallas,
    )
    from difformer_tpu.ops.sigmoid_attention import (
        sigmoid_attention,
        sigmoid_attention_dense,
    )

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    steps = int(os.environ.get("CROSS_STEPS", 8))
    dtype = jnp.bfloat16 if os.environ.get(
        "CROSS_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    impls = os.environ.get("CROSS_IMPLS", "dense,xla,pallas").split(",")
    H, M, D = 1, 64, 64

    ns = [1024, 2048, 4096, 8192, 16384, 32768, 65536]
    if len(sys.argv) == 3:
        lo, hi = int(sys.argv[1]), int(sys.argv[2])
        ns = [n for n in ns if lo <= n <= hi]

    fns = {
        "dense": lambda q, k, v: sigmoid_attention_dense(q, k, v),
        "xla": lambda q, k, v: sigmoid_attention(q, k, v, use_pallas=False),
        "pallas": lambda q, k, v: sigmoid_attention_pallas(q, k, v, None),
        "pallas-xlabwd": lambda q, k, v: sigmoid_attention_pallas(
            q, k, v, None, xla_bwd=True),
    }
    # dense keeps an [N, L, H] f32 score tensor (plus its cotangent): cap it
    # where that alone passes ~4 GB of the 16 GB HBM
    dense_cap = 16384

    rows = []
    print(f"| N | impl | compile s | ms/step | Gpairs/s |")
    print(f"|---|---|---|---|---|")
    for n in ns:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (n, H, M), dtype)
        k = jax.random.normal(jax.random.PRNGKey(1), (n, H, M), dtype)
        v = jax.random.normal(jax.random.PRNGKey(2), (n, H, D), dtype)

        for impl in impls:
            if impl == "dense" and n > dense_cap:
                continue
            fn = fns[impl]

            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

            @jax.jit
            def multi(q, k, v):
                def body(q, _):
                    l, dq = jax.value_and_grad(loss)(q, k, v)
                    return q - 1e-6 * dq.astype(q.dtype), l

                q, ls = jax.lax.scan(body, q, None, length=steps)
                return q, ls[-1]

            try:
                t0 = time.perf_counter()
                q1, l = multi(q, k, v)
                float(l)
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    q1, l = multi(q1, k, v)
                    float(l)
                    best = min(best, (time.perf_counter() - t0) / steps)
            except Exception as err:
                print(f"| {n} | {impl} | FAILED: {type(err).__name__} | | |",
                      flush=True)
                rows.append({"n": n, "impl": impl, "error": str(err)[:200]})
                continue
            gpairs = n * float(n) * H / best / 1e9
            print(f"| {n} | {impl} | {compile_s:.1f} | {best * 1e3:.2f} "
                  f"| {gpairs:.1f} |", flush=True)
            rows.append({"n": n, "impl": impl,
                         "compile_s": round(compile_s, 1),
                         "ms_per_step": round(best * 1e3, 3),
                         "gpairs_per_s": round(gpairs, 2)})

    print(json.dumps({"sweep": "sigmoid-crossover-fwdbwd", "heads": H,
                      "m": M, "d": D, "steps": steps,
                      "dtype": str(dtype.__name__), "rows": rows}),
          flush=True)


if __name__ == "__main__":
    main()
