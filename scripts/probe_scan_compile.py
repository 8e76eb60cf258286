"""Probe: why does wrapping the Pallas sigmoid fwd+bwd in lax.scan blow up
TPU compile time (bare jit(grad) ~1 s, 8-step scan 100-300+ s erratic)?

Runs, sequentially in one process (no kills — killing a TPU process wedges
the axon relay):
  A. steps=1, plain jit(value_and_grad + update)        — baseline
  B. 8-step lax.scan (unroll=1, the bench recipe)       — the pathology
  C. 8-step lax.scan with unroll=8 (straight-line body)
  D. 8 async chained jit(step) calls (no scan at all), timed end-to-end

Usage: python scripts/probe_scan_compile.py [N] [which: A,B,C,D]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from difformer_tpu.kernels.pallas_sigmoid_attention import (
        sigmoid_attention_pallas,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["A", "B", "C", "D"])
    H, M, D = 1, 64, 64
    dtype = jnp.bfloat16

    q = jax.random.normal(jax.random.PRNGKey(0), (n, H, M), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (n, H, M), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, H, D), dtype)

    def loss(q, k, v):
        return jnp.sum(
            sigmoid_attention_pallas(q, k, v, None).astype(jnp.float32) ** 2)

    def bench(tag, compile_fn, run_fn):
        t0 = time.perf_counter()
        state = compile_fn()
        print(f"[{tag}] N={n} compile+first: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = run_fn(state)
            best = min(best, time.perf_counter() - t0)
        print(f"[{tag}] N={n} steady: {best * 1e3 / 8:.2f} ms/step-equiv",
              flush=True)

    if "A" in which:
        @jax.jit
        def one(q):
            l, dq = jax.value_and_grad(loss)(q, k, v)
            return q - 1e-6 * dq.astype(q.dtype), l

        def compile_a():
            q1, l = one(q)
            float(l)
            return q1

        def run_a(q1):
            for _ in range(8):
                q1, l = one(q1)
            float(l)
            return q1

        bench("A steps=1 jit", compile_a, run_a)

    for tag, unroll in (("B scan u=1", 1), ("C scan u=8", 8)):
        if tag[0] not in which:
            continue

        @jax.jit
        def multi(q, k, v, unroll=unroll):
            def body(q, _):
                l, dq = jax.value_and_grad(loss)(q, k, v)
                return q - 1e-6 * dq.astype(q.dtype), l

            q, ls = jax.lax.scan(body, q, None, length=8, unroll=unroll)
            return q, ls[-1]

        def compile_bc(multi=multi):
            q1, l = multi(q, k, v)
            float(l)
            return q1

        def run_bc(q1, multi=multi):
            q1, l = multi(q1, k, v)
            float(l)
            return q1

        bench(tag, compile_bc, run_bc)

    if "D" in which:
        @jax.jit
        def step_d(q):
            l, dq = jax.value_and_grad(loss)(q, k, v)
            return q - 1e-6 * dq.astype(q.dtype), l

        def compile_d():
            q1, l = step_d(q)
            float(l)
            return q1

        def run_d(q1):
            # async chain: enqueue all 8 dependent steps, block once at the
            # end — dispatch latency overlaps with device compute
            for _ in range(8):
                q1, l = step_d(q1)
            float(l)
            return q1

        bench("D async-chain", compile_d, run_d)


if __name__ == "__main__":
    main()
