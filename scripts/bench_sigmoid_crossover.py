"""On-chip crossover sweep for the DIFFormer-a sigmoid attention dispatch.

Measures fwd+bwd (the training cost) of the implementations at a ladder of
N, op-level, bf16, H=1 (the reference's sigmoid configs are single-head at
h=64, ``node classification/run.sh:47-77``):

  * dense     — reference structure: materialize [N, L, H] scores
                (``ops.sigmoid_attention_dense``); OOMs / thrashes at large N
  * xla       — blockwise lax.scan custom-VJP (``ops._sigmoid_attention_blocked``)
  * pallas    — flash fwd + Pallas bwd kernels (production TPU path)
  * pallas-xlabwd — flash fwd + legacy XLA blockwise bwd (A/B)

Every (N, impl) point runs in its OWN time-bounded subprocess: the round-2
compile pathology (XLA backward >280 s at N≥8192) must not be able to stall
the sweep — a point that exceeds CROSS_POINT_TIMEOUT is reported as
``timeout`` and the sweep moves on. (This is also why the sweep exists: the
Pallas backward compiles in ~1 s where the XLA forms hang.)

Protocol per point: jitted 8-step ``lax.scan`` whose carry is q updated by
a small multiple of dq (steps can't be collapsed), min over 3 calls — the
same anti-dispatch-noise recipe as bench.py. Compile time reported.

Output: markdown table rows on stdout for BENCH_NOTES.md + final JSON line.
Usage: python scripts/bench_sigmoid_crossover.py [Nmin Nmax]
Env: CROSS_IMPLS=dense,xla,pallas  CROSS_STEPS=8  CROSS_DTYPE=bfloat16
     CROSS_POINT_TIMEOUT=300
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, M, D = 1, 64, 64


def run_point(n, impl, emit=True):
    """Measure one (N, impl) point; print and return the row dict."""
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
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    steps = int(os.environ.get("CROSS_STEPS", 8))
    dtype = jnp.bfloat16 if os.environ.get(
        "CROSS_DTYPE", "bfloat16") == "bfloat16" else jnp.float32

    fns = {
        "dense": lambda q, k, v: sigmoid_attention_dense(q, k, v),
        "xla": lambda q, k, v: sigmoid_attention(q, k, v, use_pallas=False),
        "pallas": lambda q, k, v: sigmoid_attention_pallas(q, k, v, None),
        "pallas-xlabwd": lambda q, k, v: sigmoid_attention_pallas(
            q, k, v, None, xla_bwd=True),
    }
    fn = fns[impl]

    q = jax.random.normal(jax.random.PRNGKey(0), (n, H, M), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (n, H, M), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (n, H, D), dtype)

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    @jax.jit
    def multi(q, k, v):
        def body(q, _):
            l, dq = jax.value_and_grad(loss)(q, k, v)
            return q - 1e-6 * dq.astype(q.dtype), l

        q, ls = jax.lax.scan(body, q, None, length=steps)
        return q, ls[-1]

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
    row = {
        "n": n, "impl": impl, "compile_s": round(compile_s, 1),
        "ms_per_step": round(best * 1e3, 3),
        "gpairs_per_s": round(n * float(n) * H / best / 1e9, 2),
    }
    if emit:
        print(json.dumps(row), flush=True)
    return row


def main_inprocess():
    """No-kill mode: every point runs sequentially in THIS process. Use for
    impls with known-sane compile times (pallas, dense) — the axon relay is
    wedged for minutes by ANY killed TPU process, so the bounded-subprocess
    mode poisons its own later points whenever one times out. Here nothing
    is ever killed; a pathological point stalls the run instead (that is
    the trade)."""
    impls = os.environ.get("CROSS_IMPLS", "pallas,dense").split(",")
    ns = [1024, 2048, 4096, 8192, 16384, 32768, 65536]
    if len(sys.argv) == 4:
        lo, hi = int(sys.argv[2]), int(sys.argv[3])
        ns = [n for n in ns if lo <= n <= hi]
    dense_cap = 16384
    rows = []
    print("| N | impl | compile s | ms/step | Gpairs/s |")
    print("|---|---|---|---|---|")
    for impl in impls:
        for n in ns:
            if impl == "dense" and n > dense_cap:
                continue
            try:
                r = run_point(n, impl, emit=False)
            except Exception as err:
                print(f"| {n} | {impl} | FAILED {type(err).__name__} | — | — |",
                      flush=True)
                rows.append({"n": n, "impl": impl, "error": str(err)[:200]})
                continue
            rows.append(r)
            print(f"| {r['n']} | {r['impl']} | {r['compile_s']} "
                  f"| {r['ms_per_step']} | {r['gpairs_per_s']} |", flush=True)
    print(json.dumps({"sweep": "sigmoid-crossover-fwdbwd", "heads": H,
                      "m": M, "d": D,
                      "dtype": os.environ.get("CROSS_DTYPE", "bfloat16"),
                      "rows": rows}), flush=True)


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--inprocess":
        main_inprocess()
        return

    impls = os.environ.get("CROSS_IMPLS", "dense,xla,pallas").split(",")
    budget = float(os.environ.get("CROSS_POINT_TIMEOUT", 300))
    ns = [1024, 2048, 4096, 8192, 16384, 32768, 65536]
    if len(sys.argv) == 3:
        lo, hi = int(sys.argv[1]), int(sys.argv[2])
        ns = [n for n in ns if lo <= n <= hi]
    dense_cap = 16384   # [N, N, H] f32 + cotangent passes ~4 GB of HBM

    rows = []
    print("| N | impl | compile s | ms/step | Gpairs/s |")
    print("|---|---|---|---|---|")
    # impl-major order, pallas first: killing a timed-out TPU child wedges
    # the axon relay/remote-compile for minutes, poisoning every
    # measurement taken right after (observed: the same program compiles in
    # 1-3 s on a healthy tunnel and 200-600+ s after a kill). The healthy
    # implementations therefore run before any known-pathological point,
    # and a cool-down follows every kill.
    for impl in impls:
        for n in ns:
            if impl == "dense" and n > dense_cap:
                continue
            try:
                res = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--point", str(n), impl],
                    timeout=budget, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                print(f"| {n} | {impl} | >{budget:.0f}s (killed) | — | — |",
                      flush=True)
                rows.append({"n": n, "impl": impl, "timeout_s": budget})
                cool = float(os.environ.get("CROSS_COOLDOWN", 180))
                time.sleep(cool)   # let the relay recover before next point
                continue
            lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
            if res.returncode != 0 or not lines:
                tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
                print(f"| {n} | {impl} | FAILED rc={res.returncode} "
                      f"({tail[0][:60]}) | — | — |", flush=True)
                rows.append({"n": n, "impl": impl, "rc": res.returncode,
                             "error": tail[0][:200]})
                continue
            r = json.loads(lines[-1])
            rows.append(r)
            print(f"| {r['n']} | {r['impl']} | {r['compile_s']} "
                  f"| {r['ms_per_step']} | {r['gpairs_per_s']} |", flush=True)

    print(json.dumps({"sweep": "sigmoid-crossover-fwdbwd", "heads": H,
                      "m": M, "d": D,
                      "dtype": os.environ.get("CROSS_DTYPE", "bfloat16"),
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
