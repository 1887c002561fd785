"""Int8 MXU probe: is the v5e int8 path (2x bf16 peak on paper) a real win
at this model's gemm shapes, including the dynamic-quantization overhead?

Three measurements per shape, all chained through lax.scan with full data
dependence and timed at two iteration counts so the fixed ~25ms tunnel
overhead cancels (same methodology as prof_gemm.py):

  bf16     : y = y @ w                      (the current eval path)
  int8-raw : y32 += dot8(x8, w8)            (MXU int8 ceiling; cheap feedback)
  int8-dyn : per-row absmax requant of the carry each step, then dot8,
             then dequant — the realistic weight+activation int8 gemm
             including all VPU quantize/dequantize work.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np


def timed(fn, *args, repeats=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(fn(*args)); best = min(best, time.perf_counter() - t0)
    return best


def marginal(make, iters1=20, iters2=120):
    f1, args1 = make(iters1)
    f2, args2 = make(iters2)
    t1, t2 = timed(f1, *args1), timed(f2, *args2)
    return (t2 - t1) / (iters2 - iters1)


def bf16_chain(m, k, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, n) * 0.01, jnp.bfloat16)
    wb = jnp.asarray(rng.randn(n, k) * 0.01, jnp.bfloat16)  # project back for chaining

    def make(iters):
        @jax.jit
        def many(x, w, wb):
            def body(y, _):
                return (y @ w) @ wb, None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(y.astype(jnp.float32))
        return many, (x, w, wb)
    return make


def int8_raw_chain(m, k, n):
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    wb8 = jnp.asarray(rng.randint(-127, 128, (n, k)), jnp.int8)

    def dot8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def make(iters):
        @jax.jit
        def many(x8, w8, wb8):
            def body(c, _):
                y32 = dot8(c, w8)                       # [m,n] int32
                y8 = (y32 >> 8).astype(jnp.int8)        # cheap feedback, keeps dependence
                z32 = dot8(y8, wb8)
                return (z32 >> 8).astype(jnp.int8), None
            y, _ = jax.lax.scan(body, x8, None, length=iters)
            return jnp.sum(y.astype(jnp.int32))
        return many, (x8, w8, wb8)
    return make


def int8_dyn_chain(m, k, n):
    """Weight int8 (per-out-channel scale), activations dynamically
    quantized per row each step; dequant back to bf16 after each gemm."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = rng.randn(k, n).astype(np.float32) * 0.01
    wb = rng.randn(n, k).astype(np.float32) * 0.01

    def prep(wf):
        s = np.abs(wf).max(axis=0) / 127.0 + 1e-8      # per-out-channel
        q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s, jnp.float32)

    w8, ws = prep(w)
    wb8, wbs = prep(wb)

    def qdot(a, w8, ws):
        amax = jnp.max(jnp.abs(a), axis=1, keepdims=True).astype(jnp.float32) + 1e-6
        ascale = amax / 127.0
        a8 = jnp.clip(jnp.round(a.astype(jnp.float32) / ascale), -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(a8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (y32.astype(jnp.float32) * ascale * ws[None, :]).astype(jnp.bfloat16)

    def make(iters):
        @jax.jit
        def many(x):
            def body(y, _):
                return qdot(qdot(y, w8, ws), wb8, wbs), None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(y.astype(jnp.float32))
        return many, (x,)
    return make


M = 14592
SHAPES = [(M, 768, 768), (M, 768, 3072), (4096, 4096, 4096), (8192, 8192, 8192)]
for (m, k, n) in SHAPES:
    fl = 2 * (2 * m * k * n)  # two gemms per chain step
    rows = []
    for name, maker in [("bf16", bf16_chain), ("int8-raw", int8_raw_chain),
                        ("int8-dyn", int8_dyn_chain)]:
        t = marginal(maker(m, k, n))
        rows.append((name, t, fl / t / 1e12))
    base = rows[0][1]
    for name, t, tf in rows:
        print(f"[{m:5d},{k:4d},{n:4d}] {name:9s}: {t*1e6:8.1f} us/step  "
              f"{tf:6.1f} T{'OP' if 'int8' in name else 'FLOP'}s  "
              f"speedup vs bf16 {base/t:4.2f}x")
    print()
