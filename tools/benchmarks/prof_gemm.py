"""MXU ceiling probe: chained y=y@w gemms (full data dependence, no DCE),
run at two iteration counts so fixed per-call overhead cancels:
    t_marginal = (T(iters2) - T(iters1)) / (iters2 - iters1)
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

def chain_time(m, k, iters, repeats=3):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k) * 0.01, jnp.bfloat16)  # keep values bounded
    @jax.jit
    def many(x, w):
        def body(y, _):
            return y @ w, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))
    float(many(x, w))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(many(x, w)); best = min(best, time.perf_counter()-t0)
    return best

M = 14592
for (m, k) in [(M, 768), (M, 1536), (M, 3072), (4096, 4096)]:
    t1, t2 = chain_time(m, k, 20), chain_time(m, k, 120)
    t = (t2 - t1) / 100
    fl = 2 * m * k * k
    print(f"y=y@w [{m:5d},{k:4d}]: {t*1e6:7.1f} us/gemm  {fl/t/1e12:6.1f} TFLOPs  (fixed ovh ~{(t1 - 20*t)*1e3:.1f} ms/call)")
