"""Fused-QKV probe: 3 separate [H,H] projections vs one [H,3H] gemm.

BENCH_NOTES' train-step anatomy puts the fwd/bwd gap in the backward
wgrad gemms (long contraction, small output: [768, B*S] x [B*S, 768]).
Fusing Q/K/V triples the wgrad output tile — this measures whether that
recovers MXU efficiency at flagship shapes.

    python tools/benchmarks/prof_qkv.py [B] [S]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 228
    H = 768
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, H) * 0.02, jnp.bfloat16)
    Wq = jnp.asarray(rng.randn(H, H) * 0.02, jnp.float32)
    Wk = jnp.asarray(rng.randn(H, H) * 0.02, jnp.float32)
    Wv = jnp.asarray(rng.randn(H, H) * 0.02, jnp.float32)
    bq = jnp.zeros((H,), jnp.float32)
    bk = jnp.zeros((H,), jnp.float32)
    bv = jnp.zeros((H,), jnp.float32)

    def split3(params, x):
        Wq, Wk, Wv, bq, bk, bv = params
        q = x @ Wq.astype(jnp.bfloat16) + bq.astype(jnp.bfloat16)
        k = x @ Wk.astype(jnp.bfloat16) + bk.astype(jnp.bfloat16)
        v = x @ Wv.astype(jnp.bfloat16) + bv.astype(jnp.bfloat16)
        return q, k, v

    def fused(params, x):
        Wq, Wk, Wv, bq, bk, bv = params
        W = jnp.concatenate([Wq, Wk, Wv], axis=1).astype(jnp.bfloat16)
        b = jnp.concatenate([bq, bk, bv]).astype(jnp.bfloat16)
        qkv = x @ W + b
        return jnp.split(qkv, 3, axis=-1)

    def fused_pre(params, x):
        # concat hoisted out of the hot loop by the caller (make_* wraps
        # proj in the scan body; this variant concatenates per *step*,
        # as the real model would — once per layer per train step)
        Wq, Wk, Wv, bq, bk, bv = params
        W = jnp.concatenate([Wq, Wk, Wv], axis=1).astype(jnp.bfloat16)
        b = jnp.concatenate([bq, bk, bv]).astype(jnp.bfloat16)

        def inner(x):
            qkv = x @ W + b
            return jnp.split(qkv, 3, axis=-1)
        return inner

    params = (Wq, Wk, Wv, bq, bk, bv)

    def make_fwd(proj, pre=False):
        def step(params, x):
            f = proj(params, x) if pre else None

            def body(h, _):
                q, k, v = f(h) if pre else proj(params, h)
                return (q + k + v) / 3.0, None
            out, _ = jax.lax.scan(body, x, None, length=50)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(step)

    def make_fwdbwd(proj, pre=False):
        def loss(params, x):
            f = proj(params, x) if pre else None

            def body(h, _):
                q, k, v = f(h) if pre else proj(params, h)
                return (q + k + v) / 3.0, None
            out, _ = jax.lax.scan(body, x, None, length=50)
            return jnp.sum(out.astype(jnp.float32))
        g = jax.grad(loss)

        def step(params, x):
            grads = g(params, x)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in grads)
        return jax.jit(step)

    def timeit(fn, *args, repeats=5):
        float(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / 50

    results = {}
    for name, proj, pre in [
        ("split3", split3, False),
        ("fused", fused, False),
        ("fused_pre", fused_pre, True),
    ]:
        t_f = timeit(make_fwd(proj, pre), params, x)
        t_fb = timeit(make_fwdbwd(proj, pre), params, x)
        results[name] = {
            "fwd_us": round(t_f * 1e6, 1),
            "fwdbwd_us": round(t_fb * 1e6, 1),
        }
        print(json.dumps({f"B{B}_S{S}_{name}": results[name]}), flush=True)


if __name__ == "__main__":
    main()
