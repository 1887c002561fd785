"""LayerNorm cost at flagship shapes — the XProf trace shows the LN
fusions (convert_reduce_fusion.*) take 52% of the VisualBERT forward.

Chained-marginal timing of LN variants on [B, S, H] bf16 activations
(each iteration feeds the previous output so nothing hoists):
    python tools/benchmarks/prof_ln.py
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    B, S, H = 64, 228, 768
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, H), jnp.bfloat16)
    scale32 = jnp.ones((H,), jnp.float32)
    bias32 = jnp.zeros((H,), jnp.float32)
    scale16 = scale32.astype(jnp.bfloat16)
    bias16 = bias32.astype(jnp.bfloat16)

    ln_f32p = nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16,
                           param_dtype=jnp.float32)
    v_f32p = ln_f32p.init(jax.random.PRNGKey(0), x)
    ln_b16p = nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16,
                           param_dtype=jnp.bfloat16)
    v_b16p = ln_b16p.init(jax.random.PRNGKey(0), x)

    def manual_f32(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-12)
        return (y * scale32 + bias32).astype(jnp.bfloat16)

    def manual_b16_stats(x):
        # stats in f32 via fast variance (E[x^2]-E[x]^2), IO all bf16
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        meansq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = meansq - jnp.square(mean)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-12)
        return (y.astype(jnp.bfloat16) * scale16 + bias16)

    variants = {
        "flax_ln_f32params": lambda x: ln_f32p.apply(v_f32p, x),
        "flax_ln_bf16params": lambda x: ln_b16p.apply(v_b16p, x),
        "manual_two_pass_f32": manual_f32,
        "manual_fast_var": manual_b16_stats,
    }

    def timeit(fn, iters=200, repeats=3):
        @jax.jit
        def many(x0):
            def body(h, _):
                return fn(h), None
            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        float(many(x))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(many(x))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    results = {}
    bytes_moved = (B * S * H) * 2 * 2  # read + write bf16
    for name, fn in variants.items():
        t = timeit(fn)
        results[name] = {
            "us_per_ln": round(t * 1e6, 1),
            "effective_GBps": round(bytes_moved / t / 1e9, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)


if __name__ == "__main__":
    main()
