"""Flash-attention fwd+bwd crossover study: Pallas blockwise kernels
(ops/attention.py _flash_backward) vs XLA fused attention, across seq
lens — the regime study VERDICT r3 #6 asks for. The crossover table
decides the per-seq-len default documented in BENCH_NOTES.md.

Usage (on the TPU chip):
    python tools/benchmarks/bench_flash_bwd.py [--dtype bfloat16]
Prints one JSON line per (seq_len, impl, direction).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time_fn(fn, *args, repeats=5, inner=20):
    """Best-of-repeats of ``inner`` chained calls inside one jit (scalar
    fetch = device fence; amortizes the ~25 ms tunnel overhead)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(*a):
        def body(c, i):
            out = fn(*a, salt=i * 1e-6 + c * 0)
            return c + out, None

        c, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(inner, dtype=jnp.float32),
        )
        return c

    float(many(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--head-dim", type=int, default=64)
    parser.add_argument("--seq-lens", type=int, nargs="+",
                        default=[256, 512, 1024, 2048])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mmf_tpu.ops.attention import (
        flash_attention,
        make_attention_bias,
        mha_reference,
    )

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    for s in args.seq_lens:
        rng = np.random.RandomState(0)
        shape = (args.batch, args.heads, s, args.head_dim)
        q, k, v = (jnp.asarray(rng.randn(*shape).astype(np.float32), dt)
                   for _ in range(3))
        mask = np.ones((args.batch, s), np.float32)
        mask[:, -s // 8:] = 0.0
        bias = make_attention_bias(jnp.asarray(mask))

        for impl, attn in (
            ("xla", mha_reference),
            ("pallas", lambda *a, **kw: flash_attention(*a, **kw)),
        ):
            def fwd(q, k, v, salt=0.0):
                out = attn(q + salt, k, v, bias)
                return jnp.sum(out.astype(jnp.float32))

            def fwdbwd(q, k, v, salt=0.0):
                g = jax.grad(
                    lambda q, k, v: fwd(q, k, v, salt), argnums=(0, 1, 2)
                )(q, k, v)
                return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in g)

            t_f = _time_fn(fwd, q, k, v)
            t_fb = _time_fn(fwdbwd, q, k, v)
            print(json.dumps({
                "seq_len": s, "impl": impl, "dtype": args.dtype,
                "fwd_us": round(t_f * 1e6, 1),
                "fwd_bwd_us": round(t_fb * 1e6, 1),
                "bwd_over_fwd": round((t_fb - t_f) / max(t_f, 1e-9), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
