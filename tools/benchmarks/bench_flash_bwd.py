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
import os
import sys
import time

import numpy as np

# self-pathing: do NOT use PYTHONPATH=/root/repo for TPU scripts — the
# repo's top-level dirs shadow modules the axon PJRT plugin imports,
# breaking backend registration. Appending (not prepending) is safe.
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def _time_fn(fn, *args, repeats=4, n1=20, n2=220):
    """Two-point marginal: time n1- and n2-iteration scans and take
    (t2 - t1) / (n2 - n1) — isolates device time from the ~25 ms fixed
    host<->device tunnel overhead per call (BENCH_NOTES methodology)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def many(n, *a):
        def body(c, i):
            out = fn(*a, salt=i * 1e-6 + c * 0)
            return c + out, None

        c, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(n, dtype=jnp.float32),
        )
        return c

    def best_of(n):
        float(many(n, *args))  # compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(many(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(n2) - best_of(n1)) / (n2 - n1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--head-dim", type=int, default=64)
    parser.add_argument("--seq-lens", type=int, nargs="+",
                        default=[256, 512, 1024, 2048])
    parser.add_argument("--block-q", type=int, default=128)
    parser.add_argument("--block-k", type=int, default=128)
    parser.add_argument("--impls", nargs="+",
                        default=["xla", "pallas"])
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

        impl_map = {
            "xla": mha_reference,
            "pallas": lambda *a, **kw: flash_attention(
                *a, block_q=args.block_q, block_k=args.block_k, **kw
            ),
        }
        for impl in args.impls:
            attn = impl_map[impl]
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
                "block": [args.block_q, args.block_k],
                "fwd_us": round(t_f * 1e6, 1),
                "fwd_bwd_us": round(t_fb * 1e6, 1),
                "bwd_over_fwd": round((t_fb - t_f) / max(t_f, 1e-9), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
