"""On-chip ring-attention local-block bench: flash vs jnp (VERDICT r4
item 4). Single chip = ring of 1, which still executes the per-device
block kernel exactly as each ring step would on an N-device mesh (the
collective part is CPU-mesh-verified in tests/parallel).

Timing uses the repo's two-point-marginal scan methodology (see
bench_flash_bwd.py / BENCH_NOTES.md): per-call wall timing over the
tunneled chip measures the ~25 ms host<->device overhead, not the
kernel, so we scan n1 and n2 iterations under one jit and take
(t2 - t1) / (n2 - n1).

Usage (on the TPU chip):
    python tools/benchmarks/bench_ring_flash.py
Prints one JSON line per seq len with median device ms per call.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mmf_tpu.ops.ring_attention import ring_attention_sharded


def _time_fn(fn, *args, repeats=4, n1=5, n2=25):
    @functools.partial(jax.jit, static_argnums=0)
    def many(n, q, k, v):
        def body(c, i):
            out = fn(q + (i * 1e-6 + c * 0).astype(q.dtype), k, v)
            return c + out.astype(jnp.float32).sum(), None

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--seqs", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    args = ap.parse_args()

    mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    rng = np.random.RandomState(0)
    for S in args.seqs:
        shape = (args.batch, args.heads, S, args.dim)
        q = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        k = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        row = {"S": S, "B": args.batch, "H": args.heads, "D": args.dim}
        for impl in ("jnp", "flash"):
            f = functools.partial(
                ring_attention_sharded, mesh=mesh, axis="seq", impl=impl
            )
            row[impl + "_ms"] = round(_time_fn(f, q, k, v) * 1e3, 3)
        row["speedup"] = round(row["jnp_ms"] / row["flash_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
