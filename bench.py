"""Headline benchmark: VisualBERT-base VQA2 eval throughput (samples/sec/chip).

Measures the flagship model's jitted inference step at VQA2 shapes
(seq 128 text + 100 regions, answer space 3129) in the production config
(bf16 compute). ``vs_baseline`` compares against the same model in the
naive configuration (float32 compute) — the closest stand-in for the
reference's default precision path, since the PyTorch reference cannot run
on this TPU host (BASELINE.md: throughput baselines must be measured).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def _throughput(
    dtype: str, batch_size: int = 64, iters: int = 100, repeats: int = 3
) -> float:
    """Time ``iters`` chained forwards inside ONE jitted call returning a
    scalar — measures device compute, not host<->device tunnel latency
    (block_until_ready through this host's remote-execution tunnel does not
    reflect device completion; a scalar fetch does). Best-of-``repeats``
    to damp tunnel/host contention noise (~20% run-to-run observed).
    ``iters=100`` amortizes the measured ~25 ms fixed per-call tunnel
    overhead to <1% (two-point scan-length probes in
    tools/benchmarks/prof_gemm.py isolate it)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _visual_bert

    model = _visual_bert({"dtype": dtype})
    batch = _example_batch(batch_size=batch_size)
    meta = {"dataset_name": "vqa2", "dataset_type": "val"}
    variables = model.init(
        jax.random.PRNGKey(0), dict(batch, **meta), False
    )

    @jax.jit
    def forward_many(variables, batch):
        def body(carry, x):
            # data-dependence on the loop index prevents hoisting/CSE
            b = dict(batch)
            b["image_feature_0"] = batch["image_feature_0"] + x * 1e-6 + carry * 0
            scores = model.apply(variables, dict(b, **meta), False)["scores"]
            return carry + jnp.sum(scores.astype(jnp.float32)), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters, dtype=jnp.float32)
        )
        return total

    float(forward_many(variables, batch))  # compile + warmup (scalar fetch)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_many(variables, batch))
        best = min(best, time.perf_counter() - t0)
    return batch_size * iters / best


def main():
    value = _throughput("bfloat16")
    baseline = _throughput("float32")
    print(
        json.dumps(
            {
                "metric": "VQA2 samples/sec/chip (VisualBERT-base eval, bf16)",
                "value": round(value, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
