"""Hateful Memes p50 inference latency (the second BASELINE.json metric):
single-sample MMBT-grid classification latency distribution on the
attached accelerator.

Latency is measured per call with a device-fenced scalar fetch; p50/p95
over --samples calls after warmup.

Usage: python tools/benchmarks/bench_latency.py [--samples 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def measure(samples: int, dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import load_yaml
    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    cfg = load_yaml("configs/models/mmbt/defaults.yaml")
    mc = cfg["model_config"]["mmbt"]
    mc["training_head_type"] = "classification"
    mc["num_labels"] = 2
    mc["dtype"] = dtype
    model = registry.get_model_class("mmbt")(config=mc)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 30522, (1, 128))),
        "input_mask": jnp.ones((1, 128), jnp.int32),
        "segment_ids": jnp.zeros((1, 128), jnp.int32),
        "image": jnp.asarray(rng.randn(1, 3, 224, 224).astype(np.float32)),
    }
    meta = {"dataset_name": "hateful_memes", "dataset_type": "test"}
    variables = model.init(jax.random.PRNGKey(0), dict(batch, **meta), False)

    @jax.jit
    def forward(variables, batch):
        scores = model.apply(variables, dict(batch, **meta), False)["scores"]
        return jnp.sum(scores.astype(jnp.float32))

    float(forward(variables, batch))  # compile
    lat = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(forward(variables, batch))  # scalar fetch = device fence
        lat.append((time.perf_counter() - t0) * 1000)
    lat = np.asarray(lat)

    # device-only latency: end-to-end latency through this host's tunnel
    # carries a fixed ~25 ms per-call overhead (BENCH_NOTES.md); chain N
    # forwards in one call and take the marginal to isolate device time
    def chained(n, repeats=3):
        @jax.jit
        def forward_many(variables, batch):
            def body(c, _):
                # carry-dependence keeps the forward inside the scan
                # (a loop-invariant body gets hoisted and measures zero)
                b = dict(batch)
                b["image"] = batch["image"] + c * 1e-9
                scores = model.apply(variables, dict(b, **meta), False)[
                    "scores"
                ]
                return c + jnp.sum(scores.astype(jnp.float32)) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return c

        float(forward_many(variables, batch))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(forward_many(variables, batch))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = chained(10), chained(60)
    device_ms = (t2 - t1) / 50 * 1000
    return (float(np.percentile(lat, 50)), float(np.percentile(lat, 95)),
            device_ms)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=50)
    parser.add_argument("--dtype", choices=["bfloat16", "float32"],
                        default="bfloat16")
    args = parser.parse_args()
    p50, p95, device_ms = measure(args.samples, args.dtype)
    print(json.dumps({
        "metric": "Hateful Memes p50 inference latency (MMBT-grid, "
                  f"{args.dtype}, batch 1)",
        "value": round(p50, 2),
        "unit": "ms",
        "p95_ms": round(p95, 2),
        "device_ms": round(device_ms, 2),
    }))


if __name__ == "__main__":
    main()
