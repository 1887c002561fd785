"""Serving-stack benchmark: closed-loop concurrent clients against
(MicroBatcher + ServingEngine) on the attached accelerator.

Measures what the HTTP front-end would deliver minus socket overhead:
achieved throughput, request latency (p50/p95), and the batch sizes the
micro-batcher actually formed, for a sweep of client concurrencies. The
model is VisualBERT-base eval at the BASELINE.json shapes (S=128 text +
100 regions). Note the dev-harness tunnel adds ~25 ms fixed per device
dispatch (BENCH_NOTES.md "Forward-pass anatomy"); on a directly-attached
host, subtract that from every latency row.

Usage: python tools/benchmarks/bench_serve.py [--requests 64]
       [--concurrency 1,4,16,32] [--dtype bfloat16] [--max-batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_engine(dtype: str, max_batch: int):
    import jax

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import load_yaml
    from mmf_tpu.serving.engine import ServingEngine
    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    from mmf_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache(
        cache_dir=os.environ.get("MMF_COMPILATION_CACHE_DIR")
    )
    cfg = load_yaml("configs/models/visual_bert/defaults.yaml")
    mc = cfg["model_config"]["visual_bert"]
    mc["training_head_type"] = "classification"
    mc["num_labels"] = 3129
    mc["dtype"] = dtype
    model = registry.get_model_class("visual_bert")(config=mc)

    rng = np.random.RandomState(0)
    T, R = 128, 100
    sample = {
        "input_ids": rng.randint(0, 30522, (T,)).astype(np.int32),
        "input_mask": np.ones((T,), np.int32),
        "segment_ids": np.zeros((T,), np.int32),
        "image_feature_0": rng.randn(R, 2048).astype(np.float32),
        "image_info_0": {"max_features": np.asarray(R, np.int32)},
        "dataset_name": "vqa2",
        "dataset_type": "test",
    }
    batch1 = {
        "input_ids": sample["input_ids"][None],
        "input_mask": sample["input_mask"][None],
        "segment_ids": sample["segment_ids"][None],
        "image_feature_0": sample["image_feature_0"][None],
        "image_info_0": {
            "max_features": np.asarray([R], np.int32)
        },
        "dataset_name": "vqa2",
        "dataset_type": "test",
    }
    variables = model.init(jax.random.PRNGKey(0), batch1, False)
    engine = ServingEngine(
        lambda v, b: model.apply(v, b, False), variables,
        max_batch_size=max_batch, output_fields=("scores",),
    )
    return engine, sample


def run_level(engine, sample, n_clients: int, requests: int,
              max_wait_ms: float):
    from mmf_tpu.serving.batcher import MicroBatcher

    batcher = MicroBatcher(
        engine.predict_many, max_batch_size=engine.max_batch_size,
        max_wait_ms=max_wait_ms,
        predict_many_async=engine.predict_many_async,
    )
    per_client = max(1, requests // n_clients)
    lat = []
    lat_lock = threading.Lock()

    def client():
        for _ in range(per_client):
            t0 = time.perf_counter()
            batcher.predict(sample, timeout=120)
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats = batcher.stats()
    batcher.close()
    lat = np.sort(np.asarray(lat))
    total = per_client * n_clients
    return {
        "clients": n_clients,
        "requests": total,
        "qps": round(total / wall, 1),
        "p50_ms": round(float(lat[len(lat) // 2]) * 1000, 1),
        "p95_ms": round(float(lat[int(len(lat) * 0.95) - 1]) * 1000, 1),
        "mean_batch": round(stats["mean_batch_size"] or 0, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", default="1,4,16,32")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    args = ap.parse_args()

    engine, sample = build_engine(args.dtype, args.max_batch)
    levels = [int(x) for x in args.concurrency.split(",")]
    print("warmup (compiling buckets)...", flush=True)
    t0 = time.perf_counter()
    engine.warmup(sample)
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    for n in levels:
        res = run_level(engine, sample, n, args.requests, args.max_wait_ms)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
