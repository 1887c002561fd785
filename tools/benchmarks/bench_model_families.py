"""Eval throughput across model families (samples/sec/chip, bf16).

Same methodology as bench.py: ``iters`` chained forwards inside ONE
jitted call with a scalar result fetched (the tunnel's ~25 ms per-call
overhead amortizes out; block_until_ready does not reflect device
completion through the tunnel). Best-of-3.

Run:  python tools/benchmarks/bench_model_families.py [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import json
import time

import numpy as np


def _measure(model, variables, batch, meta, iters=50, repeats=3):
    import jax
    import jax.numpy as jnp

    # Batch MUST be device-resident before timing: a numpy batch is
    # re-uploaded through the host<->device tunnel (~35 MB/s) on every
    # timed call, which understated the two-stream models by ~2.5x
    # (ViLBERT measured 1375 with a numpy batch vs 3440 device-resident;
    # prof_vilbert_full.py). bench.py was always immune (jnp batch).
    batch = jax.device_put(batch, jax.devices()[0])

    moving_key = ("image_feature_0" if "image_feature_0" in batch
                  else "image")

    @jax.jit
    def forward_many(variables, batch):
        def body(carry, x):
            b = dict(batch)
            b[moving_key] = batch[moving_key] + x * 1e-6 + carry * 0
            out = model.apply(variables, dict(b, **meta), False)
            scores = out["scores"]
            return carry + jnp.sum(scores.astype(jnp.float32)), None

        final, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.float32)
        )
        return final

    float(forward_many(variables, batch))  # compile
    best = float("inf")
    bsz = next(iter(batch.values())).shape[0]
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_many(variables, batch))
        best = min(best, time.perf_counter() - t0)
    return bsz * iters / best


def bench_vilt(batch_size):
    import jax

    from mmf_tpu.common.registry import registry

    cfg = {
        "hidden_size": 768, "num_hidden_layers": 12,
        "num_attention_heads": 12,
        "heads": {"vqa2": [{"type": "mlp", "in_dim": 768,
                            "hidden_size": 1536, "num_labels": 3129,
                            "num_layers": 1,
                            "hidden_dropout_prob": 0.0}]},
        "image_encoder": {"type": "vit",
                          "params": {"image_size": [224, 224],
                                     "patch_size": 32, "mlp_dim": 3072}},
        "text_embeddings": {"hidden_size": 768,
                            "max_position_embeddings": 512,
                            "vocab_size": 30522},
        "dtype": "bfloat16",
    }
    rng = np.random.RandomState(0)
    T = 40  # ViLT finetune text length
    batch = {
        "input_ids": rng.randint(0, 30522, (batch_size, T)),
        "input_mask": np.ones((batch_size, T), np.int32),
        "segment_ids": np.zeros((batch_size, T), np.int32),
        "image": rng.randn(batch_size, 3, 224, 224).astype(np.float32),
    }
    meta = {"dataset_name": "vqa2", "dataset_type": "val"}
    model = registry.get_model_class("vilt")(config=cfg)
    variables = jax.jit(lambda r, b: model.init(r, dict(b, **meta), False))(
        jax.random.PRNGKey(0), batch)
    return _measure(model, variables, batch, meta)


def bench_uniter(batch_size):
    import jax

    from mmf_tpu.common.registry import registry

    cfg = {
        "hidden_size": 768, "num_hidden_layers": 12,
        "num_attention_heads": 12, "vocab_size": 30522,
        "img_dim": 2048, "do_pretraining": False, "tasks": "vqa2",
        "heads": {"vqa2": {"type": "mlp", "num_labels": 3129,
                           "hidden_size": 768}},
        "hidden_dropout_prob": 0.0, "dtype": "bfloat16",
    }
    rng = np.random.RandomState(0)
    T, R = 128, 100
    batch = {
        "input_ids": rng.randint(0, 30522, (batch_size, T)),
        "input_mask": np.ones((batch_size, T), np.int32),
        "segment_ids": np.zeros((batch_size, T), np.int32),
        "image_feature_0": rng.randn(batch_size, R, 2048).astype(np.float32),
        "image_info_0": {
            "bbox": rng.rand(batch_size, R, 4).astype(np.float32),
            "max_features": np.full((batch_size,), R),
        },
    }
    meta = {"dataset_name": "vqa2", "dataset_type": "val"}
    model = registry.get_model_class("uniter")(config=cfg)
    variables = jax.jit(lambda r, b: model.init(r, dict(b, **meta), False))(
        jax.random.PRNGKey(0), batch)
    return _measure(model, variables, batch, meta)


def bench_mmbt(batch_size):
    import jax

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import load_yaml

    cfg = dict(load_yaml("configs/models/mmbt/defaults.yaml")
               ["model_config"]["mmbt"])
    cfg.update(training_head_type="classification", num_labels=2,
               dtype="bfloat16", direct_features_input=True)
    rng = np.random.RandomState(0)
    T = 128
    batch = {
        "input_ids": rng.randint(0, 30522, (batch_size, T)),
        "input_mask": np.ones((batch_size, T), np.int32),
        "segment_ids": np.zeros((batch_size, T), np.int32),
        "image_feature_0": rng.randn(batch_size, 1, 2048).astype(np.float32),
    }
    meta = {"dataset_name": "hateful_memes", "dataset_type": "val"}
    model = registry.get_model_class("mmbt")(config=cfg)
    variables = jax.jit(lambda r, b: model.init(r, dict(b, **meta), False))(
        jax.random.PRNGKey(0), batch)
    return _measure(model, variables, batch, meta)


def bench_vilbert(batch_size):
    import jax

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config.configuration import load_yaml

    cfg = dict(load_yaml("configs/models/vilbert/defaults.yaml")
               ["model_config"]["vilbert"])
    cfg.update(training_head_type="classification", num_labels=3129,
               dtype="bfloat16", hidden_dropout_prob=0.0)
    rng = np.random.RandomState(0)
    T, R = 128, 100
    batch = {
        "input_ids": rng.randint(0, 30522, (batch_size, T)),
        "input_mask": np.ones((batch_size, T), np.int32),
        "segment_ids": np.zeros((batch_size, T), np.int32),
        "image_feature_0": rng.randn(batch_size, R, 2048).astype(np.float32),
        "image_info_0": {
            "max_features": np.full((batch_size,), R),
            "bbox": rng.rand(batch_size, R, 5).astype(np.float32),
        },
    }
    meta = {"dataset_name": "vqa2", "dataset_type": "val"}
    model = registry.get_model_class("vilbert")(config=cfg)
    variables = jax.jit(lambda r, b: model.init(r, dict(b, **meta), False))(
        jax.random.PRNGKey(0), batch)
    return _measure(model, variables, batch, meta)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--models", default="vilt,uniter,mmbt,vilbert")
    args = p.parse_args()

    from mmf_tpu.utils.env import setup_imports

    setup_imports()
    fns = {"vilt": bench_vilt, "uniter": bench_uniter,
           "mmbt": bench_mmbt, "vilbert": bench_vilbert}
    results = {}
    for name in args.models.split(","):
        sps = fns[name](args.batch)
        results[name] = round(sps, 1)
        print(json.dumps({"model": name, "samples_per_sec_chip": results[name],
                          "batch": args.batch, "dtype": "bf16"}))
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
