"""Measure the PyTorch reference's VisualBERT eval throughput on this host.

This is the measured baseline BASELINE.md calls for ("throughput baselines
are to be measured against the mounted reference"): the reference
``VisualBERTBase`` trunk (mmf/models/visual_bert.py:74) at base size plus
the classification projection, eval forward at the headline bench shapes
(B=64, 128 text tokens + 100 regions, 3129 answers), fp32, on the CPUs
available to this image (torch here is CPU-only).

Usage:  python tools/benchmarks/bench_reference_torch.py [--batch 64]
Prints one JSON line {"samples_per_sec": ..., "sec_per_batch": ..., ...}.

The resulting number is recorded in BENCH_NOTES.md and used by bench.py as
the reference anchor for ``vs_baseline`` (bench.py re-measures live when
the reference is importable; this script is the standalone version).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_reference_visual_bert():
    """Reference VisualBERTBase at bert-base size + VQA2 classifier head.

    Built from an explicit BertConfig (no pretrained download), matching
    the shapes bench.py uses for the JAX model.
    """
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tests.reference_parity import shims  # adds /root/reference to path

    shims.install()
    import torch
    from transformers import BertConfig

    import mmf.models.visual_bert as ref_visual_bert

    bert_config = BertConfig(
        vocab_size=30522,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        max_position_embeddings=512,
        type_vocab_size=2,
    )
    trunk = ref_visual_bert.VisualBERTBase(
        bert_config, visual_embedding_dim=2048
    ).eval()
    classifier = torch.nn.Linear(768, 3129).eval()
    return trunk, classifier


def measure(batch_size=64, seq_len=128, regions=100, warmup=1, iters=3):
    import numpy as np
    import torch

    trunk, classifier = build_reference_visual_bert()

    rng = np.random.RandomState(0)
    input_ids = torch.from_numpy(rng.randint(0, 30522, (batch_size, seq_len)))
    token_type_ids = torch.zeros((batch_size, seq_len), dtype=torch.long)
    visual = torch.from_numpy(
        rng.randn(batch_size, regions, 2048).astype(np.float32)
    )
    visual_type = torch.ones((batch_size, regions), dtype=torch.long)
    mask = torch.ones((batch_size, seq_len + regions))

    times = []
    with torch.no_grad():
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            _, pooled, _ = trunk(
                input_ids, mask, token_type_ids, visual, visual_type
            )
            scores = classifier(pooled)
            scores.numpy()  # force materialization
            dt = time.perf_counter() - t0
            if i >= warmup:
                times.append(dt)
    best = min(times)
    return {
        "samples_per_sec": round(batch_size / best, 2),
        "sec_per_batch": round(best, 3),
        "batch_size": batch_size,
        "torch_threads": torch.get_num_threads(),
        "iters": iters,
    }


def measure_train(batch_size=32, seq_len=128, regions=100, warmup=1,
                  iters=3):
    """Reference train step: fp32 forward + BCE-with-logits loss +
    backward + AdamW, mirroring our bench_train.py shapes (B=32)."""
    import numpy as np
    import torch

    trunk, classifier = build_reference_visual_bert()
    trunk.train()
    classifier.train()
    params = list(trunk.parameters()) + list(classifier.parameters())
    opt = torch.optim.AdamW(params, lr=1e-5)

    rng = np.random.RandomState(0)
    input_ids = torch.from_numpy(rng.randint(0, 30522, (batch_size, seq_len)))
    token_type_ids = torch.zeros((batch_size, seq_len), dtype=torch.long)
    visual = torch.from_numpy(
        rng.randn(batch_size, regions, 2048).astype(np.float32)
    )
    visual_type = torch.ones((batch_size, regions), dtype=torch.long)
    mask = torch.ones((batch_size, seq_len + regions))
    targets = torch.from_numpy(
        (rng.rand(batch_size, 3129) > 0.5).astype(np.float32)
    )

    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        opt.zero_grad()
        _, pooled, _ = trunk(
            input_ids, mask, token_type_ids, visual, visual_type
        )
        scores = classifier(pooled)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            scores, targets
        ) * targets.size(1)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 1.0)
        opt.step()
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
    best = min(times)
    return {
        "mode": "train",
        "samples_per_sec": round(batch_size / best, 2),
        "sec_per_step": round(best, 3),
        "batch_size": batch_size,
        "torch_threads": __import__("torch").get_num_threads(),
        "iters": iters,
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--train", action="store_true")
    args = p.parse_args()
    if args.train:
        print(json.dumps(measure_train(batch_size=args.batch,
                                       iters=args.iters)))
    else:
        print(json.dumps(measure(batch_size=args.batch, iters=args.iters)))
