"""Headline benchmark: VisualBERT-base VQA2 eval throughput (samples/sec/chip).

Measures the flagship model's jitted inference step at VQA2 shapes
(seq 128 text + 100 regions, answer space 3129) in the production config
(bf16 compute), and anchors ``vs_baseline`` to the **measured PyTorch
reference** (mmf/models/visual_bert.py VisualBERTBase + classifier, fp32,
eval) running on the hardware available to this image (torch here is
CPU-only; BASELINE.md: throughput baselines are to be measured against the
mounted reference, not quoted). BENCH_NOTES.md carries the GPU roofline
extrapolation for the ">5x PyTorch-GPU" north star.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference measured on this image when live measurement is unavailable
# (tools/benchmarks/bench_reference_torch.py, B=8 fp32 eval, 1-core CPU;
# see BENCH_NOTES.md "Reference baseline" for methodology + caveats).
RECORDED_REF_CPU_SPS = 2.94


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


def _reference_baseline() -> tuple[float, str]:
    """Measure the PyTorch reference live on this host; fall back to the
    recorded measurement if the reference checkout isn't importable.

    B=8 is the reference's best measured per-sample configuration on this
    host (B=64 measures ~25% slower per sample on the 1-core CPU) —
    using the reference's best case keeps the comparison conservative."""
    try:
        import os
        import sys

        repo_root = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(repo_root, "tools", "benchmarks"))
        from bench_reference_torch import measure

        result = measure(batch_size=8, warmup=1, iters=3)
        live = float(result["samples_per_sec"])
        # Anchor to the reference's BEST known number on this host: a live
        # run under concurrent CPU load can measure the torch reference
        # ~3x slower than its idle rate, which would inflate vs_baseline.
        if live < RECORDED_REF_CPU_SPS:
            return RECORDED_REF_CPU_SPS, (
                f"recorded_torch_cpu (live {live:.2f} under load; "
                "using best-known idle measurement)"
            )
        return live, "measured_live_torch_cpu"
    except Exception as e:  # reference not mounted / import failure
        return RECORDED_REF_CPU_SPS, f"recorded_torch_cpu ({type(e).__name__})"


# Most recent completed live measurement (2026-08-17, this chip): used
# only when the live run cannot finish (the tunnel's remote-compile
# service intermittently hangs for >10 min; observed and documented in
# BENCH_NOTES.md). A fallback result is explicitly labeled.
RECORDED_TPU_BF16_SPS = 3239.3
LIVE_TIMEOUT_S = 540


def _result(value, ref_sps, ref_source, value_source):
    return {
        "metric": "VQA2 samples/sec/chip (VisualBERT-base eval, bf16)",
        "value": round(value, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(value / ref_sps, 1),
        "value_source": value_source,
        "baseline": {
            "reference_torch_sps": ref_sps,
            "source": ref_source,
            "definition": (
                "measured PyTorch reference VisualBERT-base fp32 "
                "eval on this host's CPU (see BENCH_NOTES.md for "
                "the GPU roofline extrapolation)"
            ),
        },
    }


def main():
    value = _throughput("bfloat16")
    ref_sps, ref_source = _reference_baseline()
    print(json.dumps(_result(value, ref_sps, ref_source, "measured_live")))


def main_guarded():
    """Run the live measurement in a subprocess with a hard timeout so a
    hung remote-compile service yields a labeled recorded-value line
    instead of no record at all."""
    import os
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--live"],
            capture_output=True,
            timeout=LIVE_TIMEOUT_S,
        )
        if proc.returncode == 0:
            for line in proc.stdout.decode().splitlines():
                if line.startswith("{"):
                    print(line)
                    return
        failure = f"live bench rc={proc.returncode}"
    except subprocess.TimeoutExpired:
        failure = f"live bench exceeded {LIVE_TIMEOUT_S}s (tunnel hang)"

    ref_sps, ref_source = _reference_baseline()
    out = _result(
        RECORDED_TPU_BF16_SPS, ref_sps, ref_source,
        f"recorded_2026-08-17 ({failure}; see BENCH_NOTES.md)",
    )
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if "--live" in sys.argv:
        main()
    else:
        main_guarded()
