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
# Recorded Hateful Memes MMBT-grid batch-1 latency (2026-08-18, this
# chip, tools/benchmarks/bench_latency.py): end-to-end p50 through the
# tunnel and the two-point marginal on-device compute time.
RECORDED_HM_P50_MS = 29.6
RECORDED_HM_DEVICE_MS = 0.70
LIVE_TIMEOUT_S = 540
LATENCY_TIMEOUT_S = 420


def _latency_metric():
    """Second BASELINE.json metric: Hateful Memes MMBT-grid batch-1
    inference latency (p50 end-to-end + on-device marginal), via
    tools/benchmarks/bench_latency.py's measure()."""
    import os
    import sys

    repo_root = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(repo_root, "tools", "benchmarks"))
    from bench_latency import measure

    p50, p95, device_ms = measure(samples=30)
    return {
        "metric": "Hateful Memes p50 inference latency "
                  "(MMBT-grid, bfloat16, batch 1)",
        "value": round(p50, 2),
        "unit": "ms",
        "p95_ms": round(p95, 2),
        "device_ms": round(device_ms, 3),
        "value_source": "measured_live",
        "note": "end-to-end p50 includes ~25 ms fixed host<->device "
                "tunnel overhead on this image; device_ms is the "
                "two-point marginal on-device compute time",
    }


def _result(value, ref_sps, ref_source, value_source, secondary=None):
    """secondary: dict = include it; None = include the recorded
    fallback; False = omit (the --live subprocess measures only the
    primary; main_guarded attaches the separately-guarded secondary)."""
    out = {
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
    if secondary is None:
        secondary = {
            "metric": "Hateful Memes p50 inference latency "
                      "(MMBT-grid, bfloat16, batch 1)",
            "value": RECORDED_HM_P50_MS,
            "unit": "ms",
            "device_ms": RECORDED_HM_DEVICE_MS,
            "value_source": "recorded_2026-08-18 (live run unavailable; "
                            "see BENCH_NOTES.md)",
        }
    if secondary is not False:
        out["secondary_metric"] = secondary
    return out


def main():
    value = _throughput("bfloat16")
    ref_sps, ref_source = _reference_baseline()
    print(json.dumps(
        _result(value, ref_sps, ref_source, "measured_live",
                secondary=False)
    ))


def main_latency():
    print(json.dumps(_latency_metric()))


def _run_live(mode: str, timeout_s: int):
    """Run one metric's live measurement in its own subprocess with its
    own hard timeout — the tunnel's remote-compile service hangs
    intermittently, and metric 2 hanging must not sink metric 1's live
    run (and vice versa). Returns the parsed JSON line or None."""
    import os
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True,
            timeout=timeout_s,
        )
        if proc.returncode == 0:
            for line in proc.stdout.decode().splitlines():
                if line.startswith("{"):
                    return json.loads(line), None
        return None, f"rc={proc.returncode}"
    except subprocess.TimeoutExpired:
        return None, f"exceeded {timeout_s}s (tunnel hang)"


def main_guarded():
    """Emit ONE JSON line carrying both BASELINE.json metrics, each from
    its own timeout-guarded live subprocess, falling back (labeled) to
    the most recent completed measurement when the tunnel is hung."""
    primary, fail1 = _run_live("--live", LIVE_TIMEOUT_S)
    secondary, fail2 = _run_live("--latency", LATENCY_TIMEOUT_S)
    if secondary is None:
        secondary = {
            "metric": "Hateful Memes p50 inference latency "
                      "(MMBT-grid, bfloat16, batch 1)",
            "value": RECORDED_HM_P50_MS,
            "unit": "ms",
            "device_ms": RECORDED_HM_DEVICE_MS,
            "value_source": f"recorded_2026-08-18 (live: {fail2}; "
                            "see BENCH_NOTES.md)",
        }
    if primary is not None:
        primary["secondary_metric"] = secondary
        print(json.dumps(primary))
        return

    ref_sps, ref_source = _reference_baseline()
    out = _result(
        RECORDED_TPU_BF16_SPS, ref_sps, ref_source,
        f"recorded_2026-08-17 (live bench {fail1}; see BENCH_NOTES.md)",
        secondary=secondary,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    if "--live" in sys.argv:
        main()
    elif "--latency" in sys.argv:
        main_latency()
    else:
        main_guarded()
