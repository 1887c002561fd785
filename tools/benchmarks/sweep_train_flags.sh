#!/bin/bash
# Serialized train-throughput flag/batch sweep (ONE job on the chip at a
# time — concurrent tunnel jobs contend and corrupt numbers; see
# BENCH_NOTES.md "Cross-session variance"). Starts $OUT fresh and writes
# one JSON line per run, each preceded by "--- <tag>" and followed by
# "exit=<python status>" (via PIPESTATUS — plain $? would be tail's and
# mask crashes); per-run stderr is kept next to $OUT. Results recorded
# in BENCH_NOTES.md "Train flag/batch sweep".
set -u
cd "$(dirname "$0")/../.."
OUT=${OUT:-/tmp/train_sweep.jsonl}
: > "$OUT"

run() {
  local tag="$1"; shift
  echo "--- $tag $(date +%H:%M:%S)" >> "$OUT"
  # remote compile over the tunnel is session-variable: the accum-8
  # step compiled in ~9 min one session and ~23 min another — hence
  # the generous timeout
  timeout 1800 python tools/benchmarks/bench_train.py "$@" \
    2> "${OUT%.jsonl}.$tag.stderr" | tail -1 >> "$OUT"
  echo "exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$OUT"
}

# b32_clean repeats interleaved through the sweep measure within-session
# spread (VERDICT r4 #3: train numbers must reproduce to +-5% before any
# lever claim is falsifiable; measured spread 2026-08-20: 0.28%)
run b32_clean_a --batch_size 32 --iters 16
run b64_clean --batch_size 64 --iters 16
# NOTE: the XLA_FLAGS spelling --xla_tpu_enable_latency_hiding_scheduler
# is unknown to this build (instant crash); the libtpu spelling parses
# but measured exactly baseline on this single-chip workload
LIBTPU_INIT_ARGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  run b64_lhs --batch_size 64 --iters 16
run b32_clean_b --batch_size 32 --iters 16
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  run b64_vmem64 --batch_size 64 --iters 16
run b32_accum2 --batch_size 32 --iters 16 --accum 2
run b64_accum2 --batch_size 64 --iters 16 --accum 2
run b32_accum4 --batch_size 32 --iters 16 --accum 4
run b32_accum8 --batch_size 32 --iters 8 --accum 8
run b128_clean --batch_size 128 --iters 16
run b32_clean_c --batch_size 32 --iters 16
echo DONE >> "$OUT"
