#!/bin/bash
# Serialized train-throughput flag/batch sweep (ONE job on the chip at a
# time — concurrent tunnel jobs contend and corrupt numbers; see
# BENCH_NOTES.md "Cross-session variance"). Starts $OUT fresh and writes
# one JSON line per run, each preceded by "--- <tag>" and followed by
# "exit=<status>" so timeouts/failures are distinguishable from results.
set -u
cd "$(dirname "$0")/../.."
OUT=${OUT:-/tmp/train_sweep.jsonl}
: > "$OUT"

run() {
  local tag="$1"; shift
  echo "--- $tag" >> "$OUT"
  timeout 540 python tools/benchmarks/bench_train.py "$@" \
    2> "${OUT%.jsonl}.$tag.stderr" | tail -1 >> "$OUT"
  # PIPESTATUS[0] is python's status (plain $? would be tail's, which
  # masks crashes/timeouts as exit=0)
  echo "exit=${PIPESTATUS[0]}" >> "$OUT"
}

# b32_clean repeats interleaved through the sweep measure within-session
# spread (VERDICT r4 #3: train numbers must reproduce to +-5% before any
# lever claim is falsifiable)
run b32_clean_a --batch_size 32 --iters 16
run b64_clean --batch_size 64 --iters 16
XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
  run b64_lhs --batch_size 64 --iters 16
run b32_clean_b --batch_size 32 --iters 16
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  run b64_vmem64 --batch_size 64 --iters 16
XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=true" \
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  run b64_lhs_vmem64 --batch_size 64 --iters 16
run b64_accum2 --batch_size 32 --iters 16 --accum 2
run b128_clean --batch_size 128 --iters 16
run b32_clean_c --batch_size 32 --iters 16
echo DONE >> "$OUT"
