#!/bin/bash
# Round-2 TPU work queue — run as soon as the tunnel recovers.
# Sequential on purpose: the tunnel serializes clients, and timing
# experiments are invalid with concurrent users (CLAUDE.md).  Keep the
# host QUIET (no pytest/CPU-heavy work) while artifact/bench stages run.
# Usage: bash scratch/tpu_queue.sh [stage]   (stage: all|health|hwfail|hw|artifacts|bench)
set -u
cd /root/repo
STAGE="${1:-all}"
LOG=/tmp/tpu_queue.log
run() { echo "== $* == $(date -u +%H:%M:%S)" | tee -a "$LOG"; "$@" 2>&1 | tail -20 | tee -a "$LOG"; }

if [ "$STAGE" = all ] || [ "$STAGE" = health ]; then
  run timeout 180 python -m eigen_value_tpu.utils.health --deadline-s 90
fi

if [ "$STAGE" = all ] || [ "$STAGE" = hwfail ]; then
  # the two failures from the 2026-08-17 21:57 run, solo with full tracebacks
  # (exported-artifact ValueError text was lost to tail-20; drift-envelope
  # failure overlapped a concurrent pytest run — suspected host-load artifact)
  echo "== hw failures re-run ==" | tee -a "$LOG"
  timeout 900 env RUN_TPU_TESTS=1 python -m pytest \
    "tests/test_tpu_hw.py::test_exported_artifact_runs_on_hardware" \
    "tests/test_tpu_hw.py::TestHardwarePerfGate::test_drift_suite_on_hardware" \
    -q --tb=long 2>&1 | tee /tmp/hwfail.log | tail -60 | tee -a "$LOG"
fi

if [ "$STAGE" = hw ]; then
  run timeout 1800 env RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
fi

if [ "$STAGE" = all ] || [ "$STAGE" = artifacts ]; then
  # e2e ladder with the fixed chain carry (commit ed78fcc) — the earlier
  # regeneration's iterated-backend rows were hoisted out of the loop
  echo "== e2e ladder artifact (all backends, flagship dim) ==" | tee -a "$LOG"
  timeout 2400 python -m eigen_value_tpu.bench --suite e2e --json \
    --dims 8192 --reps 3 \
    > docs/bench/e2e_r2b.jsonl 2>>"$LOG" && tail -3 docs/bench/e2e_r2b.jsonl | tee -a "$LOG"
  echo "== sharded artifact (timed out at 1200s on the wedging tunnel last try) ==" | tee -a "$LOG"
  timeout 2400 python -m eigen_value_tpu.bench --suite sharded --json \
    > docs/bench/sharded_tpu_r2b.jsonl 2>>"$LOG" && tail -3 docs/bench/sharded_tpu_r2b.jsonl | tee -a "$LOG"
  echo "== drift artifact ==" | tee -a "$LOG"
  timeout 900 python -m eigen_value_tpu.bench --suite drift --json \
    > docs/bench/drift_r2b.jsonl 2>>"$LOG" && tail -3 docs/bench/drift_r2b.jsonl | tee -a "$LOG"
  echo "== operator artifact (FFT + kron vs dense on the chip) ==" | tee -a "$LOG"
  timeout 1200 python -m eigen_value_tpu.bench --suite operator --json \
    --dims 1024 8192 \
    > docs/bench/operator_tpu_r2.jsonl 2>>"$LOG" && tail -3 docs/bench/operator_tpu_r2.jsonl | tee -a "$LOG"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  # windowed headline record (adaptive extension up to 15 min)
  run timeout 1500 python bench.py
fi
echo "QUEUE DONE $(date -u)" | tee -a "$LOG"
