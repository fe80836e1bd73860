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
# artifact <out.jsonl> <timeout_s> <bench args...>: write to a temp file and
# mv only on success, so a timeout/wedge can't leave an empty artifact behind
artifact() {
  local out="$1" tmo="$2"; shift 2
  echo "== artifact $out ($*) == $(date -u +%H:%M:%S)" | tee -a "$LOG"
  if timeout "$tmo" python -m eigen_value_tpu.bench "$@" > "$out.tmp" 2>>"$LOG" \
     && [ -s "$out.tmp" ]; then
    mv "$out.tmp" "$out"; tail -3 "$out" | tee -a "$LOG"
  else
    echo "FAILED/EMPTY: $out (left $out.tmp)" | tee -a "$LOG"
  fi
}

if [ "$STAGE" = all ] || [ "$STAGE" = health ]; then
  run timeout 180 python -m eigen_value_tpu.utils.health --deadline-s 90
fi

if [ "$STAGE" = all ] || [ "$STAGE" = hwfail ]; then
  # full-fact diagnostic for the 2026-08-17 exported-artifact ValueError
  # (cheap: one 1024² export + call; answers land in /tmp/diag_export.log)
  echo "== export diagnostic ==" | tee -a "$LOG"
  timeout 600 python scratch/diag_export_hw.py 2>&1 | tee /tmp/diag_export.log | tail -30 | tee -a "$LOG"
fi

if [ "$STAGE" = hwfail ]; then
  # solo re-run of previously-failing hw tests with full tracebacks
  echo "== hw failures re-run ==" | tee -a "$LOG"
  timeout 900 env RUN_TPU_TESTS=1 python -m pytest \
    "tests/test_tpu_hw.py::test_exported_artifact_runs_on_hardware" \
    "tests/test_tpu_hw.py::TestHardwarePerfGate::test_drift_suite_on_hardware" \
    -q --tb=long 2>&1 | tee /tmp/hwfail.log | tail -60 | tee -a "$LOG"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = hw ]; then
  # FULL hardware regression gate before any artifact regeneration — a
  # regression in parity/roofline/export must fail here, not ship silently
  # into docs/bench.  Full tracebacks land in /tmp/hw_full.log.
  echo "== full hw gate ==" | tee -a "$LOG"
  timeout 1800 env RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py \
    -q --tb=long 2>&1 | tee /tmp/hw_full.log | tail -40 | tee -a "$LOG"
fi

if [ "$STAGE" = all ] || [ "$STAGE" = artifacts ]; then
  # e2e ladder with the fixed chain carry (commit ed78fcc) — the earlier
  # regeneration's iterated-backend rows were hoisted out of the loop
  artifact docs/bench/e2e_r2b.jsonl 2400 --suite e2e --json --dims 8192 --reps 3
  artifact docs/bench/sharded_tpu_r2b.jsonl 2400 --suite sharded --json
  artifact docs/bench/drift_r2b.jsonl 900 --suite drift --json
  artifact docs/bench/operator_tpu_r2.jsonl 1200 --suite operator --json --dims 1024 8192
fi

if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  # windowed headline record (adaptive extension up to 15 min).  The
  # outer timeout must cover bench.py's own worst case — attempt (1200s)
  # + recovery wait (900s) + retry attempt (1200s) — or the recovery
  # retry can never run; 3500s > 3300s with headroom.
  run timeout 3500 python bench.py
fi
echo "QUEUE DONE $(date -u)" | tee -a "$LOG"
