#!/bin/bash
# One-shot TPU re-warm + measurement session (run when the axon relay is up).
# Serializes every TPU job (single-tenant relay). Logs to /tmp/tpu_session.log.
#
#   bash tools/tpu_session.sh
#
# Steps:
#  1. bench output/convert/spend (regenerates the digest-keyed test params
#     on TPU — spend ~24 min one-time — and re-warms the XLA cache)
#  2. TPU-gated pallas test suite (MASP_TEST_TPU=1)
#  3. batch-verification bench: host vs device pairing + redjubjub
#  4. spend bench again with MASP_TRACE=1 for the span breakdown

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_session.log
: > "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"
  timeout "${STEP_TIMEOUT:-4200}" "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

run env MASP_BENCH_CIRCUIT=output MASP_BENCH_ITERS=9 python bench.py
run env MASP_BENCH_CIRCUIT=convert MASP_BENCH_ITERS=9 python bench.py
run env MASP_BENCH_CIRCUIT=spend MASP_BENCH_ITERS=3 MASP_BENCH_BATCH=8 python bench.py
run env MASP_BENCH_CIRCUIT=output MASP_BENCH_ITERS=3 MASP_BENCH_BATCH=8 python bench.py
run env MASP_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py -q
run env MASP_VERIFY_BATCH=1 python tools/bench_verify.py
run env MASP_VERIFY_BATCH=8 python tools/bench_verify.py
run env MASP_VERIFY_BATCH=64 python tools/bench_verify.py
run env MASP_TX_ITERS=3 python tools/bench_tx.py
run env MASP_MIXED_ITERS=2 python tools/bench_mixed_batch.py
echo "=== session done $(date -u +%H:%M:%S)" >> "$LOG"
