#!/bin/bash
# Round-6 stress harness for the r5 flake (VERDICT #3):
# tests/test_engine_branches.py::test_zero_default_delay_parity failed
# once in three full-suite runs with the traceback lost.  Run the test
# N times with full tracebacks captured, varying parallelism via
# CBWCIS_TEST_MASTER / CBWCIS_TEST_SHUFFLE (read by tests/conftest.py).
LOG=${1:-/root/repo/BENCH/stress_zero_delay.log}
N=${2:-24}
: > "$LOG"
for i in $(seq 1 "$N"); do
  case $((i % 3)) in
    0) M="local[4]"; SP=8 ;;
    1) M="local[2]"; SP=3 ;;
    2) M="local[8]"; SP=16 ;;
  esac
  echo "=== run $i master=$M shuffle=$SP ===" >> "$LOG"
  CBWCIS_TEST_MASTER="$M" CBWCIS_TEST_SHUFFLE="$SP" \
    python -m pytest tests/test_engine_branches.py::test_zero_default_delay_parity \
    -q --tb=long >> "$LOG" 2>&1
  echo "exit=$? run=$i" >> "$LOG"
done
echo DONE >> "$LOG"
grep -c "^1 passed" "$LOG"
