#!/bin/bash
# Stress the zero-latch flake (STATUS.md) after the phased-commit fix.
cd /root/repo
log=BENCH/stress_zero_delay_r6_postfix.log
: > "$log"
export CBWCIS_OBSDBG=1
for i in $(seq 1 30); do
  python -m pytest tests/test_engine_branches.py::test_zero_default_delay_parity -q --tb=long >> "$log" 2>&1
  ec=$?
  echo "exit=$ec run=$i" >> "$log"
  if [ $ec -ne 0 ]; then echo "REPRODUCED at run $i" >> "$log"; break; fi
done
echo DONE >> "$log"
