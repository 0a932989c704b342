#!/bin/bash
# VERDICT r2 item 7: sweep batch x GP formulation and record img/s.
# Run AFTER kernels stabilize; one process at a time (relay contention).
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:$PYTHONPATH
for cfg in "8 default" "8 gpfor" "16 default" "16 gpfor" "16 chunk4" "32 gpfor"; do
  set -- $cfg
  B=$1; MODE=$2
  unset BENCH_GP_FOR BENCH_GP_CHUNK
  case $MODE in
    gpfor) export BENCH_GP_FOR=1 ;;
    chunk4) export BENCH_GP_CHUNK=4 ;;
  esac
  echo "=== batch=$B mode=$MODE ==="
  BENCH_BATCH=$B BENCH_UPSAMPLER=0 timeout 1800 python bench.py 2>&1 | tail -1
done
