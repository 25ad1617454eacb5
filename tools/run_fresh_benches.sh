#!/bin/bash
# Fresh-process driver-style bench matrix (each run pays its own tunnel
# warmup + compile; the warm worker must be STOPPED first — a second
# process sharing the one tunneled chip degrades per-dispatch latency,
# and every JSON line now records provenance proving the run was clean).
# One JSON line per run -> out/bench_${TAG}.jsonl
#
#   TAG=r11 bash tools/run_fresh_benches.sh            # full matrix
#   TAG=r11 ONLY="--config 3" bash tools/run_fresh_benches.sh   # one row
set -u
cd "$(dirname "$0")/.."
TAG="${TAG:-r11}"
out="out/bench_${TAG}.jsonl"
log="out/bench_${TAG}.log"
if [ -f out/worker.pid ] && kill -0 "$(cat out/worker.pid)" 2>/dev/null; then
  echo "warm worker $(cat out/worker.pid) is RUNNING — stop it first" >&2
  exit 1
fi
: > "$out"
run() {
  echo "=== bench $* $(date +%H:%M:%S)" >> "$log"
  timeout 1200 python bench.py "$@" >> "$out" 2>> "$log"
  echo "rc=$? $(date +%H:%M:%S)" >> "$log"
}
if [ -n "${ONLY:-}" ]; then
  # shellcheck disable=SC2086
  run $ONLY
  echo DONE >> "$log"
  exit 0
fi
run --config 3
run --config 3 --no-rgb9e5
run --config 3 --jacobi-iters 60
run --config 1
run --config 4
run --config 2
run --config 7
run --config 7 --per-sim-dt
# Batched serving AT THE HEADLINE GRID (round-3 verdict task 3): the knee
# where VMEM/gather floors break batching, and the measured-today path
# past 10k aggregate 1024^2 steps/s.
run --config 7 --serve-res 1024 --batch 1
run --config 7 --serve-res 1024 --batch 2
run --config 7 --serve-res 1024 --batch 4
run --config 7 --serve-res 1024 --batch 8
# 16K sharded: auto split-phase overlap (>= 8192 crossover) vs forced off.
run --config 5 --sharded
run --config 5 --sharded --no-overlap
echo DONE >> "$log"
