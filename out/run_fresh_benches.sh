#!/bin/bash
# Fresh-process driver-style bench matrix (each run pays its own tunnel
# warmup + compile; worker must be STOPPED first so nothing shares the
# device). One JSON line per run -> out/bench_r9.jsonl
set -u
cd /root/repo
out=out/bench_r9.jsonl
: > "$out"
run() {
  echo "=== bench $* $(date +%H:%M:%S)" >> out/bench_r9.log
  timeout 900 python bench.py "$@" >> "$out" 2>> out/bench_r9.log
  echo "rc=$? $(date +%H:%M:%S)" >> out/bench_r9.log
}
run --config 3
run --config 3 --no-rgb9e5
run --config 3 --jacobi-iters 60
run --config 1
run --config 5 --sharded --overlap
run --config 5 --sharded
run --config 4
run --config 2
run --config 7
echo DONE >> out/bench_r9.log
