#!/bin/bash
# Continuation of the serving-knee-vs-grid sweep (round-4 verdict #6).
# The first sweep (out/knee_sweep.sh) died with the session at the 512^2
# B=32 point; its 384^2 B=32 attempt hit the 900 s timeout (rc=124 in
# out/bench_r17.log) — retried here with a 1800 s bound. New points:
# 320^2 B=64 confirms whether 9,482 aggregate is the plateau, and 288^2
# brackets the >10k crossover between 256^2 (17.4k, over) and 320^2
# (9.5k at B=32, under). Fresh process per point; worker must be STOPPED.
set -u
cd /root/repo
out=out/bench_r18.jsonl
: > "$out"
run() {
  echo "=== bench $* $(date +%H:%M:%S)" >> out/bench_r18.log
  timeout 1800 python bench.py "$@" >> "$out" 2>> out/bench_r18.log
  echo "rc=$? $(date +%H:%M:%S)" >> out/bench_r18.log
}
run --config 7 --serve-res 320 --batch 64
run --config 7 --serve-res 288 --batch 32
run --config 7 --serve-res 384 --batch 32
run --config 7 --serve-res 512 --batch 32
run --config 7 --serve-res 288 --batch 64
echo DONE >> out/bench_r18.log
