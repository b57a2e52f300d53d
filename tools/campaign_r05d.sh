#!/bin/bash
# Round-5 FINAL measurement campaign (run after the tmpfs local.dir change):
#   1. clean local[32] amp8 record (the BENCH_r05 shape, reps 6)
#   2. amp128 local[8] leg (data-size scaling at fixed cores)
#   3. real multi-executor curve: local-cluster[n,2,12288], n=1,2,4 at
#      38.4 M points (amp 64) — each executor a separate JVM with its own
#      heap, netty shuffle and Arrow python workers
# Floors protocol: legs repeat across campaigns; per-leg minima are the
# defensible estimator on this co-tenant host (BENCH/SCALING.md).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/campaign_r05_final.jsonl}
leg () { # tag (env set by caller)
  local tag=$1
  echo "{\"leg_start\": \"$tag\", \"t\": \"$(date -Is)\", \"load\": \"$(cut -d' ' -f1-3 /proc/loadavg)\"}" >> "$OUT"
  python bench.py 2>/tmp/leg_$tag.err | tail -1 >> "$OUT"
}
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_AMP=8 leg bench32_amp8
SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_AMP=128 SPARK_GRAFT_BENCH_REPS=3 leg amp128_c8
for n in 1 2 4; do
  SPARK_GRAFT_MASTER="local-cluster[$n,2,12288]" SPARK_GRAFT_CPUS=$((n*2)) \
  SPARK_GRAFT_BENCH_AMP=64 SPARK_GRAFT_BENCH_REPS=3 leg lc${n}_amp64
done
echo '{"campaign": "done"}' >> "$OUT"
