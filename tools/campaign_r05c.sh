#!/bin/bash
# Round-5 REAL multi-executor scaling campaign: local-cluster[n,2,12288]
# spawns n separate executor JVMs (own heap, netty shuffle, own Arrow
# python workers; package shipped as a zip — the spark-submit --py-files
# path). 3-point curve at 38.4 M points: 1 -> 2 -> 4 executors, 2 cores
# and 12 GiB each (per-executor shape held fixed, like adding machines).
# Chains after the thread-mode campaign + clean local[32] bench so every
# leg runs in the same quiet window.
set -u
cd /root/repo
OUT=/tmp/campaign_r05c.jsonl
while ! grep -q '"bench32": "done"' /tmp/bench_r05_clean.jsonl 2>/dev/null; do
  sleep 30
done
leg () { # n_exec amp reps tag
  echo "{\"leg_start\": \"$4\", \"executors\": $1, \"amp\": $2, \"t\": \"$(date -Is)\", \"load\": \"$(cut -d' ' -f1-3 /proc/loadavg)\"}" >> "$OUT"
  SPARK_GRAFT_MASTER="local-cluster[$1,2,12288]" SPARK_GRAFT_CPUS=$(($1 * 2)) \
    SPARK_GRAFT_BENCH_AMP=$2 SPARK_GRAFT_BENCH_REPS=$3 \
    python bench.py 2>/tmp/leg_$4.err | tail -1 >> "$OUT"
}
leg 1 64 3 lc1_amp64
leg 2 64 3 lc2_amp64
leg 4 64 3 lc4_amp64
echo '{"campaign": "done"}' >> "$OUT"
