#!/bin/bash
# Round-5 follow-on: once the clean-window scaling campaign finishes,
# record a clean local[32] headline bench (the driver's BENCH protocol:
# sf0.1, amp 8, best-of-6 reps) in the same quiet window.
set -u
cd /root/repo
while ! grep -q '"campaign": "done"' /tmp/campaign_r05b.jsonl 2>/dev/null; do
  sleep 30
done
echo "{\"bench32_start\": \"$(date -Is)\", \"load\": \"$(cut -d' ' -f1-3 /proc/loadavg)\"}" >> /tmp/bench_r05_clean.jsonl
SPARK_GRAFT_CPUS=32 python bench.py 2>/tmp/bench32.err | tail -1 >> /tmp/bench_r05_clean.jsonl
echo '{"bench32": "done"}' >> /tmp/bench_r05_clean.jsonl
