#!/bin/bash
# round-5 queue E: after R5C, bench batch-size A/B (20480 default vs 40960)
cd /root/repo
say() { echo "=== $* $(date -u)" >> runs/queue_r5e.log; }
until grep -q "QUEUE_R5C DONE" runs/queue_r5c.log 2>/dev/null; do sleep 30; done
say "bench bs=40960 A/B"
BENCH_BATCH=40960 timeout 2400 python bench.py >> runs/bench_r5_bs40960.log 2>&1
say "rc=$?"
say "bench bs=20480 repeat (paired)"
timeout 1200 python bench.py >> runs/bench_r5_bs20480b.log 2>&1
say "rc=$?"
say "QUEUE_R5E DONE"
