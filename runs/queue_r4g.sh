#!/bin/bash
# Complete every remaining BLER row of BASELINE.md (cheap high/mid-p points).
# No compaction at p>=0.12 (flagged rates there exceed useful capacities);
# plain QC kernel is plenty fast for the few blocks needed.
cd /root/repo
Q=runs/queue_r4f.log
while ! grep -q "QUEUE_R4F DONE" $Q 2>/dev/null; do sleep 60; done
say() { echo "=== $1 $(date -u)" >> $Q; }

say "g-job1 n882 nG=3 p=0.14,0.12 (ref 4.75e-1 / 7.92e-2)"
timeout 600 python scripts/evaluate.py -c n882 -nG 3 -p 0.14 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 50 --seed 81 \
  > runs/n882_nG3_p1412.log 2>&1
echo "g-job1 rc=$? $(date -u)" >> $Q

say "g-job2 n882 nG=3 p=0.09,0.07 (ref 5.88e-4 / 1.06e-5)"
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.09 0.07 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 600 --seed 82 \
  > runs/n882_nG3_p0907.log 2>&1
echo "g-job2 rc=$? $(date -u)" >> $Q

say "g-job3 n1270 nG=3 p=0.12 + nG=5 p=0.10 (ref 2.78e-2 / 2.06e-4)"
timeout 600 python scripts/evaluate.py -c n1270 -nG 3 -p 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 20 --seed 83 \
  > runs/n1270_nG3_p12.log 2>&1
echo "g-job3a rc=$? $(date -u)" >> $Q
timeout 900 python scripts/evaluate.py -c n1270 -nG 5 -p 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 200 --seed 84 \
  > runs/n1270_nG5_p10.log 2>&1
echo "g-job3b rc=$? $(date -u)" >> $Q

echo "QUEUE_R4G DONE $(date -u)" >> $Q
