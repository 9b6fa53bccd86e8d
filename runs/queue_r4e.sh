#!/bin/bash
# Fill the last two §6 BLER-table rows not yet in RESULTS.md:
# [[1270,28]] nG=3 p=0.11 (ref 4.24e-3) and p=0.10 (ref 3.64e-4).
cd /root/repo
Q=runs/queue_r4d.log
while ! grep -q "QUEUE_R4D DONE" $Q 2>/dev/null; do sleep 60; done
echo "=== job8 n1270 nG=3 p=0.11,0.10 $(date -u)" >> $Q
timeout 1200 python scripts/evaluate.py -c n1270 -nG 3 -p 0.11 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 500 --seed 71 \
  > runs/n1270_nG3_p1110.log 2>&1
echo "job8 rc=$? $(date -u)" >> $Q
echo "QUEUE_R4E DONE $(date -u)" >> $Q
