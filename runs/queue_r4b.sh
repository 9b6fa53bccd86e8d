#!/bin/bash
# Round-4 follow-up TPU queue: waits for queue_r4.sh to finish, then runs
# the cheap leftovers (VERDICT item 8: minsum-cascade production point).
cd /root/repo
Q=runs/queue_r4.log
while ! grep -q "QUEUE_R4 DONE" $Q 2>/dev/null; do sleep 60; done
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

# minsum cascade at the f=0.8 reference operating point: if the LER matches
# the f=0.8 boxplus-phi rows, minsum is a documented faster config (+5.5%
# kernel A/B, README perf study)
say "q job6 n882 nG=3 minsum f1=0.8 p=0.10 (vs ref f=0.8 1.66e-3)"
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.10 -bs 20480 \
  --qc-kernel --cn-type minsum --factor1 0.8 --factor2 1.0 \
  --compact 0.5 --rounds-cap 0.3 --target-errors 100 --max-mc-iter 500 \
  --seed 61 > runs/n882_nG3_minsum_f08_p10.log 2>&1
rc job6 $?

echo "QUEUE_R4B DONE $(date -u)" >> $Q
