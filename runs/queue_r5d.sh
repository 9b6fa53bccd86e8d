#!/bin/bash
# round-5 queue D: waits for QUEUE_R5B DONE, then curriculum iteration 2
# (hard re-mine through the trained v3 model + fine-tune + eval).
cd /root/repo
say() { echo "=== $* $(date -u)" >> runs/queue_r5d.log; }
until grep -q "QUEUE_R5B DONE" runs/queue_r5b.log 2>/dev/null; do sleep 30; done
say "starting iter2"
for i in 1 2; do
  timeout 7200 python scripts/scratch_iter2.py -c n882 --out-dir runs/scratch3 \
    >> runs/scratch_iter2.log 2>&1
  r=$?; say "iter2.$i rc=$r"; [ $r -eq 0 ] && break
done
say "QUEUE_R5D DONE"
