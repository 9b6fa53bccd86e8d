#!/bin/bash
# round-5 queue F: waits for QUEUE_R5E DONE, then curriculum iteration 3
# (hard re-mine through the iter2 model, fine-tune from it, eval vs shipped).
cd /root/repo
say() { echo "=== $* $(date -u)" >> runs/queue_r5f.log; }
until grep -q "QUEUE_R5E DONE" runs/queue_r5e.log 2>/dev/null; do sleep 30; done
say "starting iter3"
for i in 1 2; do
  timeout 7200 python scripts/scratch_iter2.py -c n882 --out-dir runs/scratch3 \
    --base-tag final_64_16_iter2 --hard-tags hard,hard_iter2 --out-tag iter3 \
    --mine-seed-salt 15 --epochs 2 --lr 1e-4 \
    --eval-p 0.10 0.09 0.08 --eval-target-errors 150 \
    >> runs/scratch_iter3.log 2>&1
  r=$?; say "iter3.$i rc=$r"; [ $r -eq 0 ] && break
done
say "QUEUE_R5F DONE"
