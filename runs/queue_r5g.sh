#!/bin/bash
# round-5 queue G: waits for the iter3 deep sweep to finish, then runs the
# from-scratch curriculum on the SECOND paper code [[1270,28]] (pipeline
# generalization check; scan scale per weight class = the reference's own
# 50x50000 protocol).  Reference curriculum weights: wt 10-80, coarse 10-60
# (shipped filenames wt_10_80_iter_64_16_mixed / wt_10_60_iter_16_16).
cd /root/repo
say() { echo "=== $* $(date -u)" >> runs/queue_r5g.log; }
until grep -aq "^rc=" runs/scratch_iter3_deep.log 2>/dev/null; do sleep 30; done
say "starting n1270 from-scratch"
for i in 1 2; do
  timeout 6600 python scripts/train_from_scratch.py -c n1270 \
    --out-dir runs/scratch3 --wt 10 80 --coarse-hi 60 \
    --mine-batches 120 --mine-batch-size 20480 --mine-compact-cap 1024 \
    --easy-cap 120000 --hard-mine-batches 60 --hard-mine-batch-size 20480 \
    --hard-cap 3000 --coarse-epochs 4 --final-epochs 3 --batch-size 100 \
    --steps-per-call 32 --mine-ahead 8 \
    --eval-p 0.09 0.08 --eval-batch 20480 --eval-target-errors 100 --seed 0 \
    >> runs/train_scratch_n1270.log 2>&1
  r=$?; say "n1270.$i rc=$r"; [ $r -eq 0 ] && break
done
say "QUEUE_R5G DONE"
