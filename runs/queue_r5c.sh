#!/bin/bash
# round-5 queue C: waits for QUEUE_R5B DONE, then (1) GNN_BP4 full-learned
# decoder on the paper code [[882,24]] (VERDICT item 8 stretch), (2) bench.py
# confirmation run post-refactor.
cd /root/repo
say() { echo "=== $* $(date -u)" >> runs/queue_r5c.log; }

until grep -q "QUEUE_R5D DONE" runs/queue_r5d.log 2>/dev/null; do sleep 30; done
say "starting"

say "job1 gnn_bp4 n882 4000 steps"
for i in 1 2; do
  timeout 7200 python scripts/train_gnn_bp4.py --code n882 --steps 4000 \
    --batch-size 120 --train-p 0.03 --eval-p 0.005 0.01 0.02 0.03 \
    --eval-batch-size 4096 --eval-batches 25 \
    --weights-out runs/gnn_bp4_n882_weights.npz \
    --out runs/gnn_bp4_n882.json >> runs/gnn_bp4_n882.log 2>&1
  r=$?; say "job1.$i rc=$r"; [ $r -eq 0 ] && break
done

say "job2 bench.py post-refactor"
timeout 2400 python bench.py >> runs/bench_r5.log 2>&1
say "job2 rc=$?"
say "QUEUE_R5C DONE"
