#!/bin/bash
# Watcher: when h-job1 (rescue floor row) succeeds, take over from queue_r4h
# (kill its bash before h-job2 starts) and run the re-planned tail:
#   1. retrain the FINAL mixed stage with more epochs (the v2 run's only
#      shortfall: 1194 steps from random init vs the reference's ~20x; easy
#      set + coarse model are reused from runs/scratch2) + re-eval
#   2. the remaining short rows (phi=accurate resume, n1270/n882 BLER rows)
R4H_PID=$1
cd /root/repo
Q=runs/queue_r4i.log
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

while ! grep -qE "h-job1.[12] rc=0" runs/queue_r4h.log 2>/dev/null; do
  # if both rescue attempts failed, take over anyway
  grep -q "h-job1.2 rc=[^0]" runs/queue_r4h.log 2>/dev/null && break
  sleep 10
done
kill "$R4H_PID" 2>/dev/null
say "took over from queue_r4h (pid $R4H_PID)"

# ---- i-job1: final-stage retrain with 6 epochs ----
rm -f runs/scratch2/n882_final_64_16_mixed.npz runs/scratch2/n882_scratch_eval.json
for i in 1 2; do
  say "i-job1.$i final 64/16 retrain, 6 epochs + eval"
  timeout 2400 python scripts/train_from_scratch.py -c n882 \
    --out-dir runs/scratch2 --eval-batch 20480 \
    --hard-mine-batch-size 2048 --hard-mine-batches 40 \
    --final-epochs 6 \
    >> runs/train_scratch2.log 2>&1
  r=$?; rc i-job1.$i $r; [ $r -eq 0 ] && break
  sleep 120
done

# ---- i-job2: finish phi=accurate nG=5 p=0.04 ----
for i in 1 2; do
  say "i-job2.$i resume phi=accurate nG=5 p=0.05,0.04"
  FGT_PHI_IMPL=accurate timeout 1800 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 22 \
    --checkpoint runs/ckpt_phi_acc_nG5.json \
    >> runs/n882_nG5_p0504_phi_accurate.log 2>&1
  r=$?; rc i-job2.$i $r; [ $r -eq 0 ] && break
  sleep 120
done

# ---- i-job3: missing BLER rows [[1270,28]] nG=3 p=0.11/0.10 ----
say "i-job3 n1270 nG=3 p=0.11,0.10"
timeout 1200 python scripts/evaluate.py -c n1270 -nG 3 -p 0.11 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 500 --seed 71 \
  > runs/n1270_nG3_p1110.log 2>&1
rc i-job3 $?

# ---- i-job4: remaining cheap n882 rows ----
say "i-job4 n882 nG=3 p=0.14,0.12 / 0.09,0.07"
timeout 600 python scripts/evaluate.py -c n882 -nG 3 -p 0.14 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 50 --seed 81 \
  > runs/n882_nG3_p1412.log 2>&1
rc i-job4a $?
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.09 0.07 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 600 --seed 82 \
  > runs/n882_nG3_p0907.log 2>&1
rc i-job4b $?

# ---- i-job5: n1270 nG=3 p=0.12 + nG=5 p=0.10 ----
say "i-job5 n1270 nG=3 p=0.12 + nG=5 p=0.10"
timeout 600 python scripts/evaluate.py -c n1270 -nG 3 -p 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 20 --seed 83 \
  > runs/n1270_nG3_p12.log 2>&1
rc i-job5a $?
timeout 900 python scripts/evaluate.py -c n1270 -nG 5 -p 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 200 --seed 84 \
  > runs/n1270_nG5_p10.log 2>&1
rc i-job5b $?

echo "QUEUE_R4I DONE $(date -u)" >> $Q
