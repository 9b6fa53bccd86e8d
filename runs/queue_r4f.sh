#!/bin/bash
# Re-planned tail of the round-4 TPU schedule (replaces queue_r4d jobs 3-7
# and queue_r4e; those runners were stopped, the in-flight train_from_scratch
# v2 keeps running and is resumed here if it was cut short).
#
# Priorities: (1) the formulation-ensemble rescue floor measurement — the
# phi A/B concluded no single formulation closes the nG=3 p=0.05 gap
# (expm1 6.30e-7, accurate 7.51e-7, tf 6.83e-7 vs ref 4.57e-7), but
# re-decoding still-flagged samples with phi=tf rescues 44/50 of the mined
# TPU failures, predicting a floor BELOW the reference; (2) finish the
# phi=accurate nG=5 p=0.04 partial; (3) cheap table completers.
cd /root/repo
Q=runs/queue_r4f.log
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

# ---- wait for the running train_from_scratch to exit; resume if not done ----
while pgrep -f "train_from_scratch" > /dev/null 2>&1; do sleep 60; done
for i in 1 2; do
  grep -q "] done" runs/train_scratch2.log 2>/dev/null && break
  say "f-job0.$i resume train_from_scratch v2"
  timeout 5400 python scripts/train_from_scratch.py -c n882 \
    --out-dir runs/scratch2 --eval-batch 20480 \
    >> runs/train_scratch2.log 2>&1
  rc f-job0.$i $?
done

# ---- f-job1: ensemble-rescue floor row (nG=3 p=0.05, rescue=tf) ----
for i in 1 2; do
  say "f-job1.$i n882 nG=3 p=0.05 rescue-phi=tf (expect ~1e-7, ref 4.57e-7)"
  timeout 3600 python scripts/evaluate.py -c n882 -nG 3 -p 0.05 -bs 20480 \
    --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --rescue-phi tf --rescue-cap 0.00625 \
    --target-errors 100 --max-mc-iter 14000 --seed 25 \
    --checkpoint runs/ckpt_rescue_tf_nG3.json \
    >> runs/n882_nG3_p05_rescue_tf.log 2>&1
  r=$?; rc f-job1.$i $r; [ $r -eq 0 ] && break
done

# ---- f-job2: finish phi=accurate nG=5 p=0.04 (p=0.05 complete in ckpt) ----
for i in 1 2; do
  say "f-job2.$i resume phi=accurate nG=5 p=0.05,0.04"
  FGT_PHI_IMPL=accurate timeout 1800 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 22 \
    --checkpoint runs/ckpt_phi_acc_nG5.json \
    >> runs/n882_nG5_p0504_phi_accurate.log 2>&1
  r=$?; rc f-job2.$i $r; [ $r -eq 0 ] && break
done

# ---- f-job3: missing BLER-table rows [[1270,28]] nG=3 p=0.11/0.10 ----
say "f-job3 n1270 nG=3 p=0.11,0.10 (ref 4.24e-3 / 3.64e-4)"
timeout 1200 python scripts/evaluate.py -c n1270 -nG 3 -p 0.11 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 500 --seed 71 \
  > runs/n1270_nG3_p1110.log 2>&1
rc f-job3 $?

# ---- f-job4: minsum-cascade production point (VERDICT item 8) ----
say "f-job4 n882 nG=3 minsum f1=0.8 p=0.10 (vs ref f=0.8 1.66e-3)"
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.10 -bs 20480 \
  --qc-kernel --cn-type minsum --factor1 0.8 --factor2 1.0 \
  --compact 0.5 --rounds-cap 0.3 --target-errors 100 --max-mc-iter 500 \
  --seed 61 > runs/n882_nG3_minsum_f08_p10.log 2>&1
rc f-job4 $?

# ---- f-job5 (optional): phi=tf nG=5 rows ----
for i in 1 2; do
  say "f-job5.$i n882 nG=5 p=0.05,0.04 phi=tf"
  FGT_PHI_IMPL=tf timeout 2700 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 24 \
    --checkpoint runs/ckpt_phi_tf_nG5.json \
    >> runs/n882_nG5_p0504_phi_tf.log 2>&1
  r=$?; rc f-job5.$i $r; [ $r -eq 0 ] && break
done

echo "QUEUE_R4F DONE $(date -u)" >> $Q
