#!/bin/bash
# Round-4 session-2 serial TPU queue (single chip; one job at a time).
# Every job runs under `timeout` with retries; MC jobs checkpoint-resume so
# a retry repeats <=60 s of work (defense against the diagnosed axon RPC
# hang — see README "MC checkpoint/resume").
cd /root/repo
Q=runs/queue_r4d.log
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

# ---- job1: phi=tf on the headline floor miss (nG=3 p=0.05; ref 4.57e-7) ----
for i in 1 2; do
  say "job1.$i n882 nG=3 p=0.05 phi=tf"
  FGT_PHI_IMPL=tf timeout 3300 python scripts/evaluate.py -c n882 -nG 3 \
    -p 0.05 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 12000 --seed 23 \
    --checkpoint runs/ckpt_phi_tf_nG3_p05.json \
    >> runs/n882_nG3_p05_phi_tf.log 2>&1
  r=$?; rc job1.$i $r; [ $r -eq 0 ] && break
done

# ---- job2: from-scratch curriculum v2 at working scale (phases resume) ----
for i in 1 2 3; do
  say "job2.$i train_from_scratch v2 (mine-batches 60, coarse-epochs 4)"
  timeout 7800 python scripts/train_from_scratch.py -c n882 \
    --out-dir runs/scratch2 --eval-batch 20480 \
    >> runs/train_scratch2.log 2>&1
  r=$?; rc job2.$i $r; [ $r -eq 0 ] && break
done

# ---- job3: finish phi=accurate nG=5 p=0.04 (p=0.05 already complete) ----
for i in 1 2; do
  say "job3.$i resume phi=accurate nG=5 p=0.05,0.04"
  FGT_PHI_IMPL=accurate timeout 1800 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 22 \
    --checkpoint runs/ckpt_phi_acc_nG5.json \
    >> runs/n882_nG5_p0504_phi_accurate.log 2>&1
  r=$?; rc job3.$i $r; [ $r -eq 0 ] && break
done

# ---- job4: phi=tf nG=5 p=0.05,0.04 (ref 1.9e-7 / ~8e-8) ----
for i in 1 2; do
  say "job4.$i n882 nG=5 p=0.05,0.04 phi=tf"
  FGT_PHI_IMPL=tf timeout 3000 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 24 \
    --checkpoint runs/ckpt_phi_tf_nG5.json \
    >> runs/n882_nG5_p0504_phi_tf.log 2>&1
  r=$?; rc job4.$i $r; [ $r -eq 0 ] && break
done

# ---- job5: BP2+OSD p=0.04 top-up (pool with round-3's 20/8.88e5) ----
for i in 1 2; do
  say "job5.$i bp2-osd p=0.04 seed 31"
  timeout 2400 python examples/osd_eval.py --mode bp2-osd -p 0.04 -bs 32768 \
    --osd-cap 1024 --target-errors 80 --max-mc-iter 200 --seed 31 \
    --checkpoint runs/ckpt_osd_bp2_p04.json >> runs/osd_bp2_p04_s31.log 2>&1
  r=$?; rc job5.$i $r; [ $r -eq 0 ] && break
done

# ---- job6: BP4+OSD p=0.08 top-up (pool with round-3's 73/8.26e6) ----
for i in 1 2; do
  say "job6.$i bp4-osd p=0.08 seed 32"
  timeout 1800 python examples/osd_eval.py --mode bp4-osd -p 0.08 -bs 32768 \
    --osd-cap 1024 --target-errors 30 --max-mc-iter 110 --seed 32 \
    --checkpoint runs/ckpt_osd_bp4_p08.json >> runs/osd_bp4_p08_s32.log 2>&1
  r=$?; rc job6.$i $r; [ $r -eq 0 ] && break
done

# ---- job7: minsum-cascade production point (VERDICT item 8) ----
say "job7 n882 nG=3 minsum f1=0.8 p=0.10 (vs ref f=0.8 1.66e-3)"
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.10 -bs 20480 \
  --qc-kernel --cn-type minsum --factor1 0.8 --factor2 1.0 \
  --compact 0.5 --rounds-cap 0.3 --target-errors 100 --max-mc-iter 500 \
  --seed 61 > runs/n882_nG3_minsum_f08_p10.log 2>&1
rc job7 $?

echo "QUEUE_R4D DONE $(date -u)" >> $Q
