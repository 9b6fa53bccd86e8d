#!/bin/bash
# Round-4 serial TPU queue (single chip behind the tunnel — one job at a time).
# Priorities from VERDICT r3: plain-BP accounting rows (item 3, cheap, early
# convention check), phi A/B on the error-floor rows (item 1), from-scratch
# curriculum at working scale (item 2), OSD row top-ups (item 4).
cd /root/repo
Q=runs/queue_r4.log
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

# ---- job 1: plain-BP rows under the undetected-logical convention ----
say "q job1a plain bp4 SP 1.0 x64 undetected p=0.10/0.09/0.08"
timeout 1500 python examples/osd_eval.py --mode bp4 --accounting undetected \
  -p 0.10 0.09 0.08 -bs 20480 --target-errors 100 --max-mc-iter 500 \
  --seed 11 > runs/plain_bp4_sp_undet.log 2>&1
rc job1a $?
say "q job1b plain bp4 NMS 0.8 x100 undetected p=0.10/0.09"
timeout 2400 python examples/osd_eval.py --mode bp4 --accounting undetected \
  --cn-type minsum --factor 0.8 --iters 100 \
  -p 0.10 0.09 -bs 20480 --target-errors 100 --max-mc-iter 500 \
  --seed 12 > runs/plain_bp4_nms_undet.log 2>&1
rc job1b $?
say "q job1c plain bp2 NMS 0.8 x100 undetected p=0.05/0.04 (BSC)"
timeout 2400 python examples/osd_eval.py --mode bp2 --accounting undetected \
  -p 0.05 0.04 -bs 20480 --target-errors 100 --max-mc-iter 500 \
  --seed 13 > runs/plain_bp2_nms_undet.log 2>&1
rc job1c $?

# ---- job 2: phi=accurate on the three error-floor rows ----
say "q job2a n882 nG=3 p=0.05 phi=accurate (target 100 errs, cap 2.46e8)"
FGT_PHI_IMPL=accurate timeout 3900 python scripts/evaluate.py -c n882 -nG 3 \
  -p 0.05 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
  --target-errors 100 --max-mc-iter 12000 --seed 21 \
  --checkpoint runs/ckpt_phi_acc_nG3_p05.json \
  > runs/n882_nG3_p05_phi_accurate.log 2>&1
rc job2a $?
say "q job2b n882 nG=5 p=0.05,0.04 phi=accurate (1e8 blocks each)"
FGT_PHI_IMPL=accurate timeout 3300 python scripts/evaluate.py -c n882 -nG 5 \
  -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
  --target-errors 100 --max-mc-iter 4883 --seed 22 \
  --checkpoint runs/ckpt_phi_acc_nG5.json \
  > runs/n882_nG5_p0504_phi_accurate.log 2>&1
rc job2b $?

# ---- job 3: from-scratch curriculum v2 at working scale ----
say "q job3 train_from_scratch v2 (mine-batches 60, coarse-epochs 4)"
timeout 10800 python scripts/train_from_scratch.py -c n882 \
  --out-dir runs/scratch2 --eval-batch 20480 \
  > runs/train_scratch2.log 2>&1
rc job3 $?

# ---- job 4: OSD top-ups (independent seeds; pool with round-3 counts) ----
say "q job4a bp2-osd p=0.04 seed 31 (pool to ~100 errs)"
timeout 2700 python examples/osd_eval.py --mode bp2-osd -p 0.04 -bs 32768 \
  --osd-cap 1024 --target-errors 80 --max-mc-iter 200 --seed 31 \
  --checkpoint runs/ckpt_osd_bp2_p04.json > runs/osd_bp2_p04_s31.log 2>&1
rc job4a $?
say "q job4b bp4-osd p=0.08 seed 32 (pool to ~100 errs)"
timeout 2100 python examples/osd_eval.py --mode bp4-osd -p 0.08 -bs 32768 \
  --osd-cap 1024 --target-errors 30 --max-mc-iter 110 --seed 32 \
  --checkpoint runs/ckpt_osd_bp4_p08.json > runs/osd_bp4_p08_s32.log 2>&1
rc job4b $?

# ---- job 5: phi=tf on the same floor rows ----
say "q job5a n882 nG=3 p=0.05 phi=tf"
FGT_PHI_IMPL=tf timeout 3900 python scripts/evaluate.py -c n882 -nG 3 \
  -p 0.05 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
  --target-errors 100 --max-mc-iter 12000 --seed 41 \
  --checkpoint runs/ckpt_phi_tf_nG3_p05.json \
  > runs/n882_nG3_p05_phi_tf.log 2>&1
rc job5a $?
say "q job5b n882 nG=5 p=0.05,0.04 phi=tf (1e8 blocks each)"
FGT_PHI_IMPL=tf timeout 3300 python scripts/evaluate.py -c n882 -nG 5 \
  -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
  --target-errors 100 --max-mc-iter 4883 --seed 42 \
  --checkpoint runs/ckpt_phi_tf_nG5.json \
  > runs/n882_nG5_p0504_phi_tf.log 2>&1
rc job5b $?

echo "QUEUE_R4 DONE $(date -u)" >> $Q
