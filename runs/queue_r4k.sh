#!/bin/bash
# Final manual queue: every job under watchdog_run.sh (kills+retries on the
# silent axon claim-leg wedge instead of burning the full job timeout).
cd /root/repo
Q=runs/queue_r4k.log
say() { echo "=== $1 $(date -u)" >> $Q; }
W=runs/watchdog_run.sh

say "k1 final-stage retrain 6 epochs"
bash $W 2400 300 runs/train_scratch2.log \
  python scripts/train_from_scratch.py -c n882 \
  --out-dir runs/scratch2 --eval-batch 20480 \
  --hard-mine-batch-size 2048 --hard-mine-batches 40 --final-epochs 6
echo "k1 rc=$? $(date -u)" >> $Q

say "k2 resume phi=accurate nG=5 p=0.05,0.04"
FGT_PHI_IMPL=accurate bash $W 1800 300 runs/n882_nG5_p0504_phi_accurate.log \
  python scripts/evaluate.py -c n882 -nG 5 \
  -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
  --target-errors 100 --max-mc-iter 4883 --seed 22 \
  --checkpoint runs/ckpt_phi_acc_nG5.json
echo "k2 rc=$? $(date -u)" >> $Q

say "k3 n1270 nG=3 p=0.11,0.10"
bash $W 1200 300 runs/n1270_nG3_p1110.log \
  python scripts/evaluate.py -c n1270 -nG 3 -p 0.11 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 500 --seed 71
echo "k3 rc=$? $(date -u)" >> $Q

say "k4 n882 nG=3 p=0.14,0.12"
bash $W 600 300 runs/n882_nG3_p1412.log \
  python scripts/evaluate.py -c n882 -nG 3 -p 0.14 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 50 --seed 81
echo "k4 rc=$? $(date -u)" >> $Q

say "k5 n882 nG=3 p=0.09,0.07"
bash $W 900 300 runs/n882_nG3_p0907.log \
  python scripts/evaluate.py -c n882 -nG 3 -p 0.09 0.07 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 600 --seed 82
echo "k5 rc=$? $(date -u)" >> $Q

say "k6 n1270 nG=3 p=0.12"
bash $W 600 300 runs/n1270_nG3_p12.log \
  python scripts/evaluate.py -c n1270 -nG 3 -p 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 20 --seed 83
echo "k6 rc=$? $(date -u)" >> $Q

say "k7 n1270 nG=5 p=0.10"
bash $W 900 300 runs/n1270_nG5_p10.log \
  python scripts/evaluate.py -c n1270 -nG 5 -p 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 200 --seed 84
echo "k7 rc=$? $(date -u)" >> $Q

say "k8 n882 nG=3 minsum f1=0.8 p=0.10"
bash $W 900 300 runs/n882_nG3_minsum_f08_p10.log \
  python scripts/evaluate.py -c n882 -nG 3 -p 0.10 -bs 20480 \
  --qc-kernel --cn-type minsum --factor1 0.8 --factor2 1.0 \
  --compact 0.5 --rounds-cap 0.3 --target-errors 100 --max-mc-iter 500 \
  --seed 61
echo "k8 rc=$? $(date -u)" >> $Q

echo "QUEUE_R4K DONE $(date -u)" >> $Q
