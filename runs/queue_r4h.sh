#!/bin/bash
# Round-4 final TPU queue.  Replaces queue_r4f/g after the hard-miner
# diagnosis: the cascade-miner program hangs in axon remote-compile at
# bs=8192 (bs<=4096 at client init when stale leases linger after kills),
# so (a) every job is preceded by a cheap TPU liveness probe with backoff
# (waits out stale device leases instead of burning the job timeout), and
# (b) hard mining runs at bs=2048 (proven to compile+run: 1.06 s/batch).
cd /root/repo
Q=runs/queue_r4h.log
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

probe() {
  for t in 1 2 3 4 5 6 7 8; do
    timeout 150 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))" >/dev/null 2>&1 && return 0
    echo "probe failed ($t), backing off 240s $(date -u)" >> $Q
    sleep 240
  done
  return 1
}

# ---- h-job0: finish train_from_scratch v2 (phases resume; hard @ 2048) ----
for i in 1 2 3; do
  grep -q "] done" runs/train_scratch2.log 2>/dev/null && break
  probe
  say "h-job0.$i train_from_scratch v2 (hard-mine 2048x40)"
  timeout 4500 python scripts/train_from_scratch.py -c n882 \
    --out-dir runs/scratch2 --eval-batch 20480 \
    --hard-mine-batch-size 2048 --hard-mine-batches 40 \
    >> runs/train_scratch2.log 2>&1
  rc h-job0.$i $?
  sleep 120
done

# ---- h-job1: ensemble-rescue floor row (nG=3 p=0.05, rescue=tf) ----
for i in 1 2; do
  probe
  say "h-job1.$i n882 nG=3 p=0.05 rescue-phi=tf (expect ~1e-7, ref 4.57e-7)"
  timeout 2700 python scripts/evaluate.py -c n882 -nG 3 -p 0.05 -bs 20480 \
    --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --rescue-phi tf --rescue-cap 0.00625 \
    --target-errors 100 --max-mc-iter 9000 --seed 25 \
    --checkpoint runs/ckpt_rescue_tf_nG3.json \
    >> runs/n882_nG3_p05_rescue_tf.log 2>&1
  r=$?; rc h-job1.$i $r; [ $r -eq 0 ] && break
  sleep 120
done

# ---- h-job2: finish phi=accurate nG=5 p=0.04 ----
for i in 1 2; do
  probe
  say "h-job2.$i resume phi=accurate nG=5 p=0.05,0.04"
  FGT_PHI_IMPL=accurate timeout 1800 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 22 \
    --checkpoint runs/ckpt_phi_acc_nG5.json \
    >> runs/n882_nG5_p0504_phi_accurate.log 2>&1
  r=$?; rc h-job2.$i $r; [ $r -eq 0 ] && break
  sleep 120
done

# ---- h-job3: missing BLER rows [[1270,28]] nG=3 p=0.11/0.10 ----
probe
say "h-job3 n1270 nG=3 p=0.11,0.10 (ref 4.24e-3 / 3.64e-4)"
timeout 1200 python scripts/evaluate.py -c n1270 -nG 3 -p 0.11 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 500 --seed 71 \
  > runs/n1270_nG3_p1110.log 2>&1
rc h-job3 $?

# ---- h-job4: remaining cheap BLER rows n882 nG=3 ----
probe
say "h-job4 n882 nG=3 p=0.14,0.12 then 0.09,0.07"
timeout 600 python scripts/evaluate.py -c n882 -nG 3 -p 0.14 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 50 --seed 81 \
  > runs/n882_nG3_p1412.log 2>&1
rc h-job4a $?
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.09 0.07 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 600 --seed 82 \
  > runs/n882_nG3_p0907.log 2>&1
rc h-job4b $?

# ---- h-job5: n1270 nG=3 p=0.12 + nG=5 p=0.10 ----
probe
say "h-job5 n1270 nG=3 p=0.12 + nG=5 p=0.10"
timeout 600 python scripts/evaluate.py -c n1270 -nG 3 -p 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 20 --seed 83 \
  > runs/n1270_nG3_p12.log 2>&1
rc h-job5a $?
timeout 900 python scripts/evaluate.py -c n1270 -nG 5 -p 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 200 --seed 84 \
  > runs/n1270_nG5_p10.log 2>&1
rc h-job5b $?

# ---- h-job6: minsum-cascade production point ----
probe
say "h-job6 n882 nG=3 minsum f1=0.8 p=0.10"
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.10 -bs 20480 \
  --qc-kernel --cn-type minsum --factor1 0.8 --factor2 1.0 \
  --compact 0.5 --rounds-cap 0.3 --target-errors 100 --max-mc-iter 500 \
  --seed 61 > runs/n882_nG3_minsum_f08_p10.log 2>&1
rc h-job6 $?

echo "QUEUE_R4H DONE $(date -u)" >> $Q
