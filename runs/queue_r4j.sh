#!/bin/bash
# Manual-takeover queue with FAST claim retries: the axon relay's claim leg
# wedges nondeterministically (~50% of client inits tonight); long backoffs
# waste wall-clock, so probe with immediate retries and run each job as soon
# as a probe lands.
cd /root/repo
Q=runs/queue_r4j.log
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

probe() {
  for t in $(seq 1 25); do
    timeout 150 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))" >/dev/null 2>&1 && \
      { echo "probe ok ($t) $(date -u)" >> $Q; return 0; }
    echo "probe failed ($t) $(date -u)" >> $Q
    sleep 15
  done
  return 1
}

# ---- j-job1: ensemble-rescue floor row (nG=3 p=0.05, rescue=tf) ----
for i in 1 2 3; do
  probe
  say "j-job1.$i n882 nG=3 p=0.05 rescue-phi=tf"
  timeout 2700 python scripts/evaluate.py -c n882 -nG 3 -p 0.05 -bs 20480 \
    --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --rescue-phi tf --rescue-cap 0.00625 \
    --target-errors 100 --max-mc-iter 9000 --seed 25 \
    --checkpoint runs/ckpt_rescue_tf_nG3.json \
    >> runs/n882_nG3_p05_rescue_tf.log 2>&1
  r=$?; rc j-job1.$i $r; [ $r -eq 0 ] && break
done

# ---- j-job2: final-stage retrain with 6 epochs + eval ----
rm -f runs/scratch2/n882_final_64_16_mixed.npz runs/scratch2/n882_scratch_eval.json
for i in 1 2; do
  probe
  say "j-job2.$i final 64/16 retrain, 6 epochs + eval"
  timeout 2400 python scripts/train_from_scratch.py -c n882 \
    --out-dir runs/scratch2 --eval-batch 20480 \
    --hard-mine-batch-size 2048 --hard-mine-batches 40 \
    --final-epochs 6 \
    >> runs/train_scratch2.log 2>&1
  r=$?; rc j-job2.$i $r; [ $r -eq 0 ] && break
done

# ---- j-job3: finish phi=accurate nG=5 p=0.04 ----
for i in 1 2; do
  probe
  say "j-job3.$i resume phi=accurate nG=5 p=0.05,0.04"
  FGT_PHI_IMPL=accurate timeout 1800 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 22 \
    --checkpoint runs/ckpt_phi_acc_nG5.json \
    >> runs/n882_nG5_p0504_phi_accurate.log 2>&1
  r=$?; rc j-job3.$i $r; [ $r -eq 0 ] && break
done

# ---- j-job4: missing BLER rows [[1270,28]] nG=3 p=0.11/0.10 ----
probe
say "j-job4 n1270 nG=3 p=0.11,0.10"
timeout 1200 python scripts/evaluate.py -c n1270 -nG 3 -p 0.11 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 500 --seed 71 \
  > runs/n1270_nG3_p1110.log 2>&1
rc j-job4 $?

# ---- j-job5: remaining cheap n882 rows ----
probe
say "j-job5 n882 nG=3 p=0.14,0.12 / 0.09,0.07"
timeout 600 python scripts/evaluate.py -c n882 -nG 3 -p 0.14 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 50 --seed 81 \
  > runs/n882_nG3_p1412.log 2>&1
rc j-job5a $?
timeout 900 python scripts/evaluate.py -c n882 -nG 3 -p 0.09 0.07 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 600 --seed 82 \
  > runs/n882_nG3_p0907.log 2>&1
rc j-job5b $?

# ---- j-job6: n1270 nG=3 p=0.12 + nG=5 p=0.10 ----
probe
say "j-job6 n1270 nG=3 p=0.12 + nG=5 p=0.10"
timeout 600 python scripts/evaluate.py -c n1270 -nG 3 -p 0.12 \
  -bs 20480 --qc-kernel --target-errors 100 --max-mc-iter 20 --seed 83 \
  > runs/n1270_nG3_p12.log 2>&1
rc j-job6a $?
timeout 900 python scripts/evaluate.py -c n1270 -nG 5 -p 0.10 \
  -bs 20480 --qc-kernel --compact 0.5 --rounds-cap 0.3 \
  --target-errors 100 --max-mc-iter 200 --seed 84 \
  > runs/n1270_nG5_p10.log 2>&1
rc j-job6b $?

echo "QUEUE_R4J DONE $(date -u)" >> $Q
