#!/bin/bash
# round-5 queue B: waits for the scratch3 training watchdog to release the
# chip, then: (1) nG=5 + rescue(tf) floor rows p=0.05/0.04 (VERDICT item 5),
# (2) BP4+OSD p=0.08 top-up seed 32 (pool with round-3's 73/8.26e6),
# (3) BP2+OSD p=0.04 top-up seed 31 (pool with round-3's 20/8.88e5).
cd /root/repo
say() { echo "=== $* $(date -u)" >> runs/queue_r5b.log; }

while pgrep -f "train_from_scratch.py -c n882 --out-dir runs/scratch3" > /dev/null; do
  sleep 30
done
say "chip free, starting"

say "job1 n882 nG=5 p=0.05 0.04 rescue tf"
for i in 1 2; do
  timeout 7200 python scripts/evaluate.py -c n882 -nG 5 -p 0.05 0.04 \
    -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 --rescue-phi tf \
    --target-errors 100 --max-mc-iter 9766 --seed 55 \
    --checkpoint runs/ckpt_n882_nG5_rescue.json \
    >> runs/n882_nG5_p0504_rescue_tf.log 2>&1
  r=$?; say "job1.$i rc=$r"; [ $r -eq 0 ] && break
done

say "job2 bp4-osd p=0.08 seed 32 top-up"
for i in 1 2; do
  timeout 2400 python examples/osd_eval.py --mode bp4-osd -p 0.08 -bs 32768 \
    --osd-cap 1024 --target-errors 30 --max-mc-iter 160 --seed 32 \
    --checkpoint runs/ckpt_osd_bp4_p08.json >> runs/osd_bp4_p08_s32.log 2>&1
  r=$?; say "job2.$i rc=$r"; [ $r -eq 0 ] && break
done

say "job3 bp2-osd p=0.04 seed 31 top-up"
for i in 1 2; do
  timeout 3000 python examples/osd_eval.py --mode bp2-osd -p 0.04 -bs 32768 \
    --osd-cap 1024 --target-errors 80 --max-mc-iter 220 --seed 31 \
    --checkpoint runs/ckpt_osd_bp2_p04.json >> runs/osd_bp2_p04_s31.log 2>&1
  r=$?; say "job3.$i rc=$r"; [ $r -eq 0 ] && break
done
say "QUEUE_R5B DONE"
